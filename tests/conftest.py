import os

import pytest
import ray


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
    )
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def tiny_dir(tmp_path_factory):
    """FIXTURES F1-F3 tiny dataset (~100 convs) on disk."""
    from featurebox_ray.sources.synthetic import write_dataset

    d = str(tmp_path_factory.mktemp("tiny"))
    write_dataset(d, n_convs=100, n_shards=4, seed=42)
    return d


@pytest.fixture(scope="session")
def small_dir(tmp_path_factory):
    """~1000 convs incl. a planted mega-conversation per shard."""
    from featurebox_ray.sources.synthetic import write_dataset

    d = str(tmp_path_factory.mktemp("small"))
    write_dataset(d, n_convs=400, n_shards=4, seed=42, mega_every=100, mega_turns=1500)
    return d
