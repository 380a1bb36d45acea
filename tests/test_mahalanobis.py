"""mahalanobis_outliers (stages/cohesion.py) — covariance-aware
ranking on a planted anisotropic cloud; bit-exact vs the serial
replay under different partitionings."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from _oracle_replays import replay_mahalanobis
from featurebox_ray.stages.cohesion import mahalanobis_outliers


def _table(ids, labels, vecs):
    return pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "label": pa.array(labels, pa.int32()),
        "embedding": pa.array(
            [None if v is None else list(map(float, v))
             for v in vecs],
            pa.list_(pa.float32()))})


def _run(t, parts=1) -> pd.DataFrame:
    ds = ray.data.from_arrow(t)
    if parts > 1:
        ds = ds.repartition(parts)
    return (mahalanobis_outliers(ds).to_pandas()
            .sort_values("vec_id").reset_index(drop=True))


def test_anisotropy_ranks_directions():
    # cloud stretched along axis 0 (sd 1.0) and tight along axis 1
    # (sd 0.05): equal-norm probes at (0.6, 0) vs (0, 0.6) must rank
    # the tight-direction probe far more anomalous
    rng = np.random.default_rng(11)
    base = np.column_stack([rng.normal(0, 0.3, 400),
                            rng.normal(0, 0.02, 400)])
    vecs = np.vstack([base, [[0.6, 0.0]], [[0.0, 0.6]]])
    vecs = np.clip(vecs, -0.99, 0.99).astype(np.float32)
    ids = list(range(len(vecs)))
    labels = [0] * len(vecs)
    df = _run(_table(ids, labels, list(vecs)))
    d_wide = df[df.vec_id == 400].maha2.iloc[0]
    d_tight = df[df.vec_id == 401].maha2.iloc[0]
    assert d_tight > 20 * d_wide


def test_bit_exact_vs_replay_partition_invariant():
    rng = np.random.default_rng(42)
    n, d = 600, 8
    vecs = (rng.normal(0, 0.2, (n, d))).astype(np.float32)
    labels = list(rng.integers(0, 3, n))
    ids = list(range(n))
    vlist = [list(map(float, v)) for v in vecs]
    # plant some nulls
    labels[5] = None
    vlist[17] = None
    exp = pd.DataFrame(replay_mahalanobis(ids, labels, vlist),
                       columns=["vec_id", "label", "maha2"])
    exp = exp.sort_values("vec_id").reset_index(drop=True)
    t = _table(ids, labels, vlist)
    for parts in (1, 7):
        df = _run(t, parts)
        pd.testing.assert_frame_equal(
            df.astype(exp.dtypes.to_dict()), exp, check_exact=True)
