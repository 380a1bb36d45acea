"""Composed governance gate (pipelines/governance.py:release_gate) —
clean dataset passes, planted violations flip exactly the right
checks."""

import numpy as np
import pyarrow as pa
import ray

from featurebox_ray.pipelines.governance import release_gate

RULES = [
    {"name": "r_id_not_null", "kind": "not_null", "col": "id"},
    {"name": "r_id_unique", "kind": "unique", "col": "id"},
]


def _gate(tbl):
    return release_gate(
        ray.data.from_arrow(tbl).repartition(3), rules=RULES,
        qi_cols=["q1", "q2"], sensitive_col="s", k=5,
        l_threshold=2, num_partitions=4).to_pandas().set_index(
        "check")


def test_clean_dataset_passes_all_checks():
    rng = np.random.default_rng(295)
    n = 400
    t = pa.table({
        "id": pa.array(range(n), pa.int64()),
        "q1": pa.array(list(rng.choice(["a", "b"], n))),
        "q2": pa.array(rng.integers(0, 2, n), pa.int64()),
        "s": pa.array(list(rng.choice(["x", "y", "z"], n))),
    })
    got = _gate(t)
    assert got.ok.all()
    assert got.loc["k_anonymity", "n_units"] == 4
    assert (got.n_violations == 0).all()


def test_planted_violations_flip_the_right_checks():
    rng = np.random.default_rng(296)
    n = 200
    ids = list(range(n))
    ids[5] = ids[4]                      # duplicate id
    q1 = list(rng.choice(["a", "b"], n))
    q2 = list(rng.integers(0, 2, n))
    s = list(rng.choice(["x", "y"], n))
    # a tiny QI group (below k=5) whose sensitive value is constant
    q1 += ["rare"] * 2
    q2 += [9] * 2
    s += ["x"] * 2
    ids += [n + 1, n + 2]
    t = pa.table({
        "id": pa.array(ids, pa.int64()),
        "q1": pa.array(q1), "q2": pa.array(q2, pa.int64()),
        "s": pa.array(s),
    })
    got = _gate(t)
    assert not got.loc["constraints", "ok"]          # dup id
    assert got.loc["constraints", "n_violations"] == 1
    assert not got.loc["k_anonymity", "ok"]          # rare combo
    assert not got.loc["l_diversity", "ok"]          # constant s
