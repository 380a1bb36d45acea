"""ridge_influence (stages/regress.py) — LOGO exactness vs a
from-scratch complement refit; planted corrupt shard detection;
bit-exact vs replay under different partitionings."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from _oracle_replays import replay_ridge_influence
from featurebox_ray.stages.regress import ridge_influence, ridge_solve


def _table(vecs, ys, grps):
    return pa.table({
        "embedding": pa.array(
            [None if v is None else list(map(float, v))
             for v in vecs], pa.list_(pa.float32())),
        "label": pa.array(ys, pa.float64()),
        "grp": pa.array(grps, pa.int64())})


def _run(t, parts=1) -> pd.DataFrame:
    ds = ray.data.from_arrow(t)
    if parts > 1:
        ds = ds.repartition(parts)
    return (ridge_influence(ds, group_col="grp", y_col="label")
            .to_pandas().sort_values(["grp", "j"])
            .reset_index(drop=True))


def test_loo_equals_fresh_complement_fit():
    rng = np.random.default_rng(7)
    n, d = 300, 4
    X = rng.normal(0, 0.3, (n, d)).astype(np.float32)
    y = X @ [1.0, -2.0, 0.5, 0.0] + rng.normal(0, 0.05, n)
    grps = rng.integers(0, 5, n)
    df = _run(_table(list(X), list(y), list(grps)))
    # fresh fit on complement of group 2 via the same integer stats
    sel = grps != 2
    qi = np.round(X[sel].astype(np.float64) * 1024).astype(np.int64)
    qa = np.concatenate([qi, np.full((sel.sum(), 1), 1024,
                                     np.int64)], axis=1)
    yq = np.round(y[sel]).astype(np.int64)
    coef = ridge_solve(qa.T @ qa, qa.T @ yq, int(sel.sum()),
                       10, 1, 1, 1)
    got = df[df.grp == 2].coef_loo.to_numpy()
    assert np.array_equal(got, coef)


def test_corrupt_shard_has_largest_delta():
    rng = np.random.default_rng(19)
    n, d = 500, 3
    X = rng.normal(0, 0.3, (n, d)).astype(np.float32)
    y = X @ [10.0, 10.0, 10.0]
    grps = rng.integers(0, 5, n).astype(np.int64)
    y = np.where(grps == 3, -y, y)  # group 3 has flipped labels
    df = _run(_table(list(X), list(y), list(grps)))
    mag = df.groupby("grp").delta.apply(lambda s: np.abs(s).sum())
    assert mag.idxmax() == 3


def test_bit_exact_vs_replay_partition_invariant():
    rng = np.random.default_rng(101)
    n, d = 400, 5
    vecs = [None if rng.random() < 0.02
            else list(rng.normal(0, 0.3, d).astype(np.float32))
            for _ in range(n)]
    ys = [None if rng.random() < 0.02 else float(rng.normal())
          for _ in range(n)]
    grps = [None if rng.random() < 0.02 else int(rng.integers(0, 4))
            for _ in range(n)]
    exp = pd.DataFrame(
        replay_ridge_influence(
            [None if v is None else [float(x) for x in v]
             for v in vecs], ys, grps),
        columns=["grp", "j", "coef_loo", "delta"])
    t = _table(vecs, ys, grps)
    for parts in (1, 6):
        df = _run(t, parts)
        pd.testing.assert_frame_equal(
            df.astype(exp.dtypes.to_dict()), exp, check_exact=True)
