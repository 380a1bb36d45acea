"""Isotonic PAV calibration (stages/isotonic.py) — replay parity,
sklearn-free hand cases, monotonicity, decreasing fits."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from _oracle_replays import replay_isotonic
from featurebox_ray.stages.isotonic import isotonic_fit, pav_pool


def _run(xs, ys, *, increasing=True, x_scale=1.0, y_scale=1.0,
         parts=1):
    t = pa.table({"x": pa.array(xs, pa.float64()),
                  "y": pa.array(ys, pa.float64())})
    ds = ray.data.from_arrow(t)
    if parts > 1:
        ds = ds.repartition(parts)
    return (isotonic_fit(ds, x_col="x", y_col="y", x_scale=x_scale,
                         y_scale=y_scale, increasing=increasing,
                         num_partitions=3)
            .to_pandas().reset_index(drop=True))


def test_isotonic_replay_parity_partition_invariant():
    rng = np.random.default_rng(61)
    n = 500
    xs = list(np.round(rng.uniform(0, 20, n), 0))
    # noisy increasing trend with ties and a few nulls
    ys = list(np.round(np.array(xs) * 0.3
                       + rng.normal(0, 2, n), 0))
    xs[3], ys[7] = None, None
    exp = replay_isotonic(xs, ys, x_scale=1.0, y_scale=1.0)
    prev = None
    for parts in (1, 6):
        got = _run(xs, ys, parts=parts)
        pd.testing.assert_frame_equal(
            got, exp.reset_index(drop=True), check_exact=True)
        if prev is not None:
            assert got.equals(prev)
        prev = got
    # fitted must be non-decreasing in x
    assert (np.diff(got.fitted.values) >= 0).all()


def test_isotonic_hand_case():
    # classic PAV example: y = [1, 3, 2] at x = [1, 2, 3] pools (3,2)
    got = _run([1, 2, 3], [1, 3, 2])
    assert got.x.tolist() == [1, 2, 3]
    assert got.pool.tolist() == [0, 1, 1]
    assert got.fitted.tolist() == [1.0, 2.5, 2.5]


def test_isotonic_decreasing():
    got = _run([1, 2, 3], [2, 3, 1], increasing=False)
    # non-increasing fit: (2,3) pool to 2.5, then 1
    assert got.x.tolist() == [1, 2, 3]
    assert got.fitted.tolist() == [2.5, 2.5, 1.0]
    assert (np.diff(got.fitted.values) <= 0).all()
    exp = replay_isotonic([1, 2, 3], [2, 3, 1], x_scale=1.0,
                          y_scale=1.0, increasing=False)
    pd.testing.assert_frame_equal(got, exp.reset_index(drop=True),
                                  check_exact=True)


def test_pav_pool_exact_cross_mult():
    # means that differ by < 1 ulp of float still pool correctly:
    # 1/3 vs 33333.../1e5 — integer cross-mult is exact
    xs = np.array([0, 1], np.int64)
    ns = np.array([3, 100000], np.int64)
    ss = np.array([1, 33333], np.int64)
    # 1/3 > 33333/100000 -> must pool into one block
    pool_id, pool_n, pool_s = pav_pool(xs, ns, ss)
    assert pool_id.tolist() == [0, 0]
    assert int(pool_n[0]) == 100003 and int(pool_s[0]) == 33334
