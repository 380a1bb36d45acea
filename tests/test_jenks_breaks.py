"""Jenks/Fisher optimal 1-D classes (stages/binning.py:jenks_breaks)
vs the full-Fraction serial replay; hand-checked splits; brute-force
optimality; partition invariance."""

from itertools import combinations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from _oracle_replays import replay_jenks
from featurebox_ray.stages.binning import jenks_breaks


def _run(t: pa.Table, k: int, parts: int = 1) -> pd.DataFrame:
    ds = ray.data.from_arrow(t)
    if parts > 1:
        ds = ds.repartition(parts)
    return (jenks_breaks(ds, group_col="g", value_col="v", k=k,
                         num_partitions=4)
            .to_pandas().sort_values(["g", "cls"])
            .reset_index(drop=True))


def test_jenks_vs_replay_fuzz_partition_invariant():
    rng = np.random.default_rng(857)
    n = 700
    gs = [None if rng.random() < 0.03 else f"s{rng.integers(0, 6)}"
          for _ in range(n)]
    # tri-modal values so the optimum is non-trivial
    vs = []
    for _ in range(n):
        if rng.random() < 0.03:
            vs.append(None)
        else:
            mode = rng.integers(0, 3)
            vs.append(int([10, 100, 1000][mode]
                          + rng.integers(-8, 9)))
    exp = pd.DataFrame(
        replay_jenks(gs, vs, k=4),
        columns=["g", "cls", "lo", "hi", "n_rows", "mean",
                 "within_ss"])
    t = pa.table({"g": pa.array(gs, pa.string()),
                  "v": pa.array(vs, pa.int64())})
    prev = None
    for parts in (1, 9):
        got = _run(t, 4, parts)
        pd.testing.assert_frame_equal(
            got.astype(exp.dtypes.to_dict()), exp, check_exact=True)
        if prev is not None:
            assert got.equals(prev)
        prev = got


def test_jenks_hand_checked_two_clusters():
    # {1,2, 100,101} with k=2 must split between 2 and 100
    t = pa.table({"g": pa.array(["x"] * 4, pa.string()),
                  "v": pa.array([1, 2, 100, 101], pa.int64())})
    got = _run(t, 2)
    assert got["lo"].tolist() == [1, 100]
    assert got["hi"].tolist() == [2, 101]
    assert got["mean"].tolist() == [1.5, 100.5]
    assert got["within_ss"].tolist() == [0.5, 0.5]


def test_jenks_brute_force_optimality():
    # exhaustive check: DP total SSE equals the best over all splits
    rng = np.random.default_rng(99)
    vals = sorted(set(int(x) for x in rng.integers(0, 60, size=12)))
    wts = [int(rng.integers(1, 5)) for _ in vals]
    rows_g, rows_v = [], []
    for v, w in zip(vals, wts):
        rows_g.extend(["z"] * w)
        rows_v.extend([v] * w)
    k = 3
    t = pa.table({"g": pa.array(rows_g, pa.string()),
                  "v": pa.array(rows_v, pa.int64())})
    got = _run(t, k)
    got_ss = got["within_ss"].sum()

    def sse(seg):
        w = sum(wts[i] for i in seg)
        s1 = sum(wts[i] * vals[i] for i in seg)
        s2 = sum(wts[i] * vals[i] ** 2 for i in seg)
        return s2 - s1 * s1 / w

    n = len(vals)
    best = None
    for cuts in combinations(range(1, n), k - 1):
        bounds = [0, *cuts, n]
        tot = sum(sse(range(bounds[i], bounds[i + 1]))
                  for i in range(k))
        best = tot if best is None else min(best, tot)
    assert abs(got_ss - best) < 1e-9


def test_jenks_fewer_values_than_k():
    t = pa.table({"g": pa.array(["a", "a"], pa.string()),
                  "v": pa.array([5, 9], pa.int64())})
    got = _run(t, 4)
    assert len(got) == 2                      # k_eff = 2 singletons
    assert got["within_ss"].tolist() == [0.0, 0.0]
