"""wasserstein_drift (stages/diff.py) — exact-int W1 vs a serial
scipy-style replay; hand-checked tiny case; partition invariance;
single-group NULL; int64 guard."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray

from featurebox_ray.stages.diff import wasserstein_drift


def _run(t: pa.Table, parts: int = 1) -> pd.DataFrame:
    ds = ray.data.from_arrow(t)
    if parts > 1:
        ds = ds.repartition(parts)
    out = wasserstein_drift(ds, group_col="g", value_col="v")
    return (out.to_pandas().sort_values("g").reset_index(drop=True))


def _w1_serial(a: list[int], b: list[int]) -> float:
    """independent O(m) replay: integrate |CDF_a - CDF_b| over the
    merged support with exact Python ints, one final division."""
    support = sorted(set(a) | set(b))
    na, nb = len(a), len(b)
    sa, sb = sorted(a), sorted(b)
    num = 0
    import bisect
    for v, vn in zip(support[:-1], support[1:]):
        ca = bisect.bisect_right(sa, v)
        cb = bisect.bisect_right(sb, v)
        num += abs(ca * nb - cb * na) * (vn - v)
    return float(num) / float(na * nb)


def test_hand_case():
    # g=a: {0,0,4}; rest: {4,4,8}
    t = pa.table({"g": pa.array(["a", "a", "a", "b", "b", "b"]),
                  "v": pa.array([0, 0, 4, 4, 4, 8], pa.int64())})
    df = _run(t)
    a = df[df.g == "a"].iloc[0]
    # support 0,4,8; cum_a=[2,3,3], cum_b=[0,2,3]
    # num = |2*3-0*3|*4 + |3*3-2*3|*4 = 24+12 = 36; w1 = 36/9 = 4.0
    assert a.n_g == 3 and a.n_rest == 3
    assert a.w1_num == 36.0 and a.w1 == 4.0


def test_fuzz_vs_serial_replay_partition_invariant():
    rng = np.random.default_rng(4117)
    n = 2500
    gs = [None if rng.random() < 0.02 else f"s{rng.integers(0, 5)}"
          for _ in range(n)]
    vs = [None if rng.random() < 0.02
          else int(rng.integers(-50, 2000)) for _ in range(n)]
    t = pa.table({"g": pa.array(gs, pa.string()),
                  "v": pa.array(vs, pa.int64())})
    rows = [(g, v) for g, v in zip(gs, vs)
            if g is not None and v is not None]
    prev = None
    for parts in (1, 7):
        df = _run(t, parts)
        for _, r in df.iterrows():
            mine = [v for g, v in rows if g == r.g]
            rest = [v for g, v in rows if g != r.g]
            assert r.n_g == len(mine) and r.n_rest == len(rest)
            assert r.w1 == _w1_serial(mine, rest)  # bit-exact
        if prev is not None:
            pd.testing.assert_frame_equal(df, prev, check_exact=True)
        prev = df


def test_single_group_null_w1():
    t = pa.table({"g": pa.array(["x"] * 4),
                  "v": pa.array([1, 2, 3, 9], pa.int64())})
    df = _run(t)
    assert len(df) == 1
    assert df.iloc[0].n_rest == 0
    assert df.iloc[0].w1_num == 0.0
    assert pd.isna(df.iloc[0].w1)


def test_overflow_guard_raises():
    # range huge enough that n_g*n_rest*range > 2^63
    big = 2**62
    t = pa.table({"g": pa.array(["a"] * 3 + ["b"] * 3),
                  "v": pa.array([0, 1, 2, big, big + 1, big + 2],
                                pa.int64())})
    with pytest.raises(ValueError, match="guard"):
        _run(t)
