"""Unit tests for the segmented numpy kernels (no Ray)."""

import numpy as np
import pandas as pd
import pytest

from featurebox_ray.functions import segments as seg


def _mk(codes):
    codes = np.asarray(codes)
    return seg.segment_ids(codes)


def test_segment_ids():
    seg_start, row_in_seg, is_start = _mk([0, 0, 0, 1, 1, 2])
    assert seg_start.tolist() == [0, 0, 0, 3, 3, 5]
    assert row_in_seg.tolist() == [0, 1, 2, 0, 1, 0]
    assert is_start.tolist() == [True, False, False, True, False, True]


def test_lag_lead():
    codes = np.array([0, 0, 0, 1, 1])
    v = np.array([1.0, 2.0, 3.0, 4.0, 5.0])
    seg_start, row_in_seg, _ = _mk(codes)
    seg_len = seg.seg_lengths(seg_start, len(codes))
    lag1 = seg.lag(v, 1, row_in_seg)
    assert np.allclose(lag1[1:3], [1, 2]) and np.isnan(lag1[0]) and np.isnan(lag1[3])
    lead1 = seg.lead(v, 1, row_in_seg, seg_len)
    assert np.allclose(lead1[[0, 1, 3]], [2, 3, 5])
    assert np.isnan(lead1[2]) and np.isnan(lead1[4])


def test_sessionize():
    ts = np.array([0, 10, 2000, 2005, 0, 5], dtype=np.int64)
    codes = np.array([0, 0, 0, 0, 1, 1])
    _, _, is_start = _mk(codes)
    s = seg.sessionize(ts, is_start, gap_us=1000)
    assert s.tolist() == [0, 0, 1, 1, 0, 0]


@pytest.mark.parametrize("k", [1, 2, 3, 7])
def test_rolling_rows_vs_pandas(k):
    rng = np.random.default_rng(0)
    codes = np.sort(rng.integers(0, 20, 500))
    v = rng.normal(size=500)
    v[rng.random(500) < 0.05] = np.nan
    seg_start, row_in_seg, _ = _mk(codes)
    st = seg.rolling_stats_rows(v, k, row_in_seg)
    s = pd.Series(v)
    g = pd.Series(codes)
    r = s.groupby(g).rolling(k, min_periods=1)
    assert np.allclose(st["count"], r.count().values, equal_nan=True)
    assert np.allclose(st["sum"], r.sum().values, equal_nan=True)
    assert np.allclose(st["mean"], r.mean().values, equal_nan=True)
    assert np.allclose(st["std"], s.groupby(g).rolling(k, min_periods=1).std().values, equal_nan=True)
    mn, mx = seg.rolling_min_max_rows(v, k, row_in_seg)
    assert np.allclose(mn, r.min().values, equal_nan=True)
    assert np.allclose(mx, r.max().values, equal_nan=True)


def test_rolling_time_vs_pandas():
    rng = np.random.default_rng(1)
    n = 400
    codes = np.sort(rng.integers(0, 10, n))
    ts = np.zeros(n, dtype=np.int64)
    # per-segment sorted ts
    df = pd.DataFrame({"c": codes})
    ts = (
        df.groupby("c").cumcount().values * 100
        + rng.integers(0, 80, n).cumsum() // 50
    ).astype(np.int64)
    # ensure sorted within segment
    ts = pd.Series(ts).groupby(codes).cummax().values.astype(np.int64)
    v = rng.normal(size=n)
    seg_start, row_in_seg, _ = _mk(codes)
    delta = 250
    st = seg.rolling_stats_time(v, ts, delta, seg_start, row_in_seg)
    # pandas oracle
    out_cnt = np.empty(n)
    out_sum = np.empty(n)
    for c in np.unique(codes):
        m = codes == c
        tt, vv = ts[m], v[m]
        for j, (t0, _) in enumerate(zip(tt, vv)):
            w = vv[(tt >= t0 - delta) & (tt <= t0)]
            out_cnt[m.nonzero()[0][j]] = len(w)
            out_sum[m.nonzero()[0][j]] = w.sum()
    assert np.allclose(st["count"], out_cnt)
    assert np.allclose(st["sum"], out_sum)


def test_last_occurrence_index():
    #            r  l  l  r  l | r  l
    side = np.array([0, 1, 1, 0, 1, 0, 1])
    is_src = side == 0
    codes = np.array([0, 0, 0, 0, 0, 1, 1])
    seg_start, _, _ = _mk(codes)
    last = seg.last_occurrence_index(is_src, seg_start)
    assert last.tolist() == [0, 0, 0, 3, 3, 5, 5]
    # no source yet in segment -> -1
    side2 = np.array([1, 0, 1])
    codes2 = np.array([0, 0, 0])
    seg_start2, _, _ = _mk(codes2)
    assert seg.last_occurrence_index(side2 == 0, seg_start2).tolist() == [-1, 1, 1]


def test_time_window_tie_semantics_vs_duckdb():
    """(key, ts) ties: peers-inclusive bounds must equal SQL RANGE ...
    CURRENT ROW (later equal-ts peers in-window); default bounds must
    equal pandas time-rolling (peers after the current position excluded)."""
    import duckdb
    import pandas as pd

    from featurebox_ray.functions.segments import rolling_stats_time

    # one segment with heavy ts duplication, one without
    ts_s = np.array([0, 10, 10, 10, 25, 40, 40, 100,   0, 5, 30], np.int64)
    seg_id = np.array([0] * 8 + [1] * 3)
    vals = np.arange(len(ts_s), dtype=np.float64)
    seg_changes = np.flatnonzero(np.diff(seg_id)) + 1
    starts = np.concatenate([[0], seg_changes])
    seg_start = np.repeat(starts, np.diff(np.append(starts, len(ts_s))))
    row_in_seg = np.arange(len(ts_s)) - seg_start

    delta_us = int(30e6)
    ts_us = ts_s * 1_000_000

    con = duckdb.connect()
    df = pd.DataFrame({"k": seg_id, "ts": ts_s, "v": vals})
    con.register("df", df)
    ora = con.sql("""
        SELECT sum(v) OVER w AS s, count(v) OVER w AS c
        FROM df WINDOW w AS (PARTITION BY k ORDER BY ts
                             RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
        ORDER BY k, ts, v
    """).df()

    inc = rolling_stats_time(vals, ts_us, delta_us, seg_start, row_in_seg,
                             include_ts_peers=True)
    assert np.allclose(inc["sum"], ora["s"].to_numpy())
    assert np.allclose(inc["count"], ora["c"].to_numpy())

    # pandas semantics for the default path
    exc = rolling_stats_time(vals, ts_us, delta_us, seg_start, row_in_seg)
    pdf = df.copy()
    pdf["t"] = pd.to_datetime(pdf["ts"], unit="s")
    roll = (pdf.set_index("t").groupby("k")["v"]
            .rolling("30s", closed="both").sum().to_numpy())
    assert np.allclose(exc["sum"], roll)
    # with ties present the two semantics MUST differ somewhere
    assert not np.allclose(inc["sum"], exc["sum"])


def test_lag_lead_zero_is_identity():
    from featurebox_ray.functions.segments import lag, lead, seg_lengths

    v = np.array([1.0, 2.0, 3.0, 10.0, 20.0])
    row_in_seg = np.array([0, 1, 2, 0, 1])
    seg_len = np.array([3, 3, 3, 2, 2])
    np.testing.assert_array_equal(lag(v, 0, row_in_seg), v)
    np.testing.assert_array_equal(lead(v, 0, row_in_seg, seg_len), v)


def test_seg_cummax_many_segments_exact_and_inf():
    """The expanding min/max path must stay EXACT with many segments
    (the old band-shift lost ulp(seg_ord*big)) and must keep ±inf."""
    from featurebox_ray.functions.segments import _seg_cummax

    rng = np.random.default_rng(0)
    n_segs, seg_len = 20_000, 3
    v = rng.normal(scale=4e4, size=n_segs * seg_len)
    row_in_seg = np.tile(np.arange(seg_len), n_segs)
    got = _seg_cummax(v, row_in_seg)
    want = np.maximum.accumulate(v.reshape(n_segs, seg_len), axis=1).ravel()
    np.testing.assert_array_equal(got, want)  # bit-exact, not allclose

    v2 = np.array([1.0, np.inf, 0.5, np.nan, -np.inf, 2.0])
    ris2 = np.array([0, 1, 2, 0, 1, 2])
    got2 = _seg_cummax(v2, ris2)
    np.testing.assert_array_equal(
        got2, [1.0, np.inf, np.inf, np.nan, -np.inf, 2.0])
