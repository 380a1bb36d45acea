"""Property-based fuzzing of the segment kernels vs pandas oracles —
random segment structures, ties, NaNs, singleton and long segments."""

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from featurebox_ray.functions import segments as seg


@st.composite
def segmented(draw, max_segs=6, max_len=12, allow_nan=True):
    n_segs = draw(st.integers(1, max_segs))
    lens = [draw(st.integers(1, max_len)) for _ in range(n_segs)]
    codes = np.repeat(np.arange(n_segs), lens)
    n = len(codes)
    vals = draw(st.lists(
        st.floats(-100, 100, allow_nan=False), min_size=n, max_size=n))
    v = np.array(vals)
    if allow_nan:
        nan_mask = draw(st.lists(st.booleans(), min_size=n, max_size=n))
        v[np.array(nan_mask)] = np.nan
    # non-decreasing ts within segment, ties allowed
    gaps = draw(st.lists(st.integers(0, 50), min_size=n, max_size=n))
    ts = np.zeros(n, dtype=np.int64)
    pos = 0
    for ln in lens:
        ts[pos:pos + ln] = np.cumsum(gaps[pos:pos + ln])
        pos += ln
    return codes, v, ts


@settings(max_examples=30, deadline=None)
@given(data=segmented(), k=st.integers(1, 5))
def test_rolling_rows_fuzz(data, k):
    codes, v, ts = data
    seg_start, row_in_seg, _ = seg.segment_ids(codes)
    st_ = seg.rolling_stats_rows(v, k, row_in_seg)
    s = pd.Series(v)
    g = pd.Series(codes)
    r = s.groupby(g).rolling(k, min_periods=1)
    assert np.allclose(st_["count"], r.count().values, equal_nan=True)
    assert np.allclose(st_["sum"], r.sum().values, equal_nan=True, atol=1e-9)
    assert np.allclose(st_["mean"], r.mean().values, equal_nan=True, atol=1e-9)
    # std: prefix-sum windows carry O(ulp(prefix total)) absolute error
    # (documented contract in segments._sums_over_bounds)
    assert np.allclose(st_["std"], r.std().values, equal_nan=True, atol=1e-5)
    mn, mx = seg.rolling_min_max_rows(v, k, row_in_seg)
    assert np.allclose(mn, r.min().values, equal_nan=True)
    assert np.allclose(mx, r.max().values, equal_nan=True)


@settings(max_examples=30, deadline=None)
@given(data=segmented(allow_nan=False), k=st.integers(1, 3))
def test_lag_lead_fuzz(data, k):
    codes, v, ts = data
    seg_start, row_in_seg, _ = seg.segment_ids(codes)
    seg_len = seg.seg_lengths(seg_start, len(codes))
    lagged = seg.lag(v, k, row_in_seg)
    led = seg.lead(v, k, row_in_seg, seg_len)
    s = pd.Series(v)
    g = pd.Series(codes)
    assert np.allclose(lagged, s.groupby(g).shift(k).values, equal_nan=True)
    assert np.allclose(led, s.groupby(g).shift(-k).values, equal_nan=True)


@settings(max_examples=30, deadline=None)
@given(data=segmented(allow_nan=False), delta=st.integers(0, 80))
def test_time_window_fuzz(data, delta):
    codes, v, ts = data
    seg_start, row_in_seg, _ = seg.segment_ids(codes)
    st_ = seg.rolling_stats_time(v, ts, delta, seg_start, row_in_seg)
    # brute-force oracle: rows of same segment, at-or-before current
    # position, ts >= ts_i - delta
    n = len(v)
    exp_cnt = np.empty(n)
    exp_sum = np.empty(n)
    for i in range(n):
        sel = [j for j in range(seg_start[i], i + 1) if ts[j] >= ts[i] - delta]
        exp_cnt[i] = len(sel)
        exp_sum[i] = v[sel].sum() if sel else np.nan
    assert np.allclose(st_["count"], exp_cnt)
    assert np.allclose(st_["sum"], exp_sum, equal_nan=True)


@settings(max_examples=30, deadline=None)
@given(data=segmented(allow_nan=False), gap=st.integers(1, 40))
def test_sessionize_fuzz(data, gap):
    codes, v, ts = data
    _, row_in_seg, is_start = seg.segment_ids(codes)
    out = seg.sessionize(ts, is_start, gap)
    # oracle
    n = len(ts)
    exp = np.zeros(n, dtype=np.int64)
    for i in range(1, n):
        if is_start[i]:
            exp[i] = 0
        else:
            exp[i] = exp[i - 1] + (1 if ts[i] - ts[i - 1] > gap else 0)
    assert (out == exp).all()


@settings(max_examples=25, deadline=None)
@given(data=segmented(allow_nan=False),
       srcs=st.lists(st.booleans(), min_size=1, max_size=80))
def test_last_occurrence_fuzz(data, srcs):
    codes, v, ts = data
    n = len(codes)
    is_src = np.resize(np.array(srcs, dtype=bool), n)
    seg_start, _, _ = seg.segment_ids(codes)
    out = seg.last_occurrence_index(is_src, seg_start)
    for i in range(n):
        exp = -1
        for j in range(seg_start[i], i + 1):
            if is_src[j]:
                exp = j
        assert out[i] == exp


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=60, deadline=None)
@given(st.dictionaries(
    st.from_regex(r"[a-z_]{1,8}", fullmatch=True),
    st.integers(min_value=1, max_value=99), min_size=0, max_size=6))
def test_composition_parse_round_trip(d):
    """render(parse) round trip: any name->count map rendered in sorted
    order parses back exactly (namespilt grammar)."""
    from featurebox_ray.stages.parse import parse_composition

    s = "".join(f"{k}{v}" for k, v in sorted(d.items()))
    got = parse_composition(s)
    assert got == {k: float(v) for k, v in d.items()}


@settings(max_examples=40, deadline=None)
@given(st.integers(min_value=2, max_value=5),
       st.integers(min_value=3, max_value=40),
       st.integers(min_value=0, max_value=10**6))
def test_dispose_reductions_match_numpy(g, n, seed):
    import numpy as np

    from featurebox_ray.functions.expr import DISPOSE

    rng = np.random.default_rng(seed)
    X = rng.normal(size=(g, n))
    assert np.allclose(DISPOSE["madd"](X), X.sum(axis=0))
    assert np.allclose(DISPOSE["mmul"](X), X.prod(axis=0))
    if g == 2:
        assert np.allclose(DISPOSE["msub"](X), X[0] - X[1])
        assert np.allclose(DISPOSE["mdiv"](X), X[0] / X[1])
        assert np.allclose(DISPOSE["conv"](X), X[::-1])
    else:
        for op in ("msub", "mdiv", "conv"):
            assert DISPOSE[op](X) is X


@settings(max_examples=25, deadline=None)
@given(st.integers(min_value=2, max_value=25),
       st.integers(min_value=0, max_value=10**6))
def test_gabriel_edges_match_bruteforce(n, seed):
    import numpy as np

    from featurebox_ray.stages.voronoi import gabriel_edges

    rng = np.random.default_rng(seed)
    P = rng.normal(size=(n, 2))
    ii, jj = gabriel_edges(P)
    got = set(zip(ii.tolist(), jj.tolist()))
    want = set()
    for i in range(n):
        for j in range(i + 1, n):
            mid = (P[i] + P[j]) / 2
            r2 = ((P[i, 0] - P[j, 0]) ** 2 + (P[i, 1] - P[j, 1]) ** 2) / 4
            if not any(
                (P[k, 0] - mid[0]) ** 2 + (P[k, 1] - mid[1]) ** 2 < r2
                for k in range(n) if k != i and k != j
            ):
                want.add((i, j))
    assert got == want
