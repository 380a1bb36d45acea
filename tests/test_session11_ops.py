"""Session-11 operators: context_trim, hashing_vectorizer,
seasonal_peak, lag_autocov — serial replays + edge cases the gate
can't see (parallelism invariance, budget 0, sign cancellation,
tie-break, short segments)."""

import hashlib

import numpy as np
import pyarrow as pa
import pytest
import ray

from featurebox_ray.stages.context import context_trim
from featurebox_ray.stages.encode import hashing_vectorizer
from featurebox_ray.stages.seasonal import seasonal_peak
from featurebox_ray.stages.window import lag_autocov


def _events_tbl(n=800, seed=3):
    rng = np.random.default_rng(seed)
    return pa.table({
        "user_id": pa.array(rng.integers(0, 30, n), pa.int64()),
        "event_id": pa.array(np.arange(n), pa.int64()),
        "ts": pa.array(rng.integers(1_700_000_000_000_000,
                                    1_700_000_500_000_000, n),
                       pa.int64()).cast(pa.timestamp("us")),
        "tok": pa.array(rng.integers(0, 9, n), pa.int64()),
        "value": pa.array(np.round(rng.uniform(0, 40, n), 2)),
    })


def _serial_trim(tbl, budget):
    import pandas as pd

    df = tbl.to_pandas().sort_values(["user_id", "ts", "event_id"])
    out = {}
    for _, g in df.groupby("user_id"):
        toks = g["tok"].to_numpy()
        for i, (eid) in enumerate(g["event_id"].to_numpy()):
            total = 0
            n_ctx = 0
            for j in range(i - 1, -1, -1):
                if total + toks[j] > budget:
                    break
                total += toks[j]
                n_ctx += 1
            out[int(eid)] = (n_ctx, total)
    return out


def test_context_trim_serial_and_partition_invariance():
    tbl = _events_tbl()
    want = _serial_trim(tbl, budget=12)
    outs = []
    for parts in (1, 7):
        res = context_trim(ray.data.from_arrow(tbl), key_col="user_id",
                           ts_col="ts", seq_col="event_id",
                           tokens_col="tok", budget=12,
                           num_partitions=parts).take_all()
        got = {r["event_id"]: (r["n_ctx"], r["ctx_tokens"])
               for r in res}
        assert got == want
        outs.append(sorted(got.items()))
    assert outs[0] == outs[1]


def test_context_trim_budget_zero_and_negative_tokens():
    tbl = _events_tbl(60)
    res = context_trim(ray.data.from_arrow(tbl), key_col="user_id",
                       ts_col="ts", seq_col="event_id",
                       tokens_col="tok", budget=0).take_all()
    # budget 0 keeps only zero-token context rows
    want = _serial_trim(tbl, budget=0)
    assert {r["event_id"]: (r["n_ctx"], r["ctx_tokens"])
            for r in res} == want
    bad = tbl.set_column(3, "tok",
                         pa.array([-1] * 60, pa.int64()))
    with pytest.raises(Exception, match="negative token"):
        context_trim(ray.data.from_arrow(bad), key_col="user_id",
                     ts_col="ts", seq_col="event_id",
                     tokens_col="tok", budget=5).take_all()


def test_hashing_vectorizer_matches_serial_md5():
    docs = pa.table({
        "doc_id": pa.array([1, 2, 3, None], pa.int64()),
        "text": pa.array(["a b a c", "x y z x", None, "drop me"]),
    })
    res = hashing_vectorizer(ray.data.from_arrow(docs),
                             id_col="doc_id", text_col="text",
                             n_dims=8).take_all()
    got = {(r["doc_id"], r["dim"]): r["weight"] for r in res}
    want: dict = {}
    for did, text in ((1, "a b a c"), (2, "x y z x")):
        for term in text.split():
            h = int(hashlib.md5(term.encode()).hexdigest()[:15], 16)
            k = (did, h % 8)
            want[k] = want.get(k, 0) + (1 if (h // 8) % 2 == 0 else -1)
    want = {k: v for k, v in want.items() if v != 0}
    assert got == want


def test_hashing_vectorizer_sign_cancellation():
    # two tokens engineered to share a dim with opposite signs: find
    # them by brute force over a small alphabet
    import itertools

    pairs = {}
    hit = None
    for s in ("".join(p) for p in itertools.product("abcdef", repeat=3)):
        h = int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
        key = h % 4
        sgn = 1 if (h // 4) % 2 == 0 else -1
        if (key, -sgn) in pairs:
            hit = (pairs[(key, -sgn)], s)
            break
        pairs[(key, sgn)] = s
    assert hit is not None
    docs = pa.table({"doc_id": pa.array([7], pa.int64()),
                     "text": pa.array([f"{hit[0]} {hit[1]}"])})
    res = hashing_vectorizer(ray.data.from_arrow(docs),
                             id_col="doc_id", text_col="text",
                             n_dims=4).take_all()
    assert res == []  # weights cancelled -> no rows


def test_seasonal_peak_tie_breaks_to_lowest_bin():
    # two bins with identical (n, cents) -> peak must be the lower bin
    hour = 3_600_000_000
    ts = pa.array([2 * hour + 5, 9 * hour + 5, 11 * hour],
                  pa.int64()).cast(pa.timestamp("us"))
    tbl = pa.table({"event_type": pa.array(["a", "a", "a"]),
                    "ts": ts,
                    "value": pa.array([5.0, 5.0, 1.0])})
    res = seasonal_peak(ray.data.from_arrow(tbl),
                        group_col="event_type", ts_col="ts",
                        value_col="value").take_all()
    peak = [r for r in res if r["is_peak"]]
    assert len(peak) == 1 and peak[0]["bin"] == 2
    assert sorted(r["bin"] for r in res) == [2, 9, 11]


def test_seasonal_peak_negative_ts_raises():
    tbl = pa.table({"event_type": pa.array(["a"]),
                    "ts": pa.array([-5], pa.int64()).cast(
                        pa.timestamp("us")),
                    "value": pa.array([1.0])})
    with pytest.raises(Exception, match="negative timestamps"):
        seasonal_peak(ray.data.from_arrow(tbl),
                      group_col="event_type", ts_col="ts",
                      value_col="value").take_all()


def test_lag_autocov_serial_replay():
    tbl = _events_tbl(500, seed=9)
    lag = 3
    res = lag_autocov(ray.data.from_arrow(tbl), key_col="user_id",
                      ts_col="ts", seq_col="event_id",
                      value_col="value", lag=lag,
                      num_partitions=5).take_all()
    df = tbl.to_pandas().sort_values(["user_id", "ts", "event_id"])
    for r in res:
        g = df[df["user_id"] == r["user_id"]]
        x = np.round(g["value"].to_numpy() * 100).astype(np.int64)
        m = max(len(x) - lag, 0)
        assert r["n"] == len(x) and r["m"] == m
        assert r["spp"] == int((x[:m] * x[lag:]).sum()) if m else \
            r["spp"] == 0
        assert r["sh"] == int(x[:m].sum())
        assert r["st"] == int(x[lag:].sum()) if m else r["st"] == 0
        assert r["sx"] == int(x.sum())
    # a key shorter than the lag emits zeros
    short = pa.table({"user_id": pa.array([99, 99], pa.int64()),
                      "event_id": pa.array([0, 1], pa.int64()),
                      "ts": pa.array([1, 2], pa.int64()).cast(
                          pa.timestamp("us")),
                      "value": pa.array([1.0, 2.0])})
    out = lag_autocov(ray.data.from_arrow(short), key_col="user_id",
                      ts_col="ts", seq_col="event_id",
                      value_col="value", lag=5).take_all()
    assert out[0]["m"] == 0 and out[0]["spp"] == 0
    assert out[0]["sh"] == 0 and out[0]["st"] == 0
    assert out[0]["sx"] == 300


def test_containment_join_semantics():
    from featurebox_ray.stages.containment import containment_join

    q = pa.table({"doc_id": pa.array([0, 31], pa.int64()),
                  "text": pa.array(["alpha beta gamma", "zeta eta"])})
    c = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "text": pa.array(
                      ["alpha beta gamma delta more words here",
                       "alpha only here", "zeta eta theta"])})
    res = containment_join(ray.data.from_arrow(q),
                           ray.data.from_arrow(c), threshold=0.5,
                           max_df=64, num_partitions=4).take_all()
    got = {(r["qid"], r["cid"]): (r["inter"], r["qlen"])
           for r in res}
    # (0,2) shares 1/3 < 0.5 -> excluded
    assert got == {(0, 1): (3, 3), (31, 3): (2, 2)}
    # stopword cap: with max_df=0 every token drops -> no rows at all
    none = containment_join(ray.data.from_arrow(q),
                            ray.data.from_arrow(c), threshold=0.5,
                            max_df=0, num_partitions=4).take_all()
    assert none == []
    # duplicate tokens in a doc count once (distinct postings)
    q2 = pa.table({"doc_id": pa.array([0], pa.int64()),
                   "text": pa.array(["alpha alpha beta"])})
    r2 = containment_join(ray.data.from_arrow(q2),
                          ray.data.from_arrow(c), threshold=0.5,
                          max_df=64, num_partitions=3).take_all()
    assert {(r["qid"], r["cid"]): (r["inter"], r["qlen"])
            for r in r2} == {(0, 1): (2, 2), (0, 2): (1, 2)}


def test_benford_digits_exact_counts():
    from featurebox_ray.stages.profile import benford_digits

    vals = [0.01, 0.19, 1.0, 12.34, 95.0, 950.01, 0.0, -3.0,
            float("nan"), None]
    # cents: 1, 19, 100, 1234, 9500, 95001; 0/-300/nan/null drop
    tbl = pa.table({"g": pa.array(["a"] * len(vals)),
                    "value": pa.array(vals, pa.float64())})
    res = benford_digits(ray.data.from_arrow(tbl), group_col="g",
                         value_col="value").take_all()
    got = {r["digit"]: r["n"] for r in res}
    assert got == {1: 4, 9: 2}
    assert all(abs(r["share"] - r["n"] / 6) < 1e-15 for r in res)


def test_triangle_count_known_graph():
    from featurebox_ray.stages.graph import triangle_count

    # K4 minus one edge: edges of {0,1,2,3} without (2,3):
    # triangles {0,1,2} and {0,1,3} = 2; wedges = sum C(deg,2)
    # degs: 0->3, 1->3, 2->2, 3->2 -> 3+3+1+1 = 8
    src = [0, 0, 0, 1, 1,  1, 3, 0]   # includes a reversed dup (1,0),
    dst = [1, 2, 3, 2, 3,  0, 3, 0]   # a self loop (3,3), dup (0,0)?
    e = pa.table({"src": pa.array(src, pa.int64()),
                  "dst": pa.array(dst, pa.int64())})
    res = triangle_count(ray.data.from_arrow(e), num_partitions=3)
    r = res.to_pylist()[0]
    assert r == {"n_edges": 5, "n_wedges": 8, "n_triangles": 2}


def test_triangle_count_max_degree_raises():
    from featurebox_ray.stages.graph import triangle_count

    star = pa.table({"src": pa.array([0] * 10, pa.int64()),
                     "dst": pa.array(list(range(1, 11)), pa.int64())})
    with pytest.raises(Exception, match="max_degree"):
        triangle_count(ray.data.from_arrow(star), max_degree=5,
                       num_partitions=2)


def test_rolling_rank_serial_replay():
    from featurebox_ray.stages.window import rolling_rank

    tbl = _events_tbl(400, seed=21)
    k = 4
    res = rolling_rank(ray.data.from_arrow(tbl), key_col="user_id",
                       ts_col="ts", seq_col="event_id",
                       value_col="value", k=k,
                       num_partitions=6).take_all()
    df = tbl.to_pandas().sort_values(["user_id", "ts", "event_id"])
    want = {}
    for _, g in df.groupby("user_id"):
        v = g["value"].to_numpy()
        for i, eid in enumerate(g["event_id"].to_numpy()):
            lo = max(0, i - k)
            win = v[lo:i]
            want[int(eid)] = (len(win), int((win < v[i]).sum()))
    got = {r["event_id"]: (r["w"], r["cnt_less"]) for r in res}
    assert got == want
    first = [r for r in res if r["w"] == 0]
    assert all(r["pct"] is None for r in first)
    assert len(first) == df["user_id"].nunique()


def test_blocked_pair_score_semantics():
    from featurebox_ray.stages.linkage import blocked_pair_score

    tbl = pa.table({
        "blk": pa.array(["x", "x", "x", "y", None]),
        "rid": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "brand": pa.array(["b1", "b1", "b2", "b1", "b1"]),
        "size": pa.array([7, 7, 7, 7, None], pa.int64()),
    })
    res = blocked_pair_score(ray.data.from_arrow(tbl), key_col="blk",
                             id_col="rid",
                             fields={"brand": 3, "size": 2},
                             threshold=2, num_partitions=3).take_all()
    got = {(r["id_a"], r["id_b"]): r["score"] for r in res}
    # (1,2): brand+size=5; (1,3)/(2,3): size only=2; cross-block and
    # null-block rows never pair
    assert got == {(1, 2): 5, (1, 3): 2, (2, 3): 2}
    # max_block skip: block x has 3 rows -> cap 2 drops all its pairs
    res2 = blocked_pair_score(ray.data.from_arrow(tbl), key_col="blk",
                              id_col="rid",
                              fields={"brand": 3, "size": 2},
                              threshold=2, max_block=2,
                              num_partitions=3).take_all()
    assert res2 == []
    # null field values never agree
    tbl2 = pa.table({"blk": pa.array(["z", "z"]),
                     "rid": pa.array([1, 2], pa.int64()),
                     "brand": pa.array([None, None], pa.string())})
    r3 = blocked_pair_score(ray.data.from_arrow(tbl2), key_col="blk",
                            id_col="rid", fields={"brand": 1},
                            threshold=1).take_all()
    assert r3 == []


def test_rrf_fuse_full_ranking_contract():
    from featurebox_ray.stages.rank import rrf_fuse

    r1 = pa.table({"id": pa.array([1, 2, 3], pa.int64()),
                   "ra": pa.array([1, 2, 3], pa.int64())})
    r2 = pa.table({"id": pa.array([1, 2, 3], pa.int64()),
                   "rb": pa.array([3, 1, 2], pa.int64())})
    res = rrf_fuse([ray.data.from_arrow(r1), ray.data.from_arrow(r2)],
                   id_col="id", rank_cols=["ra", "rb"], k=60,
                   num_partitions=2).take_all()
    got = {r["id"]: r["rrf"] for r in res}
    assert got[1] == 1.0 / 61 + 1.0 / 63
    assert got[2] == 1.0 / 62 + 1.0 / 61
    # missing id in one ranking raises
    r2_bad = pa.table({"id": pa.array([1, 2], pa.int64()),
                       "rb": pa.array([1, 2], pa.int64())})
    with pytest.raises(Exception, match="missing"):
        rrf_fuse([ray.data.from_arrow(r1),
                  ray.data.from_arrow(r2_bad)], id_col="id",
                 rank_cols=["ra", "rb"]).take_all()


def test_table_checksum_order_invariant_and_sensitive():
    from featurebox_ray.stages.profile import table_checksum

    t = pa.table({"a": pa.array([1, 2, 3, None], pa.int64()),
                  "b": pa.array(["x", None, "z", "w"])})
    c1 = table_checksum(ray.data.from_arrow(t), cols=["a", "b"])
    # permuted rows + different partitioning -> identical checksum
    perm = t.take(pa.array([3, 0, 2, 1], pa.int64()))
    c2 = table_checksum(
        ray.data.from_arrow(perm).repartition(3), cols=["a", "b"])
    assert c1.to_pylist() == c2.to_pylist()
    # a single changed value changes the checksum
    t3 = t.set_column(0, "a", pa.array([1, 2, 4, None], pa.int64()))
    c3 = table_checksum(ray.data.from_arrow(t3), cols=["a", "b"])
    assert c3["checksum"][0].as_py() != c1["checksum"][0].as_py()
    # float columns are rejected
    tf = pa.table({"f": pa.array([1.0])})
    with pytest.raises(Exception, match="portably"):
        table_checksum(ray.data.from_arrow(tf), cols=["f"])


def test_table_checksum_injective_boundaries():
    from featurebox_ray.stages.profile import table_checksum

    # cross-boundary shift: ("a|b", "c") vs ("a", "b|c") must differ
    t1 = pa.table({"a": ["a|b"], "b": ["c"]})
    t2 = pa.table({"a": ["a"], "b": ["b|c"]})
    c1 = table_checksum(ray.data.from_arrow(t1), cols=["a", "b"])
    c2 = table_checksum(ray.data.from_arrow(t2), cols=["a", "b"])
    assert c1["checksum"][0].as_py() != c2["checksum"][0].as_py()
    # NULL vs empty string must differ
    t3 = pa.table({"a": pa.array([None], pa.string()), "b": ["c"]})
    t4 = pa.table({"a": pa.array([""], pa.string()), "b": ["c"]})
    c3 = table_checksum(ray.data.from_arrow(t3), cols=["a", "b"])
    c4 = table_checksum(ray.data.from_arrow(t4), cols=["a", "b"])
    assert c3["checksum"][0].as_py() != c4["checksum"][0].as_py()


def test_rrf_fuse_string_ids():
    from featurebox_ray.stages.rank import rrf_fuse

    r1 = pa.table({"id": ["x", "y", "z"],
                   "ra": pa.array([1, 2, 3], pa.int64())})
    r2 = pa.table({"id": ["z", "x", "y"],
                   "rb": pa.array([1, 2, 3], pa.int64())})
    got = (rrf_fuse([ray.data.from_arrow(r1),
                     ray.data.from_arrow(r2)], id_col="id",
                    rank_cols=["ra", "rb"], k=60)
           .to_pandas().set_index("id"))
    assert got.loc["x", "rrf"] == 1.0 / 61 + 1.0 / 62
    assert got.loc["z", "rrf"] == 1.0 / 63 + 1.0 / 61


def test_table_checksum_large_string():
    from featurebox_ray.stages.profile import table_checksum

    t = pa.table({"a": pa.array(["x", None, "y|z"],
                                pa.large_string()),
                  "b": pa.array([1, 2, None], pa.int64())})
    c1 = table_checksum(ray.data.from_arrow(t), cols=["a", "b"])
    t2 = pa.table({"a": pa.array(["x", None, "y|z"], pa.string()),
                   "b": pa.array([1, 2, None], pa.int64())})
    c2 = table_checksum(ray.data.from_arrow(t2), cols=["a", "b"])
    # large_string and string encode identically
    assert c1.to_pylist() == c2.to_pylist()
