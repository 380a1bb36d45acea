"""Tumbling-window aggregate (stages/window.py) and distributed TF-IDF
(stages/tfidf.py) vs serial replays.
"""

import numpy as np
import pyarrow as pa
import pytest
import ray

from featurebox_ray.stages.tfidf import tfidf_topk
from featurebox_ray.stages.window import tumbling_window_stats


def test_tumbling_window_matches_serial():
    rng = np.random.default_rng(9)
    n = 400
    keys = rng.choice(["u1", "u2", "u3"], n)
    ts = rng.integers(0, 100_000, n)          # raw int64 "us"
    ids = np.arange(n)
    vals = rng.normal(size=n)
    t = pa.table({"k": pa.array(keys.tolist()),
                  "ts": pa.array(ts, pa.int64()),
                  "id": pa.array(ids, pa.int64()),
                  "v": pa.array(vals)})
    W = 7.0  # 7s -> 7_000_000 us windows
    got = tumbling_window_stats(
        ray.data.from_arrow(t).repartition(5), key_col="k", ts_col="ts",
        value_col="v", id_col="id", width_s=W, num_partitions=4
    ).to_pandas().sort_values(["k", "w_start"]).reset_index(drop=True)

    width_us = int(W * 1e6)
    want = {}
    for k_, t_, i_, v_ in zip(keys, ts, ids, vals):
        w = (t_ // width_us) * width_us
        e = want.setdefault((k_, w), [0, 0, np.inf, -np.inf])
        e[0] += 1
        e[1] += i_
        e[2] = min(e[2], v_)
        e[3] = max(e[3], v_)
    assert len(got) == len(want)
    for _, r in got.iterrows():
        n_, s_, mn, mx = want[(r["k"], r["w_start"])]
        assert (r["n_events"], r["id_sum"]) == (n_, s_)
        assert r["v_min"] == mn and r["v_max"] == mx


def test_tumbling_window_partition_invariance():
    rng = np.random.default_rng(2)
    t = pa.table({"k": pa.array(rng.choice(["a", "b"], 200).tolist()),
                  "ts": pa.array(rng.integers(0, 10_000, 200), pa.int64()),
                  "id": pa.array(np.arange(200), pa.int64()),
                  "v": pa.array(rng.normal(size=200))})

    def run(ds, p):
        return tumbling_window_stats(
            ds, key_col="k", ts_col="ts", value_col="v", id_col="id",
            width_s=0.001, num_partitions=p
        ).to_pandas().sort_values(["k", "w_start"]).reset_index(drop=True)

    a = run(ray.data.from_arrow(t), 2)
    b = run(ray.data.from_arrow(t).repartition(9), 7)
    assert a.equals(b)


def _tfidf_replay(ids, texts, k):
    tf = {}
    df = {}
    for d, tx in zip(ids, texts):
        toks = tx.split()
        for term in set(toks):
            df[term] = df.get(term, 0) + 1
        for term in toks:
            tf[(d, term)] = tf.get((d, term), 0) + 1
    n = float(len(ids))
    rows = []
    for (d, term), f in tf.items():
        rows.append((d, term, f, f * (n / df[term])))
    out = []
    for d in set(ids):
        mine = sorted((r for r in rows if r[0] == d),
                      key=lambda r: (-r[3], r[1]))[:k]
        out.extend(mine)
    return {(d, t): (f, s) for d, t, f, s in out}


def test_tfidf_matches_serial_replay():
    rng = np.random.default_rng(4)
    vocab = [f"w{i}" for i in range(30)]
    ids = list(range(60))
    texts = [" ".join(rng.choice(vocab, size=rng.integers(3, 25)).tolist())
             for _ in ids]
    t = pa.table({"doc_id": pa.array(ids, pa.int64()),
                  "text": pa.array(texts)})
    got = tfidf_topk(ray.data.from_arrow(t).repartition(6),
                     id_col="doc_id", text_col="text", k=3).to_pandas()
    want = _tfidf_replay(ids, texts, 3)
    assert len(got) == len(want)
    for _, r in got.iterrows():
        f, s = want[(r["doc_id"], r["term"])]
        assert r["tf"] == f
        assert r["tfidf"] == s  # bit-exact: same two IEEE ops


def test_tfidf_empty_and_short_docs():
    t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "text": pa.array(["only", "", "   "])})
    got = tfidf_topk(ray.data.from_arrow(t), k=3).to_pandas()
    # docs 2/3 have no tokens -> no rows; doc 1 has one term
    assert got["doc_id"].tolist() == [1]
    assert got["term"].tolist() == ["only"]
    assert got["tfidf"].tolist() == [1.0 * (3.0 / 1.0)]


# ------------------------------------------------------- heavy hitters ----

def _hh_replay(texts, by, k):
    from collections import Counter

    c = Counter()
    for t in texts:
        toks = t.split()
        c.update(set(toks) if by == "doc_freq" else toks)
    return sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:k]


@pytest.mark.parametrize("by", ["doc_freq", "term_count"])
def test_top_terms_matches_counter(by):
    from featurebox_ray.stages.tfidf import top_terms

    rng = np.random.default_rng(21)
    vocab = [f"w{i:02d}" for i in range(40)]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(1, 12)))
             for _ in range(300)] + ["", "  "]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts),
    })).repartition(6)
    got = top_terms(ds, k=7, by=by, num_partitions=3).to_pandas()
    want = _hh_replay(texts, by, 7)
    assert list(zip(got["term"], got["cnt"])) == want


def test_top_terms_k_exceeds_vocab_and_ties():
    from featurebox_ray.stages.tfidf import top_terms

    texts = ["b a", "b c", "a c"]  # every term df=2: pure term tie-break
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(texts)}))
    got = top_terms(ds, k=99, by="doc_freq", num_partitions=2).to_pandas()
    assert list(got["term"]) == ["a", "b", "c"]
    assert list(got["cnt"]) == [2, 2, 2]


# ----------------------------------------------------------- chunking -----

def test_chunk_documents_matches_serial_replay():
    from featurebox_ray.stages.chunk import chunk_documents

    rng = np.random.default_rng(53)
    texts = [" ".join(f"t{j}" for j in range(rng.integers(0, 90)))
             for _ in range(120)]
    texts[0] = ""          # zero-token doc emits no chunks
    texts[1] = "only"      # single short chunk
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts)})).repartition(5)
    K, OV = 16, 4
    got = (chunk_documents(ds, chunk_tokens=K, overlap=OV)
           .to_pandas().sort_values(["doc_id", "chunk_idx"])
           .reset_index(drop=True))
    want = []
    for i, t in enumerate(texts):
        toks = t.split()
        for ci, start in enumerate(range(0, len(toks), K - OV)):
            sel = toks[start:start + K]
            want.append((i, ci, " ".join(sel), len(sel)))
            if start + K >= len(toks):  # spec: stop at the first window
                break                   # that reaches the doc end
    assert list(map(tuple, got.itertuples(index=False))) == want
    # overlap: consecutive chunks share exactly OV tokens (full chunks)
    full = got[(got.doc_id == got.doc_id.iloc[-1]) & (got.n_tokens == K)]
    if len(full) >= 2:
        a = full.iloc[0]["chunk_text"].split()
        b = full.iloc[1]["chunk_text"].split()
        assert a[-OV:] == b[:OV]

    with pytest.raises(Exception, match="overlap"):
        chunk_documents(ds, chunk_tokens=8, overlap=8).to_pandas()


def test_hopping_window_matches_serial_and_tumbling():
    from featurebox_ray.stages.window import hopping_window_stats

    rng = np.random.default_rng(19)
    n = 300
    keys = rng.choice(["u1", "u2"], n)
    ts = rng.integers(0, 60_000, n)
    ids = np.arange(n)
    vals = rng.normal(size=n)
    t = pa.table({"k": pa.array(keys.tolist()),
                  "ts": pa.array(ts, pa.int64()),
                  "id": pa.array(ids, pa.int64()),
                  "v": pa.array(vals)})
    ds = ray.data.from_arrow(t)
    W, H = 6.0, 2.0  # each row in exactly 3 windows
    got = hopping_window_stats(
        ds.repartition(4), key_col="k", ts_col="ts", value_col="v",
        id_col="id", width_s=W, hop_s=H, num_partitions=3
    ).to_pandas().sort_values(["k", "w_start"]).reset_index(drop=True)

    hop_us, m = int(H * 1e6), 3
    want = {}
    for k_, t_, i_, v_ in zip(keys, ts, ids, vals):
        top = (t_ // hop_us) * hop_us
        for j in range(m):
            e = want.setdefault((k_, top - j * hop_us),
                                [0, 0, np.inf, -np.inf])
            e[0] += 1
            e[1] += i_
            e[2] = min(e[2], v_)
            e[3] = max(e[3], v_)
    assert len(got) == len(want)
    for _, r in got.iterrows():
        n_, s_, mn, mx = want[(r["k"], r["w_start"])]
        assert (r["n_events"], r["id_sum"]) == (n_, s_)
        assert r["v_min"] == mn and r["v_max"] == mx
    # every event is counted exactly m times across all windows
    assert got["n_events"].sum() == n * m

    # hop == width degenerates to the tumbling aggregate exactly
    a = hopping_window_stats(ds, key_col="k", ts_col="ts", value_col="v",
                             id_col="id", width_s=W, hop_s=W
                             ).to_pandas().sort_values(["k", "w_start"]
                                                       ).reset_index(drop=True)
    b = tumbling_window_stats(ds, key_col="k", ts_col="ts", value_col="v",
                              id_col="id", width_s=W
                              ).to_pandas().sort_values(["k", "w_start"]
                                                        ).reset_index(drop=True)
    assert a.equals(b)

    with pytest.raises(ValueError, match="multiple"):
        hopping_window_stats(ds, key_col="k", ts_col="ts", value_col="v",
                             id_col="id", width_s=5.0, hop_s=2.0)


def test_window_stats_null_ts_and_null_key():
    """Null timestamps are filtered (not crashed on); NULL keys form
    their own group like SQL GROUP BY, for both tumbling and hopping."""
    from featurebox_ray.stages.window import hopping_window_stats

    t = pa.table({
        "k": pa.array(["a", None, "a", None, "b"]),
        "ts": pa.array([1_000_000, 1_500_000, None, 2_000_000, 500_000],
                       pa.int64()),
        "id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "v": pa.array([1.0, 2.0, 3.0, 4.0, 5.0]),
    })
    ds = ray.data.from_arrow(t).repartition(2)
    tumb = tumbling_window_stats(ds, key_col="k", ts_col="ts",
                                 value_col="v", id_col="id",
                                 width_s=1.0).to_pandas()
    # null-ts row (id 3) dropped; null-key rows kept as their own group
    assert tumb["n_events"].sum() == 4
    nullk = tumb[tumb["k"].isna()]
    assert nullk["n_events"].sum() == 2 and nullk["id_sum"].sum() == 6

    hop = hopping_window_stats(ds, key_col="k", ts_col="ts",
                               value_col="v", id_col="id",
                               width_s=2.0, hop_s=1.0).to_pandas()
    assert hop["n_events"].sum() == 4 * 2
    assert hop[hop["k"].isna()]["n_events"].sum() == 4


def test_add_ewm_matches_pandas_and_partition_invariant():
    import pandas as pd

    from featurebox_ray.functions.segments import ewm_mean
    from featurebox_ray.stages.window import add_ewm

    rng = np.random.default_rng(23)
    n = 2000
    df = pd.DataFrame({
        "id": np.arange(n, dtype=np.int64),
        "k": rng.choice(["a", "b", "c"], size=n),
        "ts": rng.integers(0, 10**9, size=n),
        "v": rng.normal(size=n),
    })
    ds = ray.data.from_arrow(pa.Table.from_pandas(df,
                                                  preserve_index=False))
    a = (add_ewm(ds.repartition(3), key_col="k", ts_col="ts",
                 value_col="v", alpha=0.3, order_col="id",
                 num_partitions=2)
         .to_pandas().sort_values("id").reset_index(drop=True))
    b = (add_ewm(ds.repartition(8), key_col="k", ts_col="ts",
                 value_col="v", alpha=0.3, order_col="id",
                 num_partitions=5)
         .to_pandas().sort_values("id").reset_index(drop=True))
    assert (a["ewm"].to_numpy() == b["ewm"].to_numpy()).all()  # bit-exact

    # pandas groupby-ewm agreement (different op order: ~1e-12)
    sdf = df.sort_values(["k", "ts", "id"], kind="stable")
    want = (sdf.groupby("k")["v"]
            .transform(lambda s: s.ewm(alpha=0.3, adjust=False).mean()))
    sdf = sdf.assign(want=want).sort_values("id").reset_index(drop=True)
    assert np.allclose(a["ewm"].to_numpy(), sdf["want"].to_numpy(),
                       rtol=0, atol=1e-10)

    import pytest

    with pytest.raises(ValueError, match="alpha"):
        ewm_mean(np.ones(3), 0.0, np.array([True, False, False]))


def test_running_totals_matches_duckdb():
    import duckdb
    import pandas as pd

    from featurebox_ray.stages.window import add_running_totals

    rng = np.random.default_rng(37)
    n = 1500
    df = pd.DataFrame({
        "id": np.arange(n, dtype=np.int64),
        "k": rng.integers(0, 20, size=n).astype(np.int64),
        "ts": rng.integers(0, 10**6, size=n).astype(np.int64),
        "v": rng.integers(-50, 500, size=n).astype(np.int64),
    })
    for parts, nparts in ((3, 2), (9, 6)):
        got = (add_running_totals(
            ray.data.from_arrow(pa.Table.from_pandas(
                df, preserve_index=False)).repartition(parts),
            key_col="k", ts_col="ts", int_value_col="v",
            order_col="id", num_partitions=nparts)
            .to_pandas().sort_values("id").reset_index(drop=True))
        con = duckdb.connect()
        want = con.execute("""
            SELECT id, sum(v) OVER (PARTITION BY k ORDER BY ts, id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS rs
            FROM df ORDER BY id
        """).df()
        con.close()
        assert (got["running_sum"].to_numpy(np.int64)
                == want["rs"].to_numpy(np.int64)).all()


def test_ewm_alpha_edges_and_null_key_group():
    import pandas as pd
    import pytest

    from featurebox_ray.functions.segments import ewm_mean
    from featurebox_ray.stages.window import add_ewm

    # alpha=1 is the identity; near-1 alphas must not underflow to NaN
    v = np.arange(200, dtype=np.float64)
    st = np.zeros(200, bool)
    st[0] = True
    assert (ewm_mean(v, 1.0, st) == v).all()
    near = ewm_mean(v, 0.9999995, st)
    assert np.isfinite(near).all()
    assert np.allclose(near, v, atol=1e-3)  # ~identity at alpha≈1

    # NULL keys form ONE group (not one segment per row)
    df = pd.DataFrame({
        "id": np.arange(6, dtype=np.int64),
        "k": pd.array([None, None, None, 1, 1, 1], dtype="Int64"),
        "ts": np.arange(6, dtype=np.int64),
        "v": np.array([1.0, 2.0, 3.0, 1.0, 2.0, 3.0]),
    })
    got = (add_ewm(ray.data.from_arrow(pa.Table.from_pandas(
        df, preserve_index=False)).repartition(3),
        key_col="k", ts_col="ts", value_col="v", alpha=0.5,
        order_col="id", num_partitions=2)
        .to_pandas().sort_values("id").reset_index(drop=True))
    # null-key group accumulates across its rows: 1, 1.5, 2.25
    assert got["ewm"].tolist()[:3] == [1.0, 1.5, 2.25]
    assert got["ewm"].tolist()[3:] == [1.0, 1.5, 2.25]

    # non-finite values raise instead of silently poisoning
    bad = df.assign(v=[1.0, None, 3.0, 1.0, 2.0, 3.0])
    with pytest.raises(Exception, match="finite"):
        (add_ewm(ray.data.from_arrow(pa.Table.from_pandas(
            bad, preserve_index=False)), key_col="k", ts_col="ts",
            value_col="v", alpha=0.5, order_col="id").to_pandas())


def test_running_totals_null_values_and_keys():
    import duckdb
    import pandas as pd

    from featurebox_ray.stages.window import add_running_totals

    df = pd.DataFrame({
        "id": np.arange(8, dtype=np.int64),
        "k": pd.array([1, 1, None, None, 2, 2, 1, None], dtype="Int64"),
        "ts": np.arange(8, dtype=np.int64),
        "v": pd.array([5, None, 7, 2, None, 3, 10, None],
                      dtype="Int64"),
    })
    got = (add_running_totals(ray.data.from_arrow(pa.Table.from_pandas(
        df, preserve_index=False)).repartition(3),
        key_col="k", ts_col="ts", int_value_col="v", order_col="id",
        num_partitions=2)
        .to_pandas().sort_values("id").reset_index(drop=True))
    con = duckdb.connect()
    want = con.execute("""
        SELECT id, sum(coalesce(v, 0)) OVER (PARTITION BY k
               ORDER BY ts, id ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW) AS rs
        FROM df ORDER BY id
    """).df()
    con.close()
    assert (got["running_sum"].to_numpy(np.int64)
            == want["rs"].to_numpy(np.int64)).all()
    assert got["running_sum"].dtype == np.int64  # never a float trip


def test_rolling_quantile_matches_duckdb_and_partition_invariant():
    import duckdb

    from featurebox_ray.stages.window import add_rolling_quantile

    rng = np.random.default_rng(23)
    n = 600
    t = pa.table({
        "k": pa.array(rng.integers(0, 9, n), pa.int64()),
        "ts": pa.array(rng.integers(0, 5000, n), pa.int64()),
        "o": pa.array(np.arange(n), pa.int64()),
        "v": pa.array([None if rng.random() < 0.1
                       else float(rng.normal()) for _ in range(n)],
                      pa.float64()),
    })
    want = duckdb.sql("""
        SELECT o, quantile_disc(v, CAST(0.3 AS DOUBLE))
                 OVER (PARTITION BY k ORDER BY ts, o
                       ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS rq
        FROM t ORDER BY o
    """).fetchdf()

    prev = None
    for parts in (1, 5):
        ds = ray.data.from_arrow(t)
        if parts > 1:
            ds = ds.repartition(parts)
        got = (add_rolling_quantile(ds, key_col="k", ts_col="ts",
                                    value_col="v", order_col="o",
                                    window_rows=7, q=0.3,
                                    out_col="rq", num_partitions=4)
               .to_pandas().sort_values("o").reset_index(drop=True))
        gv = got["rq"].to_numpy(np.float64)
        assert np.array_equal(gv, want["rq"].to_numpy(np.float64),
                              equal_nan=True)
        if prev is not None:
            assert np.array_equal(prev, gv, equal_nan=True)
        prev = gv


def test_rolling_quantile_guards():
    from featurebox_ray.stages.window import add_rolling_quantile
    ds = ray.data.from_arrow(pa.table({"k": [1], "ts": [1], "o": [1],
                                       "v": [1.0]}))
    with pytest.raises(ValueError, match="window_rows"):
        add_rolling_quantile(ds, key_col="k", ts_col="ts", value_col="v",
                             order_col="o", window_rows=0)
    with pytest.raises(ValueError, match="q must"):
        add_rolling_quantile(ds, key_col="k", ts_col="ts", value_col="v",
                             order_col="o", window_rows=3, q=1.5)


def test_centered_window_sum_matches_duckdb():
    import duckdb

    from featurebox_ray.stages.window import add_centered_window_sum

    rng = np.random.default_rng(29)
    n = 400
    t = pa.table({
        "k": pa.array(rng.integers(0, 7, n), pa.int64()),
        "ts": pa.array(rng.integers(0, 3000, n), pa.int64()),
        "o": pa.array(np.arange(n), pa.int64()),
        "v": pa.array([None if rng.random() < 0.1
                       else int(rng.integers(-50, 50))
                       for _ in range(n)], pa.int64()),
    })
    want = duckdb.sql("""
        SELECT o, CAST(sum(coalesce(v, 0)) OVER w AS BIGINT) AS s,
               CAST(count(v) OVER w AS BIGINT) AS c
        FROM t
        WINDOW w AS (PARTITION BY k ORDER BY ts, o
                     ROWS BETWEEN 2 PRECEDING AND 4 FOLLOWING)
        ORDER BY o
    """).fetchdf()
    for parts in (1, 5):
        ds = ray.data.from_arrow(t)
        if parts > 1:
            ds = ds.repartition(parts)
        got = (add_centered_window_sum(ds, key_col="k", ts_col="ts",
                                       int_value_col="v", order_col="o",
                                       before=2, after=4,
                                       num_partitions=3)
               .to_pandas().sort_values("o").reset_index(drop=True))
        assert got["win_sum"].tolist() == want["s"].tolist()
        assert got["win_n"].tolist() == want["c"].tolist()

    with pytest.raises(ValueError, match="before/after"):
        add_centered_window_sum(ray.data.from_arrow(t), key_col="k",
                                ts_col="ts", int_value_col="v",
                                order_col="o", before=-1, after=2)


def test_top_bigrams_counter_replay_and_duckdb():
    import collections

    import duckdb

    from featurebox_ray.stages.tfidf import top_bigrams

    rng = np.random.default_rng(31)
    vocab = [f"w{i}" for i in range(12)]
    texts = [" ".join(rng.choice(vocab, size=int(rng.integers(0, 15))))
             for _ in range(60)] + ["", None, "solo"]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    # serial Counter replay
    c = collections.Counter()
    for x in texts:
        ws = (x or "").split()
        c.update(f"{a} {b}" for a, b in zip(ws, ws[1:]))
    want = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    for parts in (1, 5):
        got = (top_bigrams(ray.data.from_arrow(t).repartition(parts),
                           k=10, num_partitions=3)
               .to_pandas())
        assert list(map(tuple, got[["bigram", "cnt"]].to_records(
            index=False))) == want, parts
    # DuckDB replay of the same list_slice/array_to_string convention
    con = duckdb.connect()
    con.register("documents", t)
    w2 = con.execute(r"""
        WITH base AS (SELECT regexp_extract_all(text, '\S+') AS t
                      FROM documents),
        bg AS (SELECT array_to_string(list_slice(t, i, i + 1), ' ')
                   AS bigram
               FROM base, LATERAL unnest(range(1, len(t))) AS u(i)
               WHERE len(t) >= 2)
        SELECT bigram, CAST(count(*) AS BIGINT) AS cnt FROM bg
        GROUP BY bigram ORDER BY cnt DESC, bigram ASC LIMIT 10
    """).fetchall()
    assert w2 == want


def test_cusum_duckdb_and_recurrence():
    import duckdb

    from featurebox_ray.stages.window import add_cusum

    rng = np.random.default_rng(61)
    n = 300
    t = pa.table({
        "event_id": pa.array(np.arange(n), pa.int64()),
        "user_id": pa.array([None if i % 41 == 0 else int(v) for i, v in
                             enumerate(rng.integers(0, 8, n))],
                            pa.int64()),
        "ts": pa.array(rng.integers(0, 10_000, n), pa.int64()),
        "v": pa.array([None if i % 37 == 0 else int(x) for i, x in
                       enumerate(rng.integers(-20, 40, n))], pa.int64()),
    })
    K = 7
    con = duckdb.connect()
    con.register("t", t)
    want = con.execute(f"""
        SELECT event_id,
               P - LEAST(0, min(P) OVER w2) AS cusum
        FROM (
          SELECT event_id, user_id, ts,
                 sum(coalesce(v, 0) - {K}) OVER w AS P
          FROM t
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING)
        )
        WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS UNBOUNDED PRECEDING)
        ORDER BY event_id
    """).fetch_arrow_table()
    for parts, np_ in ((1, 2), (5, 3), (9, 7)):
        got = (add_cusum(ray.data.from_arrow(t).repartition(parts),
                         key_col="user_id", ts_col="ts",
                         int_value_col="v", order_col="event_id",
                         drift_k=K, num_partitions=np_)
               .to_pandas().sort_values("event_id")
               .reset_index(drop=True))
        assert got["cusum"].tolist() == want["cusum"].to_pylist(), (
            parts, np_)
    # direct recurrence replay: s_t = max(0, s_{t-1} + v - k)
    rows = sorted(
        ((u if u is not None else -1, s, i, 0 if x is None else x)
         for u, s, i, x in zip(t["user_id"].to_pylist(),
                               t["ts"].to_pylist(),
                               t["event_id"].to_pylist(),
                               t["v"].to_pylist())))
    state, expect = {}, {}
    for u, s, i, x in rows:
        state[u] = max(0, state.get(u, 0) + x - K)
        expect[i] = state[u]
    got = (add_cusum(ray.data.from_arrow(t), key_col="user_id",
                     ts_col="ts", int_value_col="v",
                     order_col="event_id", drift_k=K).to_pandas())
    for _, r in got.iterrows():
        assert r["cusum"] == expect[r["event_id"]]


def test_time_weighted_avg_duckdb_and_replay():
    import duckdb

    from featurebox_ray.stages.window import time_weighted_avg

    rng = np.random.default_rng(83)
    n = 300
    t = pa.table({
        "event_id": pa.array(np.arange(n), pa.int64()),
        "user_id": pa.array(rng.integers(0, 10, n), pa.int64()),
        "ts": pa.array([None if i % 41 == 0 else int(v) for i, v in
                        enumerate(np.sort(rng.integers(0, 10**9, n)))],
                       pa.timestamp("us")),
        "v": pa.array([None if i % 37 == 0 else int(x) for i, x in
                       enumerate(rng.integers(-500, 2000, n))],
                      pa.int64()),
    })
    con = duckdb.connect()
    con.register("t", t)
    want = con.execute("""
        WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts, v
                   FROM t WHERE ts IS NOT NULL AND v IS NOT NULL),
        g AS (SELECT user_id, v, ts,
                     lead(ts) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS nxt
              FROM e),
        a AS (SELECT user_id,
                     CAST(count(*) AS BIGINT) AS n,
                     CAST(max(ts) - min(ts) AS BIGINT) AS span,
                     CAST(sum(v * (nxt - ts)) AS BIGINT) AS num
              FROM g GROUP BY user_id)
        SELECT user_id, n, span,
               CASE WHEN span > 0 THEN
                 CAST(num AS DOUBLE) / CAST(span AS DOUBLE) END AS twa
        FROM a ORDER BY user_id
    """).fetch_arrow_table()
    for parts, np_ in ((1, 2), (5, 3), (9, 7)):
        got = (time_weighted_avg(
            ray.data.from_arrow(t).repartition(parts),
            key_col="user_id", ts_col="ts", int_value_col="v",
            order_col="event_id", num_partitions=np_)
            .to_pandas().sort_values("user_id").reset_index(drop=True))
        assert got["user_id"].tolist() == want["user_id"].to_pylist()
        for c in ("n", "span", "twa"):
            gv = [None if isinstance(x, float) and x != x else x
                  for x in got[c].tolist()]
            assert gv == want[c].to_pylist(), (c, parts, np_)
    # hand case: value 10 held for 3 units then 20 for 1 unit
    h = pa.table({
        "event_id": pa.array([1, 2, 3], pa.int64()),
        "user_id": pa.array([1, 1, 1], pa.int64()),
        "ts": pa.array([0, 3, 4], pa.int64()),
        "v": pa.array([10, 20, 999], pa.int64()),
    })
    got = time_weighted_avg(ray.data.from_arrow(h), key_col="user_id",
                            ts_col="ts", int_value_col="v",
                            order_col="event_id").to_pandas()
    assert got.iloc[0]["twa"] == (10 * 3 + 20 * 1) / 4.0


def test_drawdown_duckdb_and_recurrence():
    import duckdb

    from featurebox_ray.stages.window import add_drawdown

    rng = np.random.default_rng(103)
    n = 300
    t = pa.table({
        "event_id": pa.array(np.arange(n), pa.int64()),
        "user_id": pa.array([None if i % 41 == 0 else int(v) for i, v in
                             enumerate(rng.integers(0, 8, n))],
                            pa.int64()),
        "ts": pa.array(rng.integers(0, 10_000, n), pa.int64()),
        "v": pa.array([None if i % 37 == 0 else int(x) for i, x in
                       enumerate(rng.integers(-30, 35, n))], pa.int64()),
    })
    con = duckdb.connect()
    con.register("t", t)
    want = con.execute("""
        SELECT event_id,
               CAST(GREATEST(0, max(P) OVER w2) - P AS BIGINT)
                   AS drawdown
        FROM (
          SELECT event_id, user_id, ts,
                 sum(coalesce(v, 0)) OVER w AS P
          FROM t
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING)
        )
        WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS UNBOUNDED PRECEDING)
        ORDER BY event_id
    """).fetch_arrow_table()
    for parts, np_ in ((1, 2), (5, 3), (9, 7)):
        got = (add_drawdown(ray.data.from_arrow(t).repartition(parts),
                            key_col="user_id", ts_col="ts",
                            int_value_col="v", order_col="event_id",
                            num_partitions=np_)
               .to_pandas().sort_values("event_id")
               .reset_index(drop=True))
        assert got["drawdown"].tolist() == want["drawdown"].to_pylist()
    # direct recurrence: dd = max(peak, 0) - P with peak = running max
    rows = sorted(
        ((u if u is not None else -1, s, i, 0 if x is None else x)
         for u, s, i, x in zip(t["user_id"].to_pylist(),
                               t["ts"].to_pylist(),
                               t["event_id"].to_pylist(),
                               t["v"].to_pylist())))
    tot, peak, expect = {}, {}, {}
    for u, s, i, x in rows:
        tot[u] = tot.get(u, 0) + x
        peak[u] = max(peak.get(u, 0), tot[u])
        expect[i] = max(peak[u], 0) - tot[u]
    got = (add_drawdown(ray.data.from_arrow(t), key_col="user_id",
                        ts_col="ts", int_value_col="v",
                        order_col="event_id").to_pandas())
    for _, r in got.iterrows():
        assert r["drawdown"] == expect[r["event_id"]]
