"""BM25 scoring (stages/tfidf.py:bm25_topk) vs a DuckDB replay;
hand-checked score; partition invariance."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray

from featurebox_ray.stages.tfidf import bm25_topk

ORACLE = r"""
    WITH d AS (
      SELECT rid AS doc_id,
             regexp_extract_all(coalesce(txt, ''), '\S+') AS t
      FROM docs WHERE rid IS NOT NULL AND txt IS NOT NULL),
    dl AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS dl FROM d),
    g AS (SELECT CAST(sum(dl) AS BIGINT) AS s,
                 CAST(count(*) AS BIGINT) AS c FROM dl),
    q(term) AS (VALUES {terms}),
    tf AS (SELECT d.doc_id, x AS term, CAST(count(*) AS BIGINT) AS tf
           FROM d, LATERAL unnest(t) AS u(x) JOIN q ON q.term = x
           GROUP BY d.doc_id, x),
    df AS (SELECT term, CAST(count(*) AS BIGINT) AS df
           FROM tf GROUP BY term),
    s AS (SELECT tf.term, tf.doc_id, tf.tf, dl.dl,
                 (CAST(2 * g.c - 2 * df.df + 1 AS DOUBLE)
                  / CAST(2 * df.df + 1 AS DOUBLE))
                 * (CAST(22 * g.s * tf.tf AS DOUBLE)
                    / CAST(10 * g.s * tf.tf + 3 * g.s
                           + 9 * g.c * dl.dl AS DOUBLE)) AS score
          FROM tf JOIN dl ON dl.doc_id = tf.doc_id
          JOIN df ON df.term = tf.term, g),
    r AS (SELECT *, row_number() OVER (PARTITION BY term
              ORDER BY score DESC, doc_id) AS rn FROM s)
    SELECT term, doc_id, tf, dl, score FROM r WHERE rn <= {k}
    ORDER BY term, score DESC, doc_id
"""


def _text(rng) -> str:
    words = ["the", "cat", "sat", "table", "query", "dog"]
    n = int(rng.integers(0, 20))
    return " ".join(rng.choice(words) for _ in range(n))


def test_bm25_duckdb_fuzz_partition_invariant():
    rng = np.random.default_rng(641)
    n = 500
    txts = [None if rng.random() < 0.03 else _text(rng)
            for _ in range(n)]
    pdf = pd.DataFrame({"rid": np.arange(n), "txt": txts})
    con = duckdb.connect()
    con.register("docs", pdf)
    exp = con.sql(ORACLE.format(
        terms="('cat'), ('query'), ('table')", k=8)).df(
        ).reset_index(drop=True)
    t = pa.table({"rid": pa.array(np.arange(n), pa.int64()),
                  "txt": pa.array(txts, pa.string())})
    prev = None
    for parts in (1, 7):
        ds = ray.data.from_arrow(t)
        if parts > 1:
            ds = ds.repartition(parts)
        got = (bm25_topk(ds, id_col="rid", text_col="txt",
                         query_terms=["table", "query", "cat"], k=8)
               .to_pandas()
               .sort_values(["term", "score", "rid"],
                            ascending=[True, False, True])
               .reset_index(drop=True))
        got.columns = ["term", "doc_id", "tf", "dl", "score"]
        pd.testing.assert_frame_equal(
            got.astype(exp.dtypes.to_dict()), exp, check_exact=True)
        if prev is not None:
            assert got.equals(prev)
        prev = got


def test_bm25_hand_checked():
    # corpus: "a a b" (dl 3) and "b c" (dl 2); S=5, C=2
    # query 'a': df=1, tf=2 in doc 0
    # idf = (2*2-2*1+1)/(2*1+1) = 3/3 = 1
    # tfpart = 22*5*2 / (10*5*2 + 3*5 + 9*2*3) = 220/169
    t = pa.table({"rid": pa.array([0, 1], pa.int64()),
                  "txt": pa.array(["a a b", "b c"], pa.string())})
    got = bm25_topk(ray.data.from_arrow(t), id_col="rid",
                    text_col="txt", query_terms=["a"]).to_pandas()
    assert len(got) == 1
    assert got["tf"].tolist() == [2] and got["dl"].tolist() == [3]
    assert got["score"].tolist() == [1.0 * (220.0 / 169.0)]


def test_bm25_rank_prefers_rare_term_doc():
    # 'rare' appears in 1 of 4 docs, 'common' in all: the rare-term
    # doc must outscore every common-term doc at equal tf/dl
    rows = ["common rare x", "common x y", "common y z", "common z w"]
    t = pa.table({"rid": pa.array(range(4), pa.int64()),
                  "txt": pa.array(rows, pa.string())})
    got = bm25_topk(ray.data.from_arrow(t), id_col="rid",
                    text_col="txt",
                    query_terms=["rare", "common"]).to_pandas()
    rare = got[got["term"] == "rare"]["score"].max()
    common = got[got["term"] == "common"]["score"].max()
    assert rare > common


def test_bm25_requires_terms():
    t = pa.table({"rid": pa.array([0], pa.int64()),
                  "txt": pa.array(["x"], pa.string())})
    with pytest.raises(ValueError, match="query_terms"):
        bm25_topk(ray.data.from_arrow(t), id_col="rid",
                  text_col="txt", query_terms=[])
