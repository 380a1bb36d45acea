"""Kneser-Ney bigram table (stages/lm.py:kn_bigram_topk) vs a DuckDB
replay; hand-checked probabilities; partition invariance."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from featurebox_ray.stages.lm import kn_bigram_topk

ORACLE = r"""
    WITH base AS (
      SELECT g AS source,
             regexp_extract_all(coalesce(txt, ''), '\S+') AS t
      FROM docs WHERE g IS NOT NULL AND txt IS NOT NULL),
    bg AS (SELECT source, t[i] AS w1, t[i + 1] AS w2
           FROM base, LATERAL unnest(range(1, len(t))) AS u(i)
           WHERE len(t) >= 2),
    c AS (SELECT source, w1, w2, CAST(count(*) AS BIGINT) AS c
          FROM bg GROUP BY 1, 2, 3),
    gt AS (SELECT source, CAST(sum(c) AS BIGINT) AS tot,
                  CAST(count(*) AS BIGINT) AS ntypes
           FROM c GROUP BY source),
    f AS (SELECT source, w1, CAST(count(*) AS BIGINT) AS fc
          FROM c GROUP BY source, w1),
    b AS (SELECT source, w2, CAST(count(*) AS BIGINT) AS bc
          FROM c GROUP BY source, w2),
    s AS (SELECT c.source, c.w1, c.w2, c.c,
                 CAST((4 * c.c - 3) * gt.ntypes
                      + 3 * f.fc * b.bc AS DOUBLE)
                 / CAST(4 * gt.tot * gt.ntypes AS DOUBLE) AS kn_p
          FROM c JOIN gt USING (source)
          JOIN f ON f.source = c.source AND f.w1 = c.w1
          JOIN b ON b.source = c.source AND b.w2 = c.w2),
    r AS (SELECT *, row_number() OVER (PARTITION BY source
                       ORDER BY kn_p DESC, w1, w2) AS rn FROM s)
    SELECT source, w1, w2, c, kn_p FROM r WHERE rn <= {k}
    ORDER BY source, kn_p DESC, w1, w2
"""


def _text(rng) -> str:
    words = ["the", "cat", "sat", "on", "mat", "dog", "ran"]
    n = int(rng.integers(0, 15))
    return " ".join(rng.choice(words) for _ in range(n))


def test_kn_bigram_duckdb_fuzz_partition_invariant():
    rng = np.random.default_rng(509)
    n = 400
    gs = [None if rng.random() < 0.03 else f"s{rng.integers(0, 5)}"
          for _ in range(n)]
    txts = [None if rng.random() < 0.03 else _text(rng)
            for _ in range(n)]
    pdf = pd.DataFrame({"g": gs, "txt": txts})
    con = duckdb.connect()
    con.register("docs", pdf)
    exp = con.sql(ORACLE.format(k=10)).df().reset_index(drop=True)
    t = pa.table({"g": pa.array(gs, pa.string()),
                  "txt": pa.array(txts, pa.string())})
    prev = None
    for parts in (1, 6):
        ds = ray.data.from_arrow(t)
        if parts > 1:
            ds = ds.repartition(parts)
        got = (kn_bigram_topk(ds, group_col="g", text_col="txt",
                              k=10, num_partitions=4)
               .to_pandas()
               .sort_values(["g", "kn_p", "w1", "w2"],
                            ascending=[True, False, True, True])
               .reset_index(drop=True))
        got.columns = ["source", "w1", "w2", "c", "kn_p"]
        pd.testing.assert_frame_equal(
            got.astype(exp.dtypes.to_dict()), exp, check_exact=True)
        if prev is not None:
            assert got.equals(prev)
        prev = got


def test_kn_bigram_hand_checked():
    # one source, two docs: "a b a b" and "a c"
    # bigrams: (a,b)x2, (b,a)x1, (a,c)x1 -> tot=4, T=3
    # F(a)=2, F(b)=1; B(b)=1, B(a)=1, B(c)=1
    # p(a,b) = ((4*2-3)*3 + 3*2*1) / (4*4*3) = (15+6)/48 = 21/48
    # p(b,a) = ((4-3)*3 + 3*1*1) / 48 = 6/48
    # p(a,c) = ((4-3)*3 + 3*2*1) / 48 = 9/48
    t = pa.table({"g": pa.array(["x", "x"], pa.string()),
                  "txt": pa.array(["a b a b", "a c"], pa.string())})
    got = (kn_bigram_topk(ray.data.from_arrow(t), group_col="g",
                          text_col="txt", k=5)
           .to_pandas().sort_values(["w1", "w2"])
           .reset_index(drop=True))
    assert got["c"].tolist() == [2, 1, 1]          # (a,b) (a,c) (b,a)
    assert got["kn_p"].tolist() == [21 / 48, 9 / 48, 6 / 48]
    # KN property: within a context, probs + backoff mass behave;
    # sum over observed w2 of p(w1=a) = (21+9)/48 < 1 (mass reserved)


def test_kn_bigram_single_token_docs_emit_nothing():
    t = pa.table({"g": pa.array(["x", "x"], pa.string()),
                  "txt": pa.array(["one", ""], pa.string())})
    got = kn_bigram_topk(ray.data.from_arrow(t), group_col="g",
                         text_col="txt").to_pandas()
    assert len(got) == 0
