"""Vocabulary coverage (stages/tfidf.py:vocab_coverage) vs a DuckDB
term-count replay; hand-checked Good-Turing/Chao1 numbers; partition
invariance."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from featurebox_ray.stages.tfidf import vocab_coverage

ORACLE = r"""
    WITH tok AS (
      SELECT g, unnest(regexp_extract_all(coalesce(txt, ''),
                                          '\S+')) AS term
      FROM t WHERE g IS NOT NULL),
    tc AS (SELECT g, term, CAST(count(*) AS BIGINT) AS c
           FROM tok GROUP BY 1, 2),
    agg AS (SELECT g,
                   CAST(count(*) AS BIGINT) AS vocab,
                   CAST(sum(c) AS BIGINT) AS n_tokens,
                   CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END)
                        AS BIGINT) AS hapax,
                   CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END)
                        AS BIGINT) AS dis
            FROM tc GROUP BY g)
    SELECT g, n_tokens, vocab, hapax, dis,
           CAST(hapax AS DOUBLE) / CAST(n_tokens AS DOUBLE)
             AS unseen_mass,
           CASE WHEN dis > 0 THEN CAST(vocab AS DOUBLE)
                  + CAST(hapax * hapax AS DOUBLE)
                    / CAST(2 * dis AS DOUBLE)
                ELSE NULL END AS chao1
    FROM agg ORDER BY g
"""


def test_vocab_coverage_duckdb_fuzz_partition_invariant():
    rng = np.random.default_rng(467)
    words = [f"w{i}" for i in range(60)]
    texts, gs = [], []
    for _ in range(500):
        gs.append(None if rng.random() < 0.03
                  else f"s{rng.integers(0, 4)}")
        if rng.random() < 0.05:
            texts.append(None)
        else:
            k = rng.integers(0, 12)
            # Zipf-ish skew so hapax/dis buckets are populated
            idx = np.minimum((rng.pareto(1.2, k) * 3).astype(int),
                             len(words) - 1)
            texts.append(" ".join(words[i] for i in idx))
    pdf = pd.DataFrame({"g": gs, "txt": texts})
    con = duckdb.connect()
    con.register("t", pdf)
    exp = con.sql(ORACLE).df().reset_index(drop=True)
    t = pa.table({"g": pa.array(gs, pa.string()),
                  "txt": pa.array(texts, pa.string())})
    prev = None
    for parts in (1, 9):
        ds = ray.data.from_arrow(t)
        if parts > 1:
            ds = ds.repartition(parts)
        got = (vocab_coverage(ds, group_col="g", text_col="txt",
                              num_partitions=5)
               .rename_columns(["g", "n_tokens", "vocab", "hapax",
                                "dis", "unseen_mass", "chao1"])
               .to_pandas().sort_values("g").reset_index(drop=True))
        pd.testing.assert_frame_equal(
            got.astype(exp.dtypes.to_dict()), exp, check_exact=True)
        if prev is not None:
            assert got.equals(prev)
        prev = got


def test_vocab_coverage_hand_checked():
    # source x: tokens a a b c -> vocab 3, hapax 2 (b, c), dis 1 (a)
    # unseen = 2/4; chao1 = 3 + 4/2 = 5
    t = pa.table({"g": ["x", "x"], "txt": ["a a b", "c"]})
    got = vocab_coverage(ray.data.from_arrow(t), group_col="g",
                         text_col="txt").to_pandas()
    r = got.iloc[0]
    assert (r["n_tokens"], r["vocab"], r["hapax"], r["dis"]) \
        == (4, 3, 2, 1)
    assert r["unseen_mass"] == 0.5
    assert r["chao1"] == 5.0
    # all-hapax source: dis = 0 -> chao1 NULL
    t2 = pa.table({"g": ["y"], "txt": ["p q r"]})
    got2 = vocab_coverage(ray.data.from_arrow(t2), group_col="g",
                          text_col="txt").to_pandas()
    assert pd.isna(got2.iloc[0]["chao1"])
    assert got2.iloc[0]["unseen_mass"] == 1.0
