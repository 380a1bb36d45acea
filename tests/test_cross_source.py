"""Cross-source shared-gram matrix (stages/substr.py:
cross_source_grams) vs a DuckDB gram-string replay; planted mirrors;
partition invariance."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from featurebox_ray.stages.substr import cross_source_grams

ORACLE = r"""
    WITH tok AS (
      SELECT g, regexp_extract_all(coalesce(txt, ''), '\S+') AS t
      FROM docs WHERE g IS NOT NULL),
    gr AS (
      SELECT g, array_to_string(t[pos : pos + {km1}], ' ') AS gram
      FROM (SELECT g, t,
                   unnest(generate_series(1, len(t) - {km1}))
                     AS pos
            FROM tok WHERE len(t) >= {k})),
    d AS (SELECT DISTINCT g, gram FROM gr),
    p AS (SELECT a.g AS src_a, b.g AS src_b
          FROM d a JOIN d b
            ON a.gram = b.gram AND a.g < b.g)
    SELECT src_a, src_b, CAST(count(*) AS BIGINT) AS shared_grams
    FROM p GROUP BY 1, 2 ORDER BY 1, 2
"""


def test_cross_source_grams_duckdb_fuzz_partition_invariant():
    rng = np.random.default_rng(503)
    words = [f"w{i}" for i in range(25)]
    texts, gs = [], []
    shared = " ".join(words[i % 25] for i in range(10))
    for _ in range(250):
        gs.append(None if rng.random() < 0.03
                  else f"s{rng.integers(0, 4)}")
        body = " ".join(
            words[i] for i in rng.integers(0, 25, rng.integers(0, 9)))
        # planted syndicated boilerplate shared across sources
        texts.append(None if rng.random() < 0.05
                     else (shared + " " + body
                           if rng.random() < 0.4 else body))
    pdf = pd.DataFrame({"g": gs, "txt": texts})
    con = duckdb.connect()
    con.register("docs", pdf)
    k = 4
    exp = con.sql(ORACLE.format(k=k, km1=k - 1)).df().reset_index(
        drop=True)
    t = pa.table({"g": pa.array(gs, pa.string()),
                  "txt": pa.array(texts, pa.string())})
    prev = None
    for parts in (1, 9):
        ds = ray.data.from_arrow(t)
        if parts > 1:
            ds = ds.repartition(parts)
        got = (cross_source_grams(ds, group_col="g", text_col="txt",
                                  k=k, num_partitions=5)
               .to_pandas().sort_values(["src_a", "src_b"])
               .reset_index(drop=True))
        pd.testing.assert_frame_equal(
            got.astype(exp.dtypes.to_dict()), exp, check_exact=True)
        if prev is not None:
            assert got.equals(prev)
        prev = got


def test_cross_source_grams_hand_checked():
    # sources a and b share exactly the grams of "p q r s t" (k=4:
    # "p q r s", "q r s t" -> 2 shared); c shares nothing
    t = pa.table({
        "g": ["a", "b", "c"],
        "txt": ["p q r s t", "x p q r s t y", "u v w z z z"]})
    got = (cross_source_grams(ray.data.from_arrow(t), group_col="g",
                              text_col="txt", k=4)
           .to_pandas())
    assert got[["src_a", "src_b"]].values.tolist() == [["a", "b"]]
    assert got["shared_grams"].tolist() == [2]
