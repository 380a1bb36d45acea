"""Rational-PMI collocations (stages/tfidf.py:collocation_pmi) vs a
DuckDB replay at several partitionings."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray

from featurebox_ray.stages.tfidf import collocation_pmi

ORACLE = r"""
    WITH tok AS (
      SELECT regexp_extract_all(coalesce(text, ''), '\S+') AS t
      FROM docs
    ), uni AS (
      SELECT w, CAST(count(*) AS BIGINT) AS c
      FROM (SELECT unnest(t) AS w FROM tok) GROUP BY w
    ), big AS (
      SELECT t[i] AS w1, t[i + 1] AS w2
      FROM (SELECT t, unnest(generate_series(1, len(t) - 1)) AS i
            FROM tok WHERE len(t) >= 2)
    ), bic AS (
      SELECT w1, w2, CAST(count(*) AS BIGINT) AS c_xy
      FROM big GROUP BY w1, w2
    ), tot AS (SELECT CAST(sum(c_xy) AS BIGINT) AS n FROM bic)
    SELECT b.w1, b.w2, b.c_xy, u1.c AS c_x, u2.c AS c_y,
           CAST(b.c_xy * t.n AS DOUBLE)
             / CAST(u1.c * u2.c AS DOUBLE) AS pmi_score
    FROM bic b CROSS JOIN tot t
    JOIN uni u1 ON b.w1 = u1.w JOIN uni u2 ON b.w2 = u2.w
    WHERE b.c_xy >= {mc}
    ORDER BY pmi_score DESC, b.w1, b.w2
    LIMIT {k}
"""


def test_pmi_duckdb_fuzz_partition_invariant():
    rng = np.random.default_rng(73)
    vocab = list("abcdefghij") + ["foo", "bar"]
    docs = []
    for i in range(200):
        if rng.random() < 0.05:
            docs.append(None)
            continue
        n = int(rng.integers(0, 15))
        words = list(rng.choice(vocab, n))
        # plant a strong collocation
        if rng.random() < 0.3:
            words += ["foo", "bar"]
        docs.append(" ".join(words))
    pdf = pd.DataFrame({"doc_id": range(len(docs)), "text": docs})
    con = duckdb.connect()
    con.register("docs", pdf)
    exp = con.sql(ORACLE.format(mc=3, k=15)).df().reset_index(drop=True)
    t = pa.table({"doc_id": pa.array(pdf.doc_id, pa.int64()),
                  "text": pa.array(docs, pa.string())})
    prev = None
    for parts in (1, 4, 9):
        ds = ray.data.from_arrow(t)
        if parts > 1:
            ds = ds.repartition(parts)
        got = (collocation_pmi(ds, min_count=3, k=15, num_partitions=5)
               .to_pandas().reset_index(drop=True))
        pd.testing.assert_frame_equal(got.astype(exp.dtypes.to_dict()),
                                      exp)
        # planted collocation should rank with the best
        assert ((got.w1 == "foo") & (got.w2 == "bar")).any()
        if prev is not None:
            assert got.equals(prev)
        prev = got


def test_pmi_empty_and_guard():
    t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "text": pa.array(["solo", None], pa.string())})
    out = collocation_pmi(ray.data.from_arrow(t), min_count=1, k=5)
    assert out.count() == 0
    with pytest.raises(ValueError):
        collocation_pmi(ray.data.from_arrow(t), min_count=0)
