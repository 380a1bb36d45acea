"""Stratified fixed-size sample (stages/sample.py:quota_sample) vs a
DuckDB quota+rank replay; exact-total property; partition
invariance."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from featurebox_ray.stages.sample import quota_sample

ORACLE = """
    WITH e AS (SELECT g, k FROM t
               WHERE g IS NOT NULL AND k IS NOT NULL),
    c AS (SELECT g, CAST(count(*) AS BIGINT) AS n FROM e
          GROUP BY g),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn FROM c),
    b AS (SELECT g, n, n * {T} // tot.nn AS base,
                 n * {T} % tot.nn AS rem
          FROM c, tot),
    l AS (SELECT CAST({T} - sum(base) OVER () AS BIGINT)
                   AS leftover,
                 row_number() OVER (ORDER BY rem DESC, g) AS rk,
                 g, base
          FROM b),
    q AS (SELECT g, base + CASE WHEN rk <= leftover THEN 1 ELSE 0
                           END AS quota FROM l),
    h AS (SELECT g, k,
                 ((CAST(k AS HUGEINT) % 4294967296) * 2654435761)
                   % 4294967296 AS hv
          FROM e),
    r AS (SELECT g, k,
                 row_number() OVER (PARTITION BY g
                                    ORDER BY hv, k) AS rn
          FROM h)
    SELECT r.g, r.k FROM r JOIN q USING (g)
    WHERE r.rn <= q.quota ORDER BY g, k
"""


def test_quota_sample_duckdb_fuzz_partition_invariant():
    rng = np.random.default_rng(577)
    n = 2500
    g = [None if rng.random() < 0.02
         else f"g{rng.integers(0, 6)}" for _ in range(n)]
    k = rng.permutation(n * 3)[:n]
    t = pa.table({"g": pa.array(g, pa.string()),
                  "k": pa.array(k, pa.int64())})
    con = duckdb.connect()
    con.register("t", t)
    T = 500
    exp = con.sql(ORACLE.format(T=T)).df().reset_index(drop=True)
    prev = None
    for parts in (1, 9):
        ds = ray.data.from_arrow(t)
        if parts > 1:
            ds = ds.repartition(parts)
        got = (quota_sample(ds, group_col="g", key_col="k",
                            total=T, num_partitions=4)
               .to_pandas().sort_values(["g", "k"])
               .reset_index(drop=True))
        pd.testing.assert_frame_equal(
            got.astype(exp.dtypes.to_dict()), exp, check_exact=True)
        assert len(got) == T
        if prev is not None:
            assert got.equals(prev)
        prev = got


def test_quota_sample_underfilled_group():
    # group b has 2 rows but earns quota 5 of 10 -> under-fills
    t = pa.table({"g": ["a"] * 8 + ["b"] * 2,
                  "k": pa.array(range(10), pa.int64())})
    got = quota_sample(ray.data.from_arrow(t), group_col="g",
                       key_col="k", total=10).to_pandas()
    counts = got.groupby("g").size().to_dict()
    assert counts == {"a": 8, "b": 2}
