"""Quota allocation (stages/sample.py:quota_allocate) vs a DuckDB
largest-remainder replay; exact-sum property; partition invariance."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from featurebox_ray.stages.sample import quota_allocate

ORACLE = """
    WITH c AS (SELECT g, CAST(count(*) AS BIGINT) AS n FROM t
               WHERE g IS NOT NULL GROUP BY g),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn FROM c),
    b AS (SELECT g, n, n * {T} // tot.nn AS base,
                 n * {T} % tot.nn AS rem
          FROM c, tot),
    l AS (SELECT CAST({T} - sum(base) OVER () AS BIGINT)
                   AS leftover,
                 row_number() OVER (ORDER BY rem DESC, g) AS rk,
                 g, n, base
          FROM b)
    SELECT g, n AS n_rows, CAST(base AS BIGINT) AS base,
           CAST(CASE WHEN rk <= leftover THEN 1 ELSE 0 END
                AS BIGINT) AS extra,
           CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END
                AS BIGINT) AS quota
    FROM l ORDER BY g
"""


def test_quota_duckdb_fuzz_partition_invariant():
    rng = np.random.default_rng(547)
    n = 3000
    g = [None if rng.random() < 0.02
         else f"g{rng.integers(0, 9)}" for _ in range(n)]
    pdf = pd.DataFrame({"g": g})
    con = duckdb.connect()
    con.register("t", pdf)
    T = 1000
    exp = con.sql(ORACLE.format(T=T)).df().reset_index(drop=True)
    t = pa.table({"g": pa.array(g, pa.string())})
    prev = None
    for parts in (1, 8):
        ds = ray.data.from_arrow(t)
        if parts > 1:
            ds = ds.repartition(parts)
        got = (quota_allocate(ds, group_col="g", total=T)
               .rename_columns(["g", "n_rows", "base", "extra",
                                "quota"])
               .to_pandas().sort_values("g").reset_index(drop=True))
        pd.testing.assert_frame_equal(
            got.astype(exp.dtypes.to_dict()), exp, check_exact=True)
        assert got["quota"].sum() == T
        if prev is not None:
            assert got.equals(prev)
        prev = got


def test_quota_hand_checked():
    # counts 5, 3, 2 and total 7: shares 3.5, 2.1, 1.4 -> bases
    # 3, 2, 1 (sum 6); largest remainder 0.5 -> group a gets +1
    t = pa.table({"g": ["a"] * 5 + ["b"] * 3 + ["c"] * 2})
    got = (quota_allocate(ray.data.from_arrow(t), group_col="g",
                          total=7).to_pandas().set_index("g"))
    assert got["quota"].to_dict() == {"a": 4, "b": 2, "c": 1}
    # min_per_group lifts after the Hamilton pass
    got2 = (quota_allocate(ray.data.from_arrow(t), group_col="g",
                           total=7, min_per_group=2)
            .to_pandas().set_index("g"))
    assert got2["quota"].to_dict() == {"a": 4, "b": 2, "c": 2}
