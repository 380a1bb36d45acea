"""Mann-Whitney U (stages/regress.py:mann_whitney) vs a DuckDB
rank-window replay and scipy-free closed forms; partition
invariance."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from featurebox_ray.stages.regress import mann_whitney

ORACLE = """
    WITH e AS (SELECT g, a,
                      CAST(round(coalesce(v, 0) * 100) AS BIGINT)
                        AS y
               FROM t WHERE g IS NOT NULL AND a IS NOT NULL
                 AND v IS NOT NULL),
    r AS (SELECT g, a, y,
                 rank() OVER (PARTITION BY g ORDER BY y) AS rk,
                 count(*) OVER (PARTITION BY g, y) AS tcnt
          FROM e),
    tg AS (SELECT g, CAST(sum(c * c * c - c) AS HUGEINT) AS tt
           FROM (SELECT g, y, CAST(count(*) AS HUGEINT) AS c
                 FROM e GROUP BY g, y) GROUP BY g),
    s AS (SELECT g,
                 CAST(count(*) AS HUGEINT) AS n,
                 CAST(sum(a) AS HUGEINT) AS n1,
                 CAST(sum(CASE WHEN a = 1
                          THEN 2 * rk + tcnt - 1 ELSE 0 END)
                      AS HUGEINT) AS two_r1
          FROM r GROUP BY g)
    SELECT s.g,
           CAST(s.n1 AS BIGINT) AS n1,
           CAST(s.n - s.n1 AS BIGINT) AS n2,
           CAST(s.two_r1 - s.n1 * (s.n1 + 1) AS BIGINT) AS u2,
           CASE WHEN s.n1 = 0 OR s.n = s.n1 OR s.n < 2
                  OR s.n1 * (s.n - s.n1)
                     * (s.n * s.n * s.n - s.n - tg.tt) = 0
                THEN NULL
                ELSE CAST(s.two_r1 - s.n1 * (s.n1 + 1)
                          - s.n1 * (s.n - s.n1) AS DOUBLE)
                     / sqrt(CAST(s.n1 * (s.n - s.n1)
                            * (s.n * s.n * s.n - s.n - tg.tt)
                            AS DOUBLE)
                            / CAST(3 * s.n * (s.n - 1) AS DOUBLE))
           END AS z
    FROM s JOIN tg ON s.g = tg.g ORDER BY s.g
"""


def test_mann_whitney_duckdb_fuzz_partition_invariant():
    rng = np.random.default_rng(487)
    n = 2000
    gs = [None if rng.random() < 0.02
          else f"g{rng.integers(0, 6)}" for _ in range(n)]
    a = [None if rng.random() < 0.02 else int(rng.integers(0, 2))
         for _ in range(n)]
    # shifted treatment + heavy ties (coarse grid)
    v = [None if rng.random() < 0.03
         else round(float(rng.integers(0, 30)) / 4
                    + (0.5 if x == 1 else 0.0), 2)
         for x in a]
    pdf = pd.DataFrame({"g": gs, "a": a, "v": v})
    con = duckdb.connect()
    con.register("t", pdf)
    exp = con.sql(ORACLE).df().reset_index(drop=True)
    t = pa.table({"g": pa.array(gs, pa.string()),
                  "a": pa.array(a, pa.int64()),
                  "v": pa.array(v, pa.float64())})
    prev = None
    for parts in (1, 9):
        ds = ray.data.from_arrow(t)
        if parts > 1:
            ds = ds.repartition(parts)
        got = (mann_whitney(ds, group_col="g", side_col="a",
                            value_col="v", num_partitions=4)
               .to_pandas().sort_values("g").reset_index(drop=True))
        pd.testing.assert_frame_equal(
            got.astype(exp.dtypes.to_dict()), exp, check_exact=True)
        if prev is not None:
            assert got.equals(prev)
        prev = got


def test_mann_whitney_hand_checked():
    # A = {3, 4}, B = {1, 2}: every A beats every B -> U1 = 4,
    # u2 = 8; no ties, n=4 -> var = 4*60/36 ... z = (8-4)/sqrt(
    # 4*60/12) ... checked against the closed form below
    t = pa.table({"g": ["x"] * 4, "a": [1, 1, 0, 0],
                  "v": [3.0, 4.0, 1.0, 2.0]})
    got = mann_whitney(ray.data.from_arrow(t), group_col="g",
                       side_col="a", value_col="v").to_pandas()
    r = got.iloc[0]
    assert (r["n1"], r["n2"], r["u2"]) == (2, 2, 8)
    num = 2 * 2 * (64 - 4 - 0)
    den = 3 * 4 * 3
    z = float(8 - 4) / float(np.sqrt(float(num) / float(den)))
    assert r["z"] == z
    # degenerate: all values tied -> z NULL
    t2 = pa.table({"g": ["y"] * 4, "a": [1, 1, 0, 0],
                   "v": [2.0] * 4})
    got2 = mann_whitney(ray.data.from_arrow(t2), group_col="g",
                        side_col="a", value_col="v").to_pandas()
    assert pd.isna(got2.iloc[0]["z"])
    # u2 with full ties: two_r1 = sum over A of (2*1 + 4 - 1) = 10,
    # u2 = 10 - 6 = 4 = n1*n2 (no shift)
    assert got2.iloc[0]["u2"] == 4
