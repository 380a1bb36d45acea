"""Cohen's kappa (stages/regress.py:cohen_kappa) vs a DuckDB margin
replay; degenerate-chance NULL; partition invariance."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from featurebox_ray.stages.regress import cohen_kappa

ORACLE = """
    WITH f AS (SELECT g, a, b FROM t
               WHERE g IS NOT NULL AND a IS NOT NULL
                 AND b IS NOT NULL),
    c AS (SELECT g,
                 CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(CASE WHEN a = 1 AND b = 1 THEN 1 ELSE 0 END)
                      AS BIGINT) AS n11,
                 CAST(sum(CASE WHEN a = 1 AND b = 0 THEN 1 ELSE 0 END)
                      AS BIGINT) AS n10,
                 CAST(sum(CASE WHEN a = 0 AND b = 1 THEN 1 ELSE 0 END)
                      AS BIGINT) AS n01,
                 CAST(sum(CASE WHEN a = 0 AND b = 0 THEN 1 ELSE 0 END)
                      AS BIGINT) AS n00
          FROM f GROUP BY g)
    SELECT g, n, n11, n10, n01, n00,
           CAST(n * (n11 + n00)
                - ((n11 + n10) * (n11 + n01)
                   + (n00 + n01) * (n00 + n10)) AS DOUBLE)
             / CAST(NULLIF(n * n
                - ((n11 + n10) * (n11 + n01)
                   + (n00 + n01) * (n00 + n10)), 0) AS DOUBLE)
             AS kappa
    FROM c ORDER BY g
"""


def test_cohen_kappa_duckdb_fuzz_partition_invariant():
    rng = np.random.default_rng(401)
    n = 1200
    g = [None if rng.random() < 0.03 else f"s{rng.integers(0, 5)}"
         for _ in range(n)]
    # correlated raters so kappa is far from 0
    a = rng.integers(0, 2, n)
    b = np.where(rng.random(n) < 0.7, a, rng.integers(0, 2, n))
    a_l = [None if rng.random() < 0.02 else int(v) for v in a]
    b_l = [None if rng.random() < 0.02 else int(v) for v in b]
    pdf = pd.DataFrame({"g": g, "a": a_l, "b": b_l})
    con = duckdb.connect()
    con.register("t", pdf)
    exp = con.sql(ORACLE).df().reset_index(drop=True)
    t = pa.table({"g": pa.array(g, pa.string()),
                  "a": pa.array(a_l, pa.int64()),
                  "b": pa.array(b_l, pa.int64())})
    prev = None
    for parts in (1, 9):
        ds = ray.data.from_arrow(t)
        if parts > 1:
            ds = ds.repartition(parts)
        got = (cohen_kappa(ds, group_col="g", rater_a_col="a",
                           rater_b_col="b")
               .rename_columns(["g", "n", "n11", "n10", "n01",
                                "n00", "kappa"])
               .to_pandas().sort_values("g").reset_index(drop=True))
        pd.testing.assert_frame_equal(got.astype(exp.dtypes.to_dict()),
                                      exp, check_exact=True)
        if prev is not None:
            assert got.equals(prev)
        prev = got


def test_cohen_kappa_edges():
    # perfect agreement -> 1.0; BOTH raters constant -> NULL
    # (chance == 1); one constant rater -> 0; known 2x2 closed form
    t = pa.table({"g": ["p"] * 4 + ["c"] * 4 + ["z"] * 4 + ["k"] * 8,
                  "a": [1, 0, 1, 0] + [1, 1, 1, 1] + [1, 1, 1, 1]
                       + [1, 1, 1, 0, 0, 0, 1, 0],
                  "b": [1, 0, 1, 0] + [1, 1, 1, 1] + [1, 0, 1, 0]
                       + [1, 1, 0, 0, 0, 1, 1, 0]})
    got = cohen_kappa(ray.data.from_arrow(t), group_col="g",
                      rater_a_col="a", rater_b_col="b").to_pandas()
    got = got.set_index("g")
    assert got.loc["p", "kappa"] == 1.0
    assert pd.isna(got.loc["c", "kappa"])
    assert got.loc["z", "kappa"] == 0.0
    # k: n11=3 n10=1 n01=1 n00=3, n=8 -> kappa = (8*6-32)/(64-32)=0.5
    assert got.loc["k", "kappa"] == 0.5
