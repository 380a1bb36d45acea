"""Chi-square cross-tab (stages/regress.py:crosstab_chi2) vs a DuckDB
window-margin replay; independence sanity."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from featurebox_ray.stages.regress import crosstab_chi2

ORACLE = """
    WITH o AS (SELECT r, c, CAST(count(*) AS BIGINT) AS o FROM t
               WHERE r IS NOT NULL AND c IS NOT NULL GROUP BY 1, 2),
    m AS (SELECT r, c, o,
                 sum(o) OVER (PARTITION BY r) AS rt,
                 sum(o) OVER (PARTITION BY c) AS ct,
                 sum(o) OVER () AS n
          FROM o)
    SELECT r, c, o AS observed,
           CAST(rt * ct AS DOUBLE) / CAST(n AS DOUBLE) AS expected,
           CAST((o * n - rt * ct) * (o * n - rt * ct) AS DOUBLE)
             / CAST(n * rt * ct AS DOUBLE) AS contrib
    FROM m ORDER BY r, c
"""


def test_crosstab_chi2_duckdb_fuzz_partition_invariant():
    rng = np.random.default_rng(113)
    n = 800
    r = [None if rng.random() < 0.03 else f"r{rng.integers(0, 6)}"
         for _ in range(n)]
    c = [None if rng.random() < 0.03 else f"c{rng.integers(0, 5)}"
         for _ in range(n)]
    pdf = pd.DataFrame({"r": r, "c": c})
    con = duckdb.connect()
    con.register("t", pdf)
    exp = con.sql(ORACLE).df().reset_index(drop=True)
    t = pa.table({"r": pa.array(r, pa.string()),
                  "c": pa.array(c, pa.string())})
    prev = None
    for parts in (1, 7):
        ds = ray.data.from_arrow(t)
        if parts > 1:
            ds = ds.repartition(parts)
        got = (crosstab_chi2(ds, row_col="r", col_col="c")
               .to_pandas().sort_values(["r", "c"])
               .reset_index(drop=True))
        pd.testing.assert_frame_equal(got.astype(exp.dtypes.to_dict()),
                                      exp, check_exact=True)
        if prev is not None:
            assert got.equals(prev)
        prev = got


def test_crosstab_chi2_independent_uniform():
    # perfectly balanced table: observed == expected, contrib == 0
    rows, cols = [], []
    for rv in ("a", "b"):
        for cv in ("x", "y"):
            rows += [rv] * 10
            cols += [cv] * 10
    t = pa.table({"r": pa.array(rows, pa.string()),
                  "c": pa.array(cols, pa.string())})
    got = crosstab_chi2(ray.data.from_arrow(t), row_col="r",
                        col_col="c").to_pandas()
    assert (got.observed == 10).all()
    assert (got.expected == 10.0).all()
    assert (got.contrib == 0.0).all()


WILSON_ORACLE = """
    WITH s AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
                      CAST(sum(y) AS BIGINT) AS k
               FROM t WHERE g IS NOT NULL AND y IS NOT NULL
               GROUP BY g),
    f AS (SELECT *, CAST(k AS DOUBLE) / CAST(n AS DOUBLE) AS phat,
                 1.96 * 1.96 AS z2, CAST(n AS DOUBLE) AS nf
          FROM s)
    SELECT g, n, k, phat AS rate,
           (phat + z2 / (2.0 * nf)
            - 1.96 * sqrt((phat * (1.0 - phat) + z2 / (4.0 * nf))
                          / nf)) / (1.0 + z2 / nf) AS wilson_lb
    FROM f ORDER BY g
"""


def test_wilson_rates_duckdb_fuzz_partition_invariant():
    from featurebox_ray.stages.regress import wilson_rates

    rng = np.random.default_rng(179)
    n = 800
    g = [None if rng.random() < 0.03 else f"g{rng.integers(0, 9)}"
         for _ in range(n)]
    y = rng.integers(0, 2, n).astype(object)
    for i in rng.choice(n, 10, replace=False):
        y[i] = None
    pdf = pd.DataFrame({"g": g, "y": pd.array(list(y),
                                              dtype="Int64")})
    con = duckdb.connect()
    con.register("t", pdf)
    exp = con.sql(WILSON_ORACLE).df().reset_index(drop=True)
    t = pa.table({"g": pa.array(g, pa.string()),
                  "y": pa.array(pd.array(list(y), dtype="Int64"))})
    prev = None
    for parts in (1, 6):
        ds = ray.data.from_arrow(t)
        if parts > 1:
            ds = ds.repartition(parts)
        got = (wilson_rates(ds, key_col="g", success_col="y",
                            num_partitions=4)
               .to_pandas().sort_values("g").reset_index(drop=True))
        pd.testing.assert_frame_equal(got.astype(exp.dtypes.to_dict()),
                                      exp, check_exact=True)
        if prev is not None:
            assert got.equals(prev)
        prev = got
    # the lower bound is always below the raw rate, and in [0, 1)
    assert (got.wilson_lb <= got.rate).all()
    assert (got.wilson_lb >= 0).all()


def test_wilson_small_sample_penalty():
    from featurebox_ray.stages.regress import wilson_rates

    # 2/2 successes vs 90/100: raw rate favors the tiny key, the
    # Wilson bound must favor the well-measured one
    g = ["tiny"] * 2 + ["big"] * 100
    y = [1, 1] + [1] * 90 + [0] * 10
    t = pa.table({"g": pa.array(g, pa.string()),
                  "y": pa.array(y, pa.int64())})
    got = (wilson_rates(ray.data.from_arrow(t), key_col="g",
                        success_col="y").to_pandas()
           .set_index("g"))
    assert got.loc["tiny", "rate"] > got.loc["big", "rate"]
    assert got.loc["tiny", "wilson_lb"] < got.loc["big", "wilson_lb"]
