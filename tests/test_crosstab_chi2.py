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
