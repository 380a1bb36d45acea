"""Rolling regression slope (stages/window.py:rolling_slope) vs a
DuckDB window replay; exact-trend hand case."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from featurebox_ray.stages.window import rolling_slope

ORACLE = """
    WITH r AS (
      SELECT id, k, y,
             row_number() OVER (PARTITION BY k ORDER BY t, id) - 1
               AS j
      FROM ev WHERE k IS NOT NULL AND t IS NOT NULL
                AND y IS NOT NULL),
    s AS (
      SELECT id, count(*) OVER wk AS m, sum(y) OVER wk AS sy,
             sum(j * y) OVER wk AS sjy, min(j) OVER wk AS j0
      FROM r
      WINDOW wk AS (PARTITION BY k ORDER BY j
                    ROWS BETWEEN {km1} PRECEDING AND CURRENT ROW)),
    f AS (SELECT id, m, sy, sjy - j0 * sy AS sxy,
                 m * (m - 1) // 2 AS sx,
                 (m - 1) * m * (2 * m - 1) // 6 AS sxx
          FROM s)
    SELECT id, CASE WHEN m * sxx - sx * sx = 0 THEN NULL
               ELSE CAST(m * sxy - sx * sy AS DOUBLE)
                    / CAST(m * sxx - sx * sx AS DOUBLE) END
             AS roll_slope
    FROM f ORDER BY id
"""


def test_rolling_slope_duckdb_fuzz_partition_invariant():
    rng = np.random.default_rng(131)
    n, k = 900, 6
    pdf = pd.DataFrame({
        "id": np.arange(n),
        "k": rng.integers(0, 20, n),
        "t": rng.integers(0, 10000, n),
        "y": rng.integers(-500, 500, n),
    })
    con = duckdb.connect()
    con.register("ev", pdf)
    exp = con.sql(ORACLE.format(km1=k - 1)).df().reset_index(drop=True)
    t = pa.table({c: pa.array(pdf[c], pa.int64()) for c in pdf})
    prev = None
    for parts in (1, 6):
        ds = ray.data.from_arrow(t)
        if parts > 1:
            ds = ds.repartition(parts)
        got = (rolling_slope(ds, key_col="k", ts_col="t", id_col="id",
                             value_col="y", k=k, num_partitions=4)
               .to_pandas().sort_values("id").reset_index(drop=True))
        pd.testing.assert_frame_equal(got.astype(exp.dtypes.to_dict()),
                                      exp, check_exact=True)
        if prev is not None:
            assert got.equals(prev)
        prev = got


def test_rolling_slope_exact_trend():
    # y = 7*j + 3: slope must be exactly 7 everywhere after row 0
    n = 20
    t = pa.table({"id": pa.array(range(n), pa.int64()),
                  "k": pa.array([1] * n, pa.int64()),
                  "t": pa.array(range(n), pa.int64()),
                  "y": pa.array([7 * j + 3 for j in range(n)],
                                pa.int64())})
    got = (rolling_slope(ray.data.from_arrow(t), key_col="k",
                         ts_col="t", id_col="id", value_col="y", k=5,
                         num_partitions=2)
           .to_pandas().sort_values("id"))
    assert pd.isna(got.roll_slope.iloc[0])      # single-row window
    assert (got.roll_slope.iloc[1:] == 7.0).all()
