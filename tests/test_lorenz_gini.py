"""Per-group Lorenz Gini (stages/profile.py:group_lorenz_gini) vs a DuckDB window
replay; closed-form hand cases; partition invariance."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray

from featurebox_ray.stages.profile import group_lorenz_gini

ORACLE = """
    WITH d AS (SELECT g, x FROM t
               WHERE g IS NOT NULL AND x IS NOT NULL),
    r AS (SELECT g, x, row_number() OVER (
            PARTITION BY g ORDER BY x) AS i,
          count(*) OVER (PARTITION BY g) AS n FROM d)
    SELECT g, CAST(any_value(n) AS BIGINT) AS n,
           CAST(sum(x) AS BIGINT) AS sum_x,
           CASE WHEN sum(x) = 0 THEN NULL ELSE
             CAST(sum((2 * i - n - 1) * x) AS DOUBLE)
               / (CAST(any_value(n) AS DOUBLE)
                  * CAST(sum(x) AS DOUBLE)) END AS gini
    FROM r GROUP BY g ORDER BY g
"""


def test_gini_duckdb_fuzz_partition_invariant():
    rng = np.random.default_rng(290)
    n = 3000
    g = rng.integers(0, 8, n).astype(float)
    x = rng.integers(0, 1000, n).astype(float)
    x[g == 7] = 0                       # all-zero group -> NULL gini
    g[rng.choice(n, 15, replace=False)] = np.nan
    x[rng.choice(n, 15, replace=False)] = np.nan
    pdf = pd.DataFrame({"g": pd.array(g, dtype="Int64"),
                        "x": pd.array(x, dtype="Int64")})
    con = duckdb.connect()
    con.register("t", pdf)
    exp = con.sql(ORACLE).df().reset_index(drop=True)
    assert exp.loc[exp.g == 7, "gini"].isna().all()
    t = pa.Table.from_pandas(pdf, preserve_index=False)
    prev = None
    for parts in (1, 6):
        ds = ray.data.from_arrow(t)
        if parts > 1:
            ds = ds.repartition(parts)
        got = (group_lorenz_gini(ds, group_col="g", value_col="x",
                          num_partitions=4)
               .to_pandas().sort_values("g").reset_index(drop=True))
        pd.testing.assert_frame_equal(
            got.astype(exp.dtypes.to_dict()), exp)
        if prev is not None:
            assert got.equals(prev)
        prev = got


def test_gini_hand_cases():
    # equal values -> 0; one row holds everything (n=4) -> (n-1)/n
    t = pa.table({
        "g": pa.array([0, 0, 0, 0, 1, 1, 1, 1], pa.int64()),
        "x": pa.array([5, 5, 5, 5, 0, 0, 0, 8], pa.int64()),
    })
    got = (group_lorenz_gini(ray.data.from_arrow(t), group_col="g",
                      value_col="x").to_pandas()
           .sort_values("g").reset_index(drop=True))
    assert got.gini.tolist() == [0.0, 0.75]


def test_gini_negative_raises():
    t = pa.table({"g": pa.array([0], pa.int64()),
                  "x": pa.array([-1], pa.int64())})
    with pytest.raises(Exception):
        group_lorenz_gini(ray.data.from_arrow(t), group_col="g",
                   value_col="x").to_pandas()
