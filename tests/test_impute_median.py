"""impute_group_median (stages/quantile.py) vs DuckDB."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray


def test_impute_group_median_duckdb_fuzz():
    """impute_group_median vs DuckDB at 2 partitionings: NULL group
    keys, all-NULL groups, NaN passthrough (excluded from the median,
    never filled)."""
    from featurebox_ray.stages.quantile import impute_group_median

    rng = np.random.default_rng(307)
    n = 2000
    g = [None if x % 19 == 0 else f"g{x % 7}"
         for x in rng.integers(0, 400, n)]
    v = [None if x % 5 == 0 else
         (float("nan") if x % 11 == 0 else float(x))
         for x in rng.integers(0, 300, n)]
    # group g6: force all-NULL so it has no median
    v = [None if (gg == "g6") else vv for gg, vv in zip(g, v)]
    t = pa.table({"id": pa.array(np.arange(n, dtype=np.int64)),
                  "g": pa.array(g, pa.string()),
                  "v": pa.array(v, pa.float64())})
    con = duckdb.connect()
    # register the ARROW table: a pandas round-trip collapses NULL and
    # NaN into one value and the oracle would fill planted NaNs
    con.register("t", t)
    exp = con.sql("""
        WITH m AS (
          SELECT g, quantile_disc(v, CAST(0.5 AS DOUBLE)) AS med
          FROM t WHERE g IS NOT NULL AND v IS NOT NULL
            AND isfinite(v)
          GROUP BY g)
        SELECT t.id, t.g,
               CASE WHEN t.v IS NULL THEN m.med ELSE t.v END
                 AS value_filled,
               CAST(t.v IS NULL AND m.med IS NOT NULL AS BIGINT)
                 AS was_imputed
        FROM t LEFT JOIN m ON t.g = m.g
        ORDER BY id
    """).df().reset_index(drop=True)
    prev = None
    for parts in (1, 6):
        ds = ray.data.from_arrow(t)
        if parts > 1:
            ds = ds.repartition(parts)
        got = (impute_group_median(ds, group_col="g", value_col="v",
                                   id_col="id", num_partitions=parts)
               .to_pandas().sort_values("id").reset_index(drop=True))
        pd.testing.assert_frame_equal(
            got.astype(exp.dtypes.to_dict()), exp)
        if prev is not None:
            assert got.equals(prev)
        prev = got


