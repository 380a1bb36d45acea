"""delta_contributors (stages/diff.py) vs the SQL midpoint-cut
replay."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray


def test_delta_contributors_duckdb_fuzz():
    """delta_contributors vs the SQL midpoint-cut replay at 2
    partitionings, with NULL ts/dim/value rows; also the
    zero-total-delta edge (all shares NULL)."""
    from featurebox_ray.stages.diff import delta_contributors

    rng = np.random.default_rng(309)
    n = 3000
    t = pa.table({
        "ts": pa.array([None if x % 31 == 0 else int(x)
                        for x in rng.integers(1, 10 ** 6, n)],
                       pa.int64()),
        "d": pa.array([None if x % 17 == 0 else f"d{x % 6}"
                       for x in rng.integers(0, 10 ** 6, n)],
                      pa.string()),
        "v": pa.array([None if x % 13 == 0 else float(x) / 4
                       for x in rng.integers(-200, 200, n)],
                      pa.float64()),
    })
    con = duckdb.connect()
    con.register("t", t)
    exp = con.sql("""
        WITH e AS (
          SELECT ts AS t, d,
                 CAST(round(coalesce(v, 0) * 100) AS BIGINT) AS c
          FROM t WHERE ts IS NOT NULL AND d IS NOT NULL),
        s AS (SELECT min(t) + (max(t) - min(t)) * 1 // 2 AS cut
              FROM e),
        g AS (SELECT d,
                     CAST(coalesce(sum(CASE WHEN t <= s.cut THEN c
                                        END), 0) AS BIGINT)
                       AS cents_before,
                     CAST(coalesce(sum(CASE WHEN t > s.cut THEN c
                                        END), 0) AS BIGINT)
                       AS cents_after
              FROM e, s GROUP BY d),
        tot AS (SELECT sum(cents_after - cents_before) AS td FROM g)
        SELECT d, cents_before, cents_after,
               cents_after - cents_before AS delta,
               CASE WHEN tot.td = 0 THEN NULL
                    ELSE CAST(cents_after - cents_before AS DOUBLE)
                         / CAST(tot.td AS DOUBLE) END AS share
        FROM g, tot ORDER BY d
    """).df().reset_index(drop=True)
    prev = None
    for parts in (1, 6):
        ds = ray.data.from_arrow(t)
        if parts > 1:
            ds = ds.repartition(parts)
        got = (delta_contributors(ds, ts_col="ts", dim_col="d",
                                  value_col="v")
               .to_pandas().sort_values("d").reset_index(drop=True))
        pd.testing.assert_frame_equal(
            got.astype(exp.dtypes.to_dict()), exp)
        if prev is not None:
            assert got.equals(prev)
        prev = got
    # zero-total-delta edge: symmetric values cancel
    t2 = pa.table({"ts": pa.array([0, 10], pa.int64()),
                   "d": pa.array(["a", "a"]),
                   "v": pa.array([2.0, 2.0])})
    got2 = delta_contributors(ray.data.from_arrow(t2), ts_col="ts",
                              dim_col="d", value_col="v").to_pandas()
    assert got2["delta"].tolist() == [0]
    assert got2["share"].isna().all()


