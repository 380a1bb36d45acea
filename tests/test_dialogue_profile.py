"""dialogue_profile (stages/transitions.py) vs SQL islands."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray


def test_dialogue_profile_duckdb_fuzz():
    """dialogue_profile vs the SQL islands replay at 2 partitionings,
    with NULLs in every column and single-event keys."""
    from featurebox_ray.stages.transitions import dialogue_profile

    rng = np.random.default_rng(308)
    n = 2500
    t = pa.table({
        "k": pa.array([None if x % 23 == 0 else int(x % 60)
                       for x in rng.integers(0, 10 ** 6, n)],
                      pa.int64()),
        "ts": pa.array(rng.integers(0, 10 ** 5, n), pa.int64()),
        "o": pa.array(np.arange(n, dtype=np.int64)),
        "ty": pa.array([None if x % 29 == 0 else f"t{x % 5}"
                        for x in rng.integers(0, 10 ** 6, n)],
                       pa.string()),
    })
    con = duckdb.connect()
    con.register("t", t)
    exp = con.sql("""
        WITH e AS (
          SELECT k, ty, ts, o FROM t
          WHERE k IS NOT NULL AND ty IS NOT NULL
            AND ts IS NOT NULL AND o IS NOT NULL),
        r AS (
          SELECT k, ty,
                 row_number() OVER (PARTITION BY k ORDER BY ts, o)
               - row_number() OVER (PARTITION BY k, ty
                                    ORDER BY ts, o) AS isl
          FROM e),
        runs AS (SELECT k, count(*) AS run_len
                 FROM r GROUP BY k, ty, isl),
        a1 AS (SELECT k, CAST(count(*) AS BIGINT) AS n_runs,
                      CAST(max(run_len) AS BIGINT) AS max_run
               FROM runs GROUP BY k),
        a2 AS (SELECT k, CAST(count(*) AS BIGINT) AS n_turns,
                      CAST(count(DISTINCT ty) AS BIGINT) AS n_types
               FROM e GROUP BY k)
        SELECT a2.k, n_turns, n_runs, max_run, n_types
        FROM a2 JOIN a1 USING (k) ORDER BY k
    """).df().reset_index(drop=True)
    prev = None
    for parts in (1, 6):
        ds = ray.data.from_arrow(t)
        if parts > 1:
            ds = ds.repartition(parts)
        got = (dialogue_profile(ds, key_col="k", ts_col="ts",
                                order_col="o", type_col="ty",
                                num_partitions=parts)
               .to_pandas().sort_values("k").reset_index(drop=True))
        pd.testing.assert_frame_equal(
            got.astype(exp.dtypes.to_dict()), exp)
        if prev is not None:
            assert got.equals(prev)
        prev = got


