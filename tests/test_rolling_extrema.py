"""rolling_extrema (stages/window.py) vs the DuckDB ROWS window."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray


def test_rolling_extrema_duckdb_fuzz_partitions():
    """rolling_extrema vs the DuckDB ROWS window at 2 partitionings,
    with NULL keys/values and a NaN planted (all must drop)."""
    from featurebox_ray.stages.window import rolling_extrema

    rng = np.random.default_rng(305)
    n = 3000
    t = pa.table({
        "k": pa.array([int(x) if x % 11 else None
                       for x in rng.integers(0, 40, n)], pa.int64()),
        "ts": pa.array(rng.integers(0, 10 ** 6, n), pa.int64()),
        "sq": pa.array(np.arange(n, dtype=np.int64)),
        "v": pa.array([None if x % 13 == 0 else
                       (float("nan") if x % 17 == 0 else float(x))
                       for x in rng.integers(0, 500, n)],
                      pa.float64()),
    })
    con = duckdb.connect()
    con.register("t", t.to_pandas())
    exp = con.sql("""
        SELECT k, sq, CAST(count(*) OVER w AS BIGINT) AS w,
               min(v) OVER w AS vmin, max(v) OVER w AS vmax
        FROM t
        WHERE k IS NOT NULL AND ts IS NOT NULL AND sq IS NOT NULL
          AND v IS NOT NULL AND isfinite(v)
        WINDOW w AS (PARTITION BY k ORDER BY ts, sq
                     ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
    """).df().sort_values(["k", "sq"]).reset_index(drop=True)
    prev = None
    for parts in (1, 6):
        ds = ray.data.from_arrow(t)
        if parts > 1:
            ds = ds.repartition(parts)
        got = (rolling_extrema(ds, key_col="k", ts_col="ts",
                               seq_col="sq", value_col="v", k=4,
                               num_partitions=parts)
               .to_pandas().sort_values(["k", "sq"])
               .reset_index(drop=True))
        pd.testing.assert_frame_equal(
            got.astype(exp.dtypes.to_dict()), exp)
        if prev is not None:
            assert got.equals(prev)
        prev = got


