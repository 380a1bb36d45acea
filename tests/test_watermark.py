"""Out-of-order watermark audit (stages/window.py:watermark_lateness)
vs a DuckDB ROWS-frame replay; hand case; partition invariance."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from featurebox_ray.stages.window import watermark_lateness

ORACLE = """
    WITH e AS (SELECT k, a, t FROM t
               WHERE k IS NOT NULL AND a IS NOT NULL
                 AND t IS NOT NULL),
    w AS (SELECT k, t,
                 max(t) OVER (PARTITION BY k ORDER BY a
                              ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND 1 PRECEDING) AS wm
          FROM e)
    SELECT k, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN wm > t THEN 1 ELSE 0 END) AS BIGINT)
               AS n_late,
           CAST(coalesce(sum(CASE WHEN wm > t THEN wm - t END), 0)
                AS BIGINT) AS sum_late_us,
           CAST(coalesce(max(CASE WHEN wm > t THEN wm - t END), 0)
                AS BIGINT) AS max_late_us,
           CAST(sum(CASE WHEN wm > t THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(count(*) AS DOUBLE) AS late_frac
    FROM w GROUP BY k ORDER BY k
"""


def test_watermark_duckdb_fuzz_partition_invariant():
    rng = np.random.default_rng(275)
    n = 3000
    k = rng.integers(0, 40, n).astype(float)
    a = rng.permutation(n).astype(float)          # arrival sequence
    t = rng.integers(0, 10_000, n).astype(float)  # event time, ties
    for arr in (k, a, t):
        arr[rng.choice(n, 20, replace=False)] = np.nan
    pdf = pd.DataFrame({"k": pd.array(k, dtype="Int64"),
                        "a": pd.array(a, dtype="Int64"),
                        "t": pd.array(t, dtype="Int64")})
    con = duckdb.connect()
    con.register("t", pdf)
    exp = con.sql(ORACLE).df().reset_index(drop=True)
    assert exp.n_late.sum() > 0
    tab = pa.Table.from_pandas(pdf, preserve_index=False)
    prev = None
    for parts in (1, 7):
        ds = ray.data.from_arrow(tab)
        if parts > 1:
            ds = ds.repartition(parts)
        got = (watermark_lateness(ds, key_col="k", ts_col="t",
                                  arrival_col="a", num_partitions=4)
               .to_pandas().sort_values("k").reset_index(drop=True))
        pd.testing.assert_frame_equal(
            got.astype(exp.dtypes.to_dict()), exp)
        if prev is not None:
            assert got.equals(prev)
        prev = got


def test_watermark_hand_case():
    # key 0 arrivals (a order): t = 10, 5, 12, 11
    #   row2: wm=10 > 5  -> late by 5
    #   row3: wm=10, t=12 on time; row4: wm=12 > 11 -> late by 1
    t = pa.table({
        "k": pa.array([0, 0, 0, 0, 1], pa.int64()),
        "a": pa.array([1, 2, 3, 4, 1], pa.int64()),
        "t": pa.array([10, 5, 12, 11, 7], pa.int64()),
    })
    got = (watermark_lateness(ray.data.from_arrow(t), key_col="k",
                              ts_col="t", arrival_col="a")
           .to_pandas().sort_values("k").reset_index(drop=True))
    assert got.n.tolist() == [4, 1]
    assert got.n_late.tolist() == [2, 0]
    assert got.sum_late_us.tolist() == [6, 0]
    assert got.max_late_us.tolist() == [5, 0]
    assert got.late_frac.tolist() == [0.5, 0.0]
