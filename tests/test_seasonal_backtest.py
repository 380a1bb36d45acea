"""Seasonal-naive backtest (stages/seasonal.py:
seasonal_naive_backtest) vs a DuckDB grid replay; perfectly-weekly
hand case; partition invariance."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from featurebox_ray.stages.seasonal import seasonal_naive_backtest

US_DAY = 86_400_000_000

ORACLE = """
    WITH e AS (SELECT k, t // 86400000000 AS d FROM tab
               WHERE k IS NOT NULL AND t IS NOT NULL),
    c AS (SELECT k, d, CAST(count(*) AS BIGINT) AS n
          FROM e GROUP BY k, d),
    r AS (SELECT min(d) AS lo, max(d) AS hi FROM e),
    days AS (SELECT unnest(range(lo + 7, hi + 1)) AS d FROM r),
    u AS (SELECT DISTINCT k FROM e),
    g AS (SELECT u.k, days.d FROM u, days),
    j AS (SELECT g.k, g.d, coalesce(a.n, 0) AS act,
                 coalesce(p.n, 0) AS pred
          FROM g LEFT JOIN c a ON a.k = g.k AND a.d = g.d
                 LEFT JOIN c p ON p.k = g.k AND p.d = g.d - 7)
    SELECT k, CAST(count(*) AS BIGINT) AS n_days,
           CAST(sum(abs(act - pred)) AS BIGINT) AS sae,
           CAST(sum(abs(act - pred)) AS DOUBLE)
             / CAST(count(*) AS DOUBLE) AS mae
    FROM j GROUP BY k ORDER BY k
"""


def test_backtest_duckdb_fuzz_partition_invariant():
    rng = np.random.default_rng(296)
    rows = []
    for u in range(25):
        for d in range(30):
            for _ in range(int(rng.integers(0, 4))):
                rows.append((u, (d * 86400 + int(rng.integers(
                    0, 86400))) * 1_000_000))
    k = [r[0] for r in rows] + [None]
    t = [r[1] for r in rows] + [123]
    pdf = pd.DataFrame({"k": pd.array(k, dtype="Int64"),
                        "t": pd.array(t, dtype="Int64")})
    con = duckdb.connect()
    con.register("tab", pdf)
    exp = con.sql(ORACLE).df().reset_index(drop=True)
    assert (exp.sae > 0).any()
    tab = pa.Table.from_pandas(pdf, preserve_index=False)
    prev = None
    for parts in (1, 6):
        ds = ray.data.from_arrow(tab)
        if parts > 1:
            ds = ds.repartition(parts)
        got = (seasonal_naive_backtest(ds, key_col="k", ts_col="t",
                                       period_days=7,
                                       num_partitions=4)
               .to_pandas().sort_values("k").reset_index(drop=True))
        pd.testing.assert_frame_equal(
            got.astype(exp.dtypes.to_dict()), exp)
        if prev is not None:
            assert got.equals(prev)
        prev = got


def test_backtest_perfect_week_is_zero():
    # key 0: one event every day for 21 days -> weekly predictor is
    # perfect; key 1: a burst in the last week only -> errors
    rows = []
    for d in range(21):
        rows.append((0, d * US_DAY + 5))
    rows.append((1, 20 * US_DAY + 9))
    t = pa.table({"k": pa.array([r[0] for r in rows], pa.int64()),
                  "t": pa.array([r[1] for r in rows], pa.int64())})
    got = (seasonal_naive_backtest(ray.data.from_arrow(t),
                                   key_col="k", ts_col="t")
           .to_pandas().sort_values("k").reset_index(drop=True))
    assert got.n_days.tolist() == [14, 14]
    assert got.sae.tolist() == [0, 1]
    assert got.mae.tolist() == [0.0, 1.0 / 14.0]
