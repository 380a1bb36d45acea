"""latency_profile (stages/transitions.py) vs DuckDB lag +
quantile_disc, with single-event keys, ts ties, NULLs."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from featurebox_ray.stages.transitions import latency_profile


def test_latency_profile_duckdb_fuzz():
    rng = np.random.default_rng(314)
    n = 2500
    k = [None if x % 41 == 0 else int(x % 50)
         for x in rng.integers(0, 10 ** 6, n)]
    # plant single-event keys 100..104
    for i, kk in enumerate(range(100, 105)):
        k[i * 7] = kk
    t = pa.table({
        "k": pa.array(k, pa.int64()),
        "ts": pa.array([None if x % 37 == 0 else int(x % 900)
                        for x in rng.integers(0, 10 ** 6, n)],
                       pa.int64()),
        "o": pa.array(np.arange(n, dtype=np.int64)),
    })
    con = duckdb.connect()
    con.register("t", t)
    exp = con.sql("""
        WITH e AS (SELECT k, ts AS t, o FROM t
                   WHERE k IS NOT NULL AND ts IS NOT NULL
                     AND o IS NOT NULL),
        g AS (SELECT k, t - lag(t) OVER (PARTITION BY k
                                         ORDER BY t, o) AS gap
              FROM e),
        gg AS (SELECT k, gap FROM g WHERE gap IS NOT NULL),
        s AS (SELECT k, CAST(count(*) AS BIGINT) AS cnt,
                     CAST(quantile_disc(gap, CAST(0.5 AS DOUBLE))
                          AS BIGINT) AS median_gap,
                     CAST(quantile_disc(gap, CAST(0.9 AS DOUBLE))
                          AS BIGINT) AS p90_gap,
                     CAST(max(gap) AS BIGINT) AS max_gap
              FROM gg GROUP BY k),
        base AS (SELECT k FROM e GROUP BY k)
        SELECT base.k, CAST(coalesce(s.cnt, 0) AS BIGINT) AS n_gaps,
               s.median_gap, s.p90_gap, s.max_gap
        FROM base LEFT JOIN s ON base.k = s.k ORDER BY base.k
    """).df().reset_index(drop=True)
    prev = None
    for parts in (1, 6):
        ds = ray.data.from_arrow(t)
        if parts > 1:
            ds = ds.repartition(parts)
        got = (latency_profile(ds, key_col="k", ts_col="ts",
                               order_col="o", num_partitions=parts)
               .to_pandas().sort_values("k").reset_index(drop=True))
        pd.testing.assert_frame_equal(
            got.astype(exp.dtypes.to_dict()), exp)
        if prev is not None:
            assert got.equals(prev)
        prev = got
    # single-event keys carry NULL stats
    single = prev[prev["k"].isin(range(100, 105))]
    assert (single["n_gaps"] == 0).all()
    assert single["median_gap"].isna().all()


def test_paired_spans_duckdb_fuzz():
    """paired_spans vs the FULL-JOIN ranked replay: unbalanced
    start/end counts, ties, NULLs, negative durations, at 2
    partitionings."""
    from featurebox_ray.stages.transitions import paired_spans

    rng = np.random.default_rng(318)
    n = 2200
    t = pa.table({
        "k": pa.array([None if x % 37 == 0 else int(x % 40)
                       for x in rng.integers(0, 10 ** 6, n)],
                      pa.int64()),
        "ts": pa.array(rng.integers(0, 700, n), pa.int64()),
        "o": pa.array(np.arange(n, dtype=np.int64)),
        "ty": pa.array(rng.choice(["S", "E", "other"], n)),
    })
    con = duckdb.connect()
    con.register("t", t)
    exp = con.sql("""
        WITH e AS (SELECT k, ts AS t, o, ty FROM t
                   WHERE k IS NOT NULL AND ts IS NOT NULL
                     AND o IS NOT NULL AND ty IN ('S', 'E')),
        s AS (SELECT k, t, row_number() OVER (PARTITION BY k
                    ORDER BY t, o) - 1 AS r FROM e WHERE ty = 'S'),
        x AS (SELECT k, t, row_number() OVER (PARTITION BY k
                    ORDER BY t, o) - 1 AS r FROM e WHERE ty = 'E')
        SELECT coalesce(s.k, x.k) AS k,
               CAST(coalesce(s.r, x.r) AS BIGINT) AS span_idx,
               s.t AS start_ts, x.t AS end_ts,
               x.t - s.t AS duration
        FROM s FULL JOIN x ON s.k = x.k AND s.r = x.r
        ORDER BY k, span_idx
    """).df().reset_index(drop=True)
    prev = None
    for parts in (1, 6):
        ds = ray.data.from_arrow(t)
        if parts > 1:
            ds = ds.repartition(parts)
        got = (paired_spans(ds, key_col="k", ts_col="ts",
                            order_col="o", type_col="ty",
                            start_type="S", end_type="E",
                            num_partitions=parts)
               .to_pandas().sort_values(["k", "span_idx"])
               .reset_index(drop=True))
        pd.testing.assert_frame_equal(
            got.astype(exp.dtypes.to_dict()), exp)
        if prev is not None:
            assert got.equals(prev)
        prev = got
    assert (prev["duration"].dropna() < 0).any()   # audit signal live
