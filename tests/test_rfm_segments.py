"""RFM segmentation (pipelines/events_features.py:rfm_segments) vs a
DuckDB NTILE replay."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from featurebox_ray.pipelines.events_features import rfm_segments

ORACLE = """
    WITH e AS (SELECT u, t,
                      CAST(round(coalesce(v, 0) * 100) AS BIGINT)
                        AS cents
               FROM ev WHERE u IS NOT NULL AND t IS NOT NULL),
    us AS (SELECT u, max(t) AS last, CAST(count(*) AS BIGINT)
               AS n_events,
                  CAST(sum(cents) AS BIGINT) AS cents
           FROM e GROUP BY u),
    m AS (SELECT max(last) AS mx FROM us),
    f AS (SELECT u, mx - last AS r_us, n_events, cents FROM us, m),
    t AS (SELECT *,
            CAST(ntile(4) OVER (ORDER BY r_us, u) AS BIGINT)
              AS r_tile,
            CAST(ntile(4) OVER (ORDER BY n_events DESC, u) AS BIGINT)
              AS f_tile,
            CAST(ntile(4) OVER (ORDER BY cents DESC, u) AS BIGINT)
              AS m_tile
          FROM f)
    SELECT u, r_us, n_events, cents, r_tile, f_tile, m_tile,
           100 * r_tile + 10 * f_tile + m_tile AS segment
    FROM t ORDER BY u
"""


def test_rfm_duckdb_fuzz_partition_invariant():
    rng = np.random.default_rng(197)
    n = 1100
    pdf = pd.DataFrame({
        "u": rng.integers(0, 37, n).astype(float),
        "t": rng.integers(0, 10**6, n).astype(float),
        "v": np.round(rng.uniform(0, 50, n), 2),
    })
    pdf.loc[rng.choice(n, 8, replace=False), "u"] = np.nan
    pdf.loc[rng.choice(n, 8, replace=False), "t"] = np.nan
    pdf.loc[rng.choice(n, 8, replace=False), "v"] = np.nan
    con = duckdb.connect()
    con.register("ev", pdf.astype({"u": "Int64", "t": "Int64"}))
    exp = con.sql(ORACLE).df().reset_index(drop=True)
    t = pa.table({"u": pa.array(pd.array(pdf.u, dtype="Int64")),
                  "t": pa.array(pd.array(pdf.t, dtype="Int64")),
                  "v": pa.array(pdf.v, pa.float64(),
                                from_pandas=True)})
    prev = None
    for parts in (1, 6):
        ds = ray.data.from_arrow(t)
        if parts > 1:
            ds = ds.repartition(parts)
        got = (rfm_segments(ds, user_col="u", ts_col="t",
                            value_col="v", n_tiles=4,
                            num_partitions=4)
               .to_pandas().sort_values("u").reset_index(drop=True))
        pd.testing.assert_frame_equal(got.astype(exp.dtypes.to_dict()),
                                      exp, check_exact=True)
        if prev is not None:
            assert got.equals(prev)
        prev = got
    # tiles are 1..4 and roughly balanced (ANSI sizing: diff <= 1)
    for c in ("r_tile", "f_tile", "m_tile"):
        sizes = got[c].value_counts()
        assert sizes.max() - sizes.min() <= 1


COHORT_ORACLE = """
    WITH e AS (SELECT u, t // {w} AS per,
                      CAST(round(coalesce(v, 0) * 100) AS BIGINT)
                        AS cents
               FROM ev WHERE u IS NOT NULL AND t IS NOT NULL),
    c AS (SELECT u, min(per) AS cohort FROM e GROUP BY u)
    SELECT c.cohort, e.per - c.cohort AS "offset",
           CAST(sum(e.cents) AS BIGINT) AS cents
    FROM e JOIN c USING (u)
    GROUP BY 1, 2 ORDER BY 1, 2
"""


def test_cohort_value_duckdb_fuzz_partition_invariant():
    from featurebox_ray.stages.retention import _PERIOD_US
    from featurebox_ray.stages.retention import cohort_value_curve

    rng = np.random.default_rng(199)
    n = 900
    w = _PERIOD_US["day"]
    pdf = pd.DataFrame({
        "u": rng.integers(0, 30, n).astype(float),
        "t": (rng.integers(0, 30, n) * w
              + rng.integers(0, w, n)).astype(float),
        "v": np.round(rng.uniform(0, 20, n), 2),
    })
    pdf.loc[rng.choice(n, 6, replace=False), "u"] = np.nan
    pdf.loc[rng.choice(n, 6, replace=False), "v"] = np.nan
    con = duckdb.connect()
    con.register("ev", pdf.astype({"u": "Int64", "t": "Int64"}))
    exp = con.sql(COHORT_ORACLE.format(w=w)).df().reset_index(
        drop=True)
    t = pa.table({"u": pa.array(pd.array(pdf.u, dtype="Int64")),
                  "t": pa.array(pd.array(pdf.t, dtype="Int64")),
                  "v": pa.array(pdf.v, pa.float64(),
                                from_pandas=True)})
    prev = None
    for parts in (1, 6):
        ds = ray.data.from_arrow(t)
        if parts > 1:
            ds = ds.repartition(parts)
        got = (cohort_value_curve(ds, key_col="u", ts_col="t",
                                  value_col="v", period="day",
                                  num_partitions=4)
               .to_pandas().sort_values(["cohort", "offset"])
               .reset_index(drop=True))
        pd.testing.assert_frame_equal(got.astype(exp.dtypes.to_dict()),
                                      exp, check_exact=True)
        if prev is not None:
            assert got.equals(prev)
        prev = got


STREAK_ORACLE = """
    WITH p AS (SELECT DISTINCT u, t // {w} AS per FROM ev
               WHERE u IS NOT NULL AND t IS NOT NULL),
    i AS (SELECT u, per,
                 per - row_number() OVER (PARTITION BY u
                                          ORDER BY per) AS isl
          FROM p),
    r AS (SELECT u, isl, CAST(count(*) AS BIGINT) AS run_len
          FROM i GROUP BY u, isl)
    SELECT u, CAST(sum(run_len) AS BIGINT) AS n_periods,
           CAST(max(run_len) AS BIGINT) AS longest
    FROM r GROUP BY u ORDER BY u
"""


def test_longest_streak_duckdb_fuzz_partition_invariant():
    from featurebox_ray.stages.retention import longest_streak

    rng = np.random.default_rng(211)
    n, w = 1000, 100
    pdf = pd.DataFrame({
        "u": rng.integers(0, 25, n).astype(float),
        "t": (rng.integers(0, 40, n) * w
              + rng.integers(0, w, n)).astype(float),
    })
    pdf.loc[rng.choice(n, 8, replace=False), "u"] = np.nan
    pdf.loc[rng.choice(n, 8, replace=False), "t"] = np.nan
    con = duckdb.connect()
    con.register("ev", pdf.astype({"u": "Int64", "t": "Int64"}))
    exp = con.sql(STREAK_ORACLE.format(w=w)).df().reset_index(
        drop=True)
    t = pa.table({"u": pa.array(pd.array(pdf.u, dtype="Int64")),
                  "t": pa.array(pd.array(pdf.t, dtype="Int64"))})
    import featurebox_ray.stages.retention as rt

    rt._PERIOD_US["__test"] = w
    try:
        prev = None
        for parts in (1, 6):
            ds = ray.data.from_arrow(t)
            if parts > 1:
                ds = ds.repartition(parts)
            got = (longest_streak(ds, key_col="u", ts_col="t",
                                  period="__test", num_partitions=4)
                   .to_pandas().sort_values("u")
                   .reset_index(drop=True))
            pd.testing.assert_frame_equal(
                got.astype(exp.dtypes.to_dict()), exp,
                check_exact=True)
            if prev is not None:
                assert got.equals(prev)
            prev = got
    finally:
        del rt._PERIOD_US["__test"]


def test_longest_streak_hand_case():
    from featurebox_ray.stages.retention import longest_streak

    # user 1 active days 0,1,2, 5,6 -> longest 3; user 2 one day
    t = pa.table({"u": pa.array([1, 1, 1, 1, 1, 1, 2], pa.int64()),
                  "t": pa.array([0, 10, 86400_000_000,
                                 2 * 86400_000_000,
                                 5 * 86400_000_000,
                                 6 * 86400_000_000,
                                 0], pa.int64())})
    got = (longest_streak(ray.data.from_arrow(t), key_col="u",
                          ts_col="t", period="day", num_partitions=2)
           .to_pandas().sort_values("u"))
    assert got.longest.tolist() == [3, 1]
    assert got.n_periods.tolist() == [5, 1]
