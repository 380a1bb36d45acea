"""Busy-window session overlap (stages/interval.py:busy_window_overlap)
vs a DuckDB sessionize + clip replay."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from featurebox_ray.stages.interval import busy_window_overlap

ORACLE = """
    WITH e_all AS (SELECT id, u, t FROM ev WHERE t IS NOT NULL),
    e AS (SELECT * FROM e_all WHERE u IS NOT NULL),
    d AS (SELECT u, id, t,
                 t - lag(t) OVER (PARTITION BY u ORDER BY t, id) AS gap
          FROM e),
    s AS (SELECT u, t,
                 SUM(CASE WHEN gap IS NULL OR gap > {gap} THEN 1
                          ELSE 0 END)
                   OVER (PARTITION BY u ORDER BY t, id
                         ROWS UNBOUNDED PRECEDING) AS sid
          FROM d),
    sess AS (SELECT u, min(t) AS st, max(t) AS en
             FROM s GROUP BY u, sid),
    h AS (SELECT t // {w} AS hr, count(*) AS n FROM e_all
          GROUP BY hr ORDER BY n DESC, hr ASC LIMIT {k}),
    ov AS (SELECT sess.u,
                  greatest(0, least(sess.en, (h.hr + 1) * {w})
                              - greatest(sess.st, h.hr * {w})) AS o
           FROM sess CROSS JOIN h)
    SELECT u, CAST(sum(o) AS BIGINT) AS overlap_us
    FROM ov GROUP BY u ORDER BY u
"""


def test_busy_overlap_duckdb_fuzz_partition_invariant():
    rng = np.random.default_rng(89)
    n = 1200
    gap, w, k = 500, 1000, 3
    us = rng.integers(0, 25, n).astype(float)
    us[rng.choice(n, 10, replace=False)] = np.nan
    ts = rng.integers(0, 20000, n).astype(float)
    ts[rng.choice(n, 10, replace=False)] = np.nan
    pdf = pd.DataFrame({"id": np.arange(n), "u": us, "t": ts})
    con = duckdb.connect()
    con.register("ev", pdf.astype({"u": "Int64", "t": "Int64",
                                   "id": "int64"}))
    exp = con.sql(ORACLE.format(gap=gap, w=w, k=k)).df().reset_index(
        drop=True)
    t = pa.table({
        "id": pa.array(np.arange(n), pa.int64()),
        "u": pa.array(pd.array(us, dtype="Int64")),
        "t": pa.array(pd.array(ts, dtype="Int64")),
    })
    prev = None
    for parts in (1, 6):
        ds = ray.data.from_arrow(t)
        if parts > 1:
            ds = ds.repartition(parts)
        got = (busy_window_overlap(
            ds, key_col="u", ts_col="t", id_col="id",
            gap_s=gap / 1e6, width_s=w / 1e6, top_k=k,
            num_partitions=4)
            .to_pandas().sort_values("u").reset_index(drop=True))
        pd.testing.assert_frame_equal(got.astype(exp.dtypes.to_dict()),
                                      exp)
        if prev is not None:
            assert got.equals(prev)
        prev = got


def test_busy_overlap_hand_case():
    # one user, one session [5, 25); windows of width 10; top-1 busiest
    # window is [0,10) (3 events) -> overlap = 10 - 5 = 5
    t = pa.table({
        "id": pa.array([0, 1, 2, 3], pa.int64()),
        "u": pa.array([1, 1, 1, 1], pa.int64()),
        "t": pa.array([5, 7, 9, 25], pa.int64()),
    })
    got = (busy_window_overlap(ray.data.from_arrow(t), key_col="u",
                               ts_col="t", id_col="id",
                               gap_s=100 / 1e6, width_s=10 / 1e6,
                               top_k=1, num_partitions=2)
           .to_pandas())
    assert got.overlap_us.tolist() == [5]


CONC_ORACLE = """
    WITH d AS (
      SELECT u, id, t,
             t - lag(t) OVER (PARTITION BY u ORDER BY t, id) AS gap
      FROM ev WHERE t IS NOT NULL AND u IS NOT NULL),
    s AS (SELECT u, t,
                 SUM(CASE WHEN gap IS NULL OR gap > {gap} THEN 1
                          ELSE 0 END)
                   OVER (PARTITION BY u ORDER BY t, id
                         ROWS UNBOUNDED PRECEDING) AS sid
          FROM d),
    sess AS (SELECT u, sid, min(t) AS st, max(t) AS en
             FROM s GROUP BY u, sid),
    w AS (SELECT unnest(range(st // {w}, en // {w} + 1)) AS "window"
          FROM sess)
    SELECT "window", CAST(count(*) AS BIGINT) AS n_active
    FROM w GROUP BY "window" ORDER BY "window"
"""


def test_session_concurrency_duckdb_fuzz():
    from featurebox_ray.stages.interval import session_concurrency

    rng = np.random.default_rng(157)
    n, gap, w = 900, 300, 500
    pdf = pd.DataFrame({"id": np.arange(n),
                        "u": rng.integers(0, 15, n),
                        "t": rng.integers(0, 20000, n)})
    con = duckdb.connect()
    con.register("ev", pdf)
    exp = con.sql(CONC_ORACLE.format(gap=gap, w=w)).df().reset_index(
        drop=True)
    t = pa.table({c: pa.array(pdf[c], pa.int64()) for c in pdf})
    prev = None
    for parts in (1, 5):
        ds = ray.data.from_arrow(t)
        if parts > 1:
            ds = ds.repartition(parts)
        got = (session_concurrency(ds, key_col="u", ts_col="t",
                                   id_col="id", gap_s=gap / 1e6,
                                   width_s=w / 1e6, num_partitions=4)
               .to_pandas().sort_values("window")
               .reset_index(drop=True))
        pd.testing.assert_frame_equal(got.astype(exp.dtypes.to_dict()),
                                      exp)
        if prev is not None:
            assert got.equals(prev)
        prev = got


def test_session_concurrency_span_guard():
    import pytest

    from featurebox_ray.stages.interval import session_concurrency

    t = pa.table({"id": pa.array([0, 1], pa.int64()),
                  "u": pa.array([1, 1], pa.int64()),
                  "t": pa.array([0, 10**9], pa.int64())})
    with pytest.raises(Exception, match="max_buckets_per_session"):
        session_concurrency(ray.data.from_arrow(t), key_col="u",
                            ts_col="t", id_col="id",
                            gap_s=10**10 / 1e6, width_s=1 / 1e6,
                            max_buckets_per_session=10).to_pandas()
