"""Adaptive sessionization (stages/window.py:adaptive_sessionize) vs
a DuckDB lag/quantile/islands replay; heterogeneous-cadence hand case;
partition invariance."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from featurebox_ray.stages.window import adaptive_sessionize

ORACLE = """
    WITH e AS (SELECT k, o, t FROM tab
               WHERE k IS NOT NULL AND o IS NOT NULL
                 AND t IS NOT NULL),
    d AS (SELECT k, o, t, t - lag(t) OVER (
            PARTITION BY k ORDER BY t, o) AS delta FROM e),
    m AS (SELECT k, CAST(quantile_disc(delta, 0.5) AS BIGINT) AS med
          FROM d WHERE delta IS NOT NULL GROUP BY k),
    s AS (SELECT d.k, d.o, d.t,
                 CASE WHEN d.delta IS NULL OR d.delta > 3 * m.med
                      THEN 1 ELSE 0 END AS brk
          FROM d LEFT JOIN m USING (k)),
    i AS (SELECT k, t, CAST(sum(brk) OVER (
            PARTITION BY k ORDER BY t, o
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
          FROM s)
    SELECT k, session_id, CAST(count(*) AS BIGINT) AS n_events,
           CAST(min(t) AS BIGINT) AS start_us,
           CAST(max(t) AS BIGINT) AS end_us
    FROM i GROUP BY k, session_id ORDER BY k, session_id
"""


def test_adaptive_sessionize_duckdb_partition_invariant():
    rng = np.random.default_rng(287)
    rows = []
    oid = 0
    for u in range(30):
        # heterogeneous cadence: base gap differs per user 10^(0..3)
        base = 10 ** (u % 4)
        t = 0
        for _ in range(rng.integers(1, 60)):
            t += int(rng.integers(1, 4) * base)
            if rng.uniform() < 0.1:
                t += 20 * base        # genuine session break
            rows.append((u, oid, t))
            oid += 1
    pdf = pd.DataFrame(rows, columns=["k", "o", "t"])
    # nulls drop
    pdf.loc[3, "k"] = pd.NA
    pdf = pdf.astype({"k": "Int64", "o": "Int64", "t": "Int64"})
    con = duckdb.connect()
    con.register("tab", pdf)
    exp = con.sql(ORACLE).df().reset_index(drop=True)
    assert exp.session_id.max() > 1       # breaks actually happen
    t = pa.Table.from_pandas(pdf, preserve_index=False)
    prev = None
    for parts in (1, 5):
        ds = ray.data.from_arrow(t)
        if parts > 1:
            ds = ds.repartition(parts)
        got = (adaptive_sessionize(ds, key_col="k", ts_col="t",
                                   order_col="o", k_num=3,
                                   num_partitions=4)
               .to_pandas().sort_values(["k", "session_id"])
               .reset_index(drop=True))
        pd.testing.assert_frame_equal(
            got.astype(exp.dtypes.to_dict()), exp)
        if prev is not None:
            assert got.equals(prev)
        prev = got


def test_adaptive_hand_case():
    # user 0 gaps: 10,10,100 -> median 10, thr 30 -> break before
    # last event; user 1 single event -> one session
    t = pa.table({
        "k": pa.array([0, 0, 0, 0, 1], pa.int64()),
        "o": pa.array([1, 2, 3, 4, 1], pa.int64()),
        "t": pa.array([0, 10, 20, 120, 5], pa.int64()),
    })
    got = (adaptive_sessionize(ray.data.from_arrow(t), key_col="k",
                               ts_col="t", order_col="o")
           .to_pandas().sort_values(["k", "session_id"])
           .reset_index(drop=True))
    assert got[got.k == 0].session_id.tolist() == [1, 2]
    assert got[got.k == 0].n_events.tolist() == [3, 1]
    assert got[got.k == 1].n_events.tolist() == [1]
