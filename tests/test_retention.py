"""Retention cohort matrix (stages/retention.py)."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest
import ray

from featurebox_ray.stages.retention import retention_cohorts

WEEK_US = 604_800_000_000


def _events(rng, n=500, n_users=40, null_every=23):
    ts = rng.integers(0, 10 * WEEK_US, n)
    return pa.table({
        "user_id": pa.array(rng.integers(0, n_users, n), pa.int64()),
        "ts": pa.array([None if null_every and i % null_every == 0
                        else int(v) for i, v in enumerate(ts)],
                       pa.timestamp("us")),
    })


def test_retention_duckdb_fuzz():
    rng = np.random.default_rng(41)
    t = _events(rng)
    con = duckdb.connect()
    con.register("events", t)
    want = con.execute(f"""
        WITH a AS (SELECT user_id, epoch_us(ts) // {WEEK_US} AS per
                   FROM events WHERE ts IS NOT NULL),
        c AS (SELECT user_id, min(per) AS cohort FROM a
              GROUP BY user_id),
        d AS (SELECT DISTINCT a.user_id, c.cohort,
                     a.per - c.cohort AS off
              FROM a JOIN c USING (user_id))
        SELECT cohort, off AS "offset",
               CAST(count(*) AS BIGINT) AS n_users
        FROM d GROUP BY cohort, off ORDER BY cohort, off
    """).fetch_arrow_table()
    for dp, parts in ((1, 2), (5, 3), (9, 7)):
        got = (retention_cohorts(
            ray.data.from_arrow(t).repartition(dp), period="week",
            num_partitions=parts)
            .to_pandas().sort_values(["cohort", "offset"])
            .reset_index(drop=True))
        for c in ("cohort", "offset", "n_users"):
            assert got[c].tolist() == want[c].to_pylist(), (c, dp, parts)


def test_retention_hand_case():
    # user 1: weeks 0,0,2 -> cohort 0, offsets {0,2}
    # user 2: weeks 1,1 -> cohort 1, offset {0}
    t = pa.table({
        "user_id": pa.array([1, 1, 1, 2, 2], pa.int64()),
        "ts": pa.array([10, 20, 2 * WEEK_US + 5, WEEK_US + 1,
                        WEEK_US + 2], pa.int64()),
    })
    got = (retention_cohorts(ray.data.from_arrow(t), period="week",
                             num_partitions=2)
           .to_pandas().sort_values(["cohort", "offset"])
           .reset_index(drop=True))
    assert got.values.tolist() == [[0, 0, 1], [0, 2, 1], [1, 0, 1]]
    with pytest.raises(ValueError, match="period"):
        retention_cohorts(ray.data.from_arrow(t), period="month")
