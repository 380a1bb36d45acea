"""Funnel-conversion features (stages/funnel.py)."""

import duckdb
import numpy as np
import pyarrow as pa
import ray

from featurebox_ray.stages.funnel import funnel_features


def _events(rng, n=400, n_users=25, null_every=0):
    types = np.array(["view", "purchase", "click"])
    ts = rng.integers(0, 1_000_000, n) * 1_000_000  # us, second grain
    rows = {
        "event_id": pa.array(np.arange(n), pa.int64()),
        "user_id": pa.array(rng.integers(0, n_users, n), pa.int64()),
        "ts": pa.array([None if null_every and i % null_every == 0
                        else int(v) for i, v in enumerate(ts)],
                       pa.timestamp("us")),
        "event_type": pa.array(types[rng.integers(0, 3, n)]),
    }
    return pa.table(rows)


def _want(t, horizon_s):
    con = duckdb.connect()
    con.register("events", t)
    return con.execute(f"""
        WITH a AS (
          SELECT user_id, min(ts) AS first_a FROM events
          WHERE event_type = 'view' AND ts IS NOT NULL
          GROUP BY user_id
        )
        SELECT a.user_id, a.first_a,
               min(e.ts) AS conv_ts,
               CAST(count(e.ts) AS BIGINT) AS n_b_window,
               epoch_us(min(e.ts)) - epoch_us(a.first_a) AS gap_us
        FROM a LEFT JOIN events e
          ON e.user_id = a.user_id AND e.event_type = 'purchase'
         AND e.ts >= a.first_a
         AND e.ts <= a.first_a + INTERVAL {horizon_s} SECOND
        GROUP BY a.user_id, a.first_a
        ORDER BY a.user_id
    """).fetch_arrow_table()


def _got(t, horizon_s, data_parts, parts):
    ds = ray.data.from_arrow(t).repartition(data_parts)
    out = funnel_features(ds, step_a="view", step_b="purchase",
                          horizon_s=horizon_s, num_partitions=parts)
    from featurebox_ray.stages.partition import materialized_block_refs
    blocks = [b for b in ray.get(materialized_block_refs(out))
              if b.num_rows]
    if not blocks:
        return None
    return (pa.concat_tables(blocks, promote_options="default")
            .sort_by("user_id"))


def test_funnel_duckdb_fuzz():
    rng = np.random.default_rng(21)
    for null_every, horizon in ((0, 3600), (17, 3600), (0, 100_000)):
        t = _events(rng, null_every=null_every)
        want = _want(t, horizon)
        for dp, p in ((1, 1), (4, 5), (9, 3)):
            got = _got(t, horizon, dp, p)
            assert got.num_rows == want.num_rows
            for c in ("user_id", "first_a", "conv_ts", "n_b_window",
                      "gap_us"):
                assert got[c].to_pylist() == want[c].to_pylist(), (
                    c, null_every, horizon, dp, p)


def test_funnel_hand_case():
    t = pa.table({
        "user_id": pa.array([1, 1, 1, 2, 2, 3], pa.int64()),
        "ts": pa.array([100, 150, 400, 50, 500, 70], pa.int64()),
        "event_type": pa.array(["view", "purchase", "purchase",
                                "purchase", "view", "purchase"]),
    })
    ds = ray.data.from_arrow(t)
    got = (funnel_features(ds, step_a="view", step_b="purchase",
                           horizon_s=0, num_partitions=2)
           .to_pandas().sort_values("user_id").reset_index(drop=True))
    # int64 ts column: horizon interpreted in native units; horizon 0
    # means "same instant" -> only user 1's B at 150 is outside, none
    # convert, user 3 (no A) absent
    assert list(got["user_id"]) == [1, 2]
    assert got["n_b_window"].tolist() == [0, 0]
    # widen: horizon covers user 1's B events at 150 and 400
    got2 = (funnel_features(ds, step_a="view", step_b="purchase",
                            horizon_s=300, num_partitions=2)
            .to_pandas().sort_values("user_id").reset_index(drop=True))
    r1 = got2[got2["user_id"] == 1].iloc[0]
    assert r1["first_a"] == 100 and r1["conv_ts"] == 150
    assert r1["n_b_window"] == 2 and r1["gap_us"] == 50
    r2 = got2[got2["user_id"] == 2].iloc[0]
    # user 2's purchase precedes their first view -> no conversion
    assert r2["n_b_window"] == 0 and np.isnan(r2["gap_us"])


def test_funnel_ns_timestamp_unit_scaling():
    # review fix: horizon must scale by the column's NATIVE unit
    base = 1_700_000_000_000_000_000  # ns
    t = pa.table({
        "user_id": pa.array([1, 1], pa.int64()),
        "ts": pa.array([base, base + 3_600_000_000_000],  # +1h in ns
                       pa.timestamp("ns")),
        "event_type": pa.array(["view", "purchase"]),
    })
    got = (funnel_features(ray.data.from_arrow(t), step_a="view",
                           step_b="purchase", horizon_s=7200,
                           num_partitions=1).to_pandas())
    assert got.iloc[0]["n_b_window"] == 1          # 1h < 2h horizon
    assert got.iloc[0]["gap_us"] == 3_600_000_000_000  # native ns gap
    tight = (funnel_features(ray.data.from_arrow(t), step_a="view",
                             step_b="purchase", horizon_s=1800,
                             num_partitions=1).to_pandas())
    assert tight.iloc[0]["n_b_window"] == 0


def test_funnel_same_step_repeat_event():
    # review fix: step_a == step_b (repeat-purchase funnel) — the anchor
    # row itself satisfies ts >= first_a and counts
    t = pa.table({
        "user_id": pa.array([1, 1, 2], pa.int64()),
        "ts": pa.array([100, 200, 50], pa.int64()),
        "event_type": pa.array(["purchase", "purchase", "purchase"]),
    })
    got = (funnel_features(ray.data.from_arrow(t), step_a="purchase",
                           step_b="purchase", horizon_s=1,
                           num_partitions=2)
           .to_pandas().sort_values("user_id").reset_index(drop=True))
    # horizon 1s = 1e6 native units covers both of user 1's purchases
    assert got["n_b_window"].tolist() == [2, 1]
    assert got.iloc[0]["conv_ts"] == 100  # anchor itself
