"""Event-type transition counts (stages/transitions.py) vs serial replay."""

import numpy as np
import pyarrow as pa
import ray

from featurebox_ray.stages.transitions import event_transition_counts


def _serial(keys, tss, orders, types):
    rows = sorted(zip(keys, tss, orders, types),
                  key=lambda r: (r[0], r[1], r[2]))
    cnt = {}
    for a, b in zip(rows, rows[1:]):
        if a[0] == b[0] and a[3] is not None and b[3] is not None:
            cnt[(a[3], b[3])] = cnt.get((a[3], b[3]), 0) + 1
    tot = {}
    for (f, _), c in cnt.items():
        tot[f] = tot.get(f, 0) + c
    return {k: (c, float(c) / float(tot[k[0]])) for k, c in cnt.items()}


def test_transitions_match_serial_and_partition_invariant():
    rng = np.random.default_rng(31)
    n = 800
    keys = rng.integers(0, 12, n).tolist()
    tss = rng.integers(0, 4000, n).tolist()
    orders = list(range(n))
    types = [None if rng.random() < 0.05
             else str(rng.choice(list("abcd"))) for _ in range(n)]
    t = pa.table({"k": pa.array(keys, pa.int64()),
                  "ts": pa.array(tss, pa.int64()),
                  "o": pa.array(orders, pa.int64()),
                  "et": pa.array(types, pa.string())})
    expect = _serial(keys, tss, orders, types)

    prev = None
    for parts in (1, 6):
        ds = ray.data.from_arrow(t)
        if parts > 1:
            ds = ds.repartition(parts)
        got = (event_transition_counts(ds, key_col="k", ts_col="ts",
                                       order_col="o", type_col="et",
                                       num_partitions=4)
               .to_pandas().sort_values(["from_type", "to_type"])
               .reset_index(drop=True))
        assert len(got) == len(expect)
        for _, r in got.iterrows():
            c, p = expect[(r["from_type"], r["to_type"])]
            assert r["cnt"] == c
            assert r["p"] == p  # bit-exact
        if prev is not None:
            assert got.equals(prev)
        prev = got


def test_transitions_single_events_and_empty():
    # every key has one event -> no pairs -> empty result
    t = pa.table({"k": pa.array([1, 2, 3], pa.int64()),
                  "ts": pa.array([1, 1, 1], pa.int64()),
                  "o": pa.array([0, 1, 2], pa.int64()),
                  "et": pa.array(["a", "b", "c"])})
    got = event_transition_counts(
        ray.data.from_arrow(t), key_col="k", ts_col="ts",
        order_col="o", type_col="et", num_partitions=2).to_pandas()
    assert len(got) == 0


def test_session_cooccurrence_duckdb_fuzz():
    import duckdb

    from featurebox_ray.stages.transitions import session_cooccurrence

    rng = np.random.default_rng(71)
    n = 500
    types = np.array(["view", "click", "purchase", "error"])
    t = pa.table({
        "event_id": pa.array(np.arange(n), pa.int64()),
        "user_id": pa.array(rng.integers(0, 12, n), pa.int64()),
        "ts": pa.array([None if i % 43 == 0 else int(v) for i, v in
                        enumerate(rng.integers(0, 500_000, n)
                                  * 1_000_000)],
                       pa.timestamp("us")),
        "event_type": pa.array(
            [None if i % 37 == 0 else types[v] for i, v in
             enumerate(rng.integers(0, 4, n))], pa.string()),
    })
    GAP = 1800
    con = duckdb.connect()
    con.register("events", t)
    want = con.execute(f"""
        WITH d AS (
          SELECT event_id, user_id, ts, event_type,
                 epoch(ts - lag(ts) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id)) AS gap
          FROM events WHERE ts IS NOT NULL),
        s AS (
          SELECT user_id, event_type,
                 SUM(CASE WHEN gap IS NULL OR gap > {GAP}
                     THEN 1 ELSE 0 END)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS UNBOUNDED PRECEDING) AS session_id
          FROM d),
        dt AS (SELECT DISTINCT user_id, session_id, event_type
               FROM s WHERE event_type IS NOT NULL)
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               CAST(count(*) AS BIGINT) AS cnt
        FROM dt a JOIN dt b
          ON a.user_id = b.user_id AND a.session_id = b.session_id
         AND a.event_type < b.event_type
        GROUP BY 1, 2 ORDER BY 1, 2
    """).fetch_arrow_table()
    for parts, np_ in ((1, 2), (4, 3), (9, 7)):
        got = (session_cooccurrence(
            ray.data.from_arrow(t).repartition(parts),
            key_col="user_id", ts_col="ts", type_col="event_type",
            order_col="event_id", gap_s=GAP, num_partitions=np_)
            .to_pandas().sort_values(["type_a", "type_b"])
            .reset_index(drop=True))
        assert got["type_a"].tolist() == want["type_a"].to_pylist()
        assert got["type_b"].tolist() == want["type_b"].to_pylist()
        assert got["cnt"].tolist() == want["cnt"].to_pylist(), (parts,
                                                                np_)


def test_session_cooccurrence_hand_case():
    from featurebox_ray.stages.transitions import session_cooccurrence

    # one user: session 1 = {a, b, a} -> pair (a,b); big gap;
    # session 2 = {b, c} -> pair (b,c); single-type session -> none
    t = pa.table({
        "event_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        "user_id": pa.array([7, 7, 7, 7, 7, 8], pa.int64()),
        "ts": pa.array([0, 10_000_000, 20_000_000,
                        10_000_000_000, 10_010_000_000, 0],
                       pa.int64()),
        "event_type": pa.array(["a", "b", "a", "b", "c", "z"]),
    })
    got = (session_cooccurrence(ray.data.from_arrow(t),
                                key_col="user_id", ts_col="ts",
                                type_col="event_type",
                                order_col="event_id", gap_s=1800)
           .to_pandas().sort_values(["type_a", "type_b"])
           .reset_index(drop=True))
    assert got.values.tolist() == [["a", "b", 1], ["b", "c", 1]]


def test_top_session_journeys_duckdb_fuzz():
    import duckdb

    from featurebox_ray.stages.transitions import top_session_journeys

    rng = np.random.default_rng(79)
    n = 500
    types = np.array(["view", "click", "purchase"])
    t = pa.table({
        "event_id": pa.array(np.arange(n), pa.int64()),
        "user_id": pa.array(rng.integers(0, 20, n), pa.int64()),
        "ts": pa.array([None if i % 43 == 0 else int(v) for i, v in
                        enumerate(rng.integers(0, 200_000, n)
                                  * 1_000_000)],
                       pa.timestamp("us")),
        "event_type": pa.array(
            [None if i % 37 == 0 else types[v] for i, v in
             enumerate(rng.integers(0, 3, n))], pa.string()),
    })
    GAP, K = 1800, 12
    con = duckdb.connect()
    con.register("events", t)
    want = con.execute(f"""
        WITH d AS (
          SELECT event_id, user_id, ts, event_type,
                 epoch(ts - lag(ts) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id)) AS gap
          FROM events WHERE ts IS NOT NULL),
        s AS (
          SELECT user_id, event_type, ts, event_id,
                 SUM(CASE WHEN gap IS NULL OR gap > {GAP}
                     THEN 1 ELSE 0 END)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS UNBOUNDED PRECEDING) AS session_id
          FROM d),
        c AS (SELECT user_id, session_id,
                     string_agg(event_type, '>'
                                ORDER BY ts, event_id) AS journey
              FROM s GROUP BY user_id, session_id)
        SELECT journey, CAST(count(*) AS BIGINT) AS cnt FROM c
        WHERE journey IS NOT NULL
        GROUP BY journey ORDER BY cnt DESC, journey ASC LIMIT {K}
    """).fetch_arrow_table()
    for parts, np_ in ((1, 2), (5, 3), (9, 7)):
        got = (top_session_journeys(
            ray.data.from_arrow(t).repartition(parts),
            key_col="user_id", ts_col="ts", type_col="event_type",
            order_col="event_id", gap_s=GAP, k=K,
            num_partitions=np_).to_pandas())
        assert got["journey"].tolist() == want["journey"].to_pylist(), (
            parts, np_)
        assert got["cnt"].tolist() == want["cnt"].to_pylist()
