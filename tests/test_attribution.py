"""Linear multi-touch attribution (stages/attribution.py)."""

import duckdb
import numpy as np
import pyarrow as pa
import ray

from featurebox_ray.stages.attribution import linear_attribution

H = 100  # horizon in native (int) units


def _fixture(rng, n=800, n_users=20):
    types = np.array(["view", "click", "signup", "purchase"])
    tys = types[rng.integers(0, 4, n)]
    t = pa.table({
        "u": pa.array(rng.integers(0, n_users, n), pa.int64()),
        "ts": pa.array(rng.integers(0, 500, n), pa.int64()),
        "eid": pa.array(np.arange(n), pa.int64()),
        "ty": pa.array(tys, pa.string()),
        # negative and tiny values exercise the cents>0 filter
        "v": pa.array(np.round(rng.normal(3, 4, n), 2), pa.float64()),
    })
    return t


def _oracle(t):
    con = duckdb.connect()
    con.register("t", t)
    return con.execute(f"""
        WITH e AS (SELECT u, ts, eid, ty,
                          CAST(round(coalesce(v,0)*100) AS BIGINT) cents
                   FROM t),
        conv AS (SELECT * FROM e WHERE ty = 'purchase' AND cents > 0),
        touch AS (SELECT * FROM e WHERE ty <> 'purchase'),
        pairs AS (
          SELECT c.cents, t.ty,
                 row_number() OVER (PARTITION BY c.u, c.eid
                                    ORDER BY t.ts, t.eid) rn,
                 count(*) OVER (PARTITION BY c.u, c.eid) n
          FROM conv c JOIN touch t ON t.u = c.u
           AND t.ts >= c.ts - {H} AND t.ts < c.ts)
        SELECT ty AS event_type,
               CAST(sum(cents // n + CASE WHEN rn <= cents % n
                        THEN 1 ELSE 0 END) AS BIGINT) credit_cents,
               CAST(count(*) AS BIGINT) n_touches
        FROM pairs GROUP BY ty ORDER BY ty
    """).fetch_arrow_table()


def test_attribution_vs_duckdb_fuzz():
    rng = np.random.default_rng(5)
    t = _fixture(rng)
    want = _oracle(t).to_pandas()
    for parts in (2, 7):
        got = linear_attribution(
            ray.data.from_arrow(t).repartition(3), key_col="u",
            ts_col="ts", seq_col="eid", type_col="ty", value_col="v",
            conv_type="purchase", horizon=H,
            num_partitions=parts).to_pandas()
        got = got.sort_values("event_type").reset_index(drop=True)
        assert got["event_type"].tolist() == want["event_type"].tolist()
        assert got["credit_cents"].tolist() == \
            want["credit_cents"].tolist()
        assert got["n_touches"].tolist() == want["n_touches"].tolist()


def test_attribution_reconciles_to_the_cent():
    # one user, 3 touches then a purchase of 100 cents: 34/33/33 split
    t = pa.table({
        "u": pa.array([1, 1, 1, 1], pa.int64()),
        "ts": pa.array([10, 20, 30, 40], pa.int64()),
        "eid": pa.array([0, 1, 2, 3], pa.int64()),
        "ty": pa.array(["view", "click", "view", "purchase"]),
        "v": pa.array([0.0, 0.0, 0.0, 1.0], pa.float64()),
    })
    got = linear_attribution(
        ray.data.from_arrow(t), key_col="u", ts_col="ts",
        seq_col="eid", type_col="ty", value_col="v",
        conv_type="purchase", horizon=H).to_pandas()
    # largest remainder: first touch (ts=10) gets the extra cent
    assert dict(zip(got["event_type"], got["credit_cents"])) == {
        "view": 34 + 33, "click": 33}
    assert got["credit_cents"].sum() == 100
