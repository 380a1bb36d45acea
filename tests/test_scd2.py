"""SCD-2 intervalization (stages/scd.py)."""

import duckdb
import numpy as np
import pyarrow as pa
import ray

from featurebox_ray.stages.scd import scd2_intervals


def test_scd2_vs_duckdb_fuzz():
    rng = np.random.default_rng(9)
    n = 700
    t = pa.table({
        "u": pa.array([None if i % 97 == 0 else int(v) for i, v in
                       enumerate(rng.integers(0, 15, n))], pa.int64()),
        "ts": pa.array(rng.integers(0, 300, n), pa.int64()),
        "eid": pa.array(np.arange(n), pa.int64()),
        "st": pa.array([None if i % 83 == 0 else s for i, s in
                        enumerate(np.array(["a", "b", "c"])[
                            rng.integers(0, 3, n)])], pa.string()),
    })
    con = duckdb.connect()
    con.register("t", t)
    want = con.execute("""
        WITH e AS (SELECT u, ts, eid, st FROM t
                   WHERE u IS NOT NULL AND ts IS NOT NULL
                     AND eid IS NOT NULL AND st IS NOT NULL),
        m AS (SELECT *, CASE WHEN lag(st) OVER (
                PARTITION BY u ORDER BY ts, eid)
                IS DISTINCT FROM st THEN 1 ELSE 0 END chg FROM e),
        g AS (SELECT *, sum(chg) OVER (PARTITION BY u ORDER BY ts, eid
                ROWS UNBOUNDED PRECEDING) run FROM m),
        r AS (SELECT u, st state, min(ts) valid_from,
                     CAST(count(*) AS BIGINT) n_rows, run
              FROM g GROUP BY u, st, run)
        SELECT u, state, valid_from,
               lead(valid_from) OVER (PARTITION BY u ORDER BY run)
                 AS valid_to, n_rows
        FROM r ORDER BY u, valid_from, run
    """).fetch_arrow_table().to_pandas()
    for parts in (2, 6):
        got = (scd2_intervals(ray.data.from_arrow(t).repartition(4),
                              key_col="u", ts_col="ts", seq_col="eid",
                              state_col="st", num_partitions=parts)
               .to_pandas()
               .sort_values(["u", "valid_from", "valid_to"],
                            na_position="last")
               .reset_index(drop=True))
        w = want.sort_values(["u", "valid_from", "valid_to"],
                             na_position="last").reset_index(drop=True)
        assert got["u"].tolist() == w["u"].tolist()
        assert got["state"].tolist() == w["state"].tolist()
        assert got["valid_from"].tolist() == w["valid_from"].tolist()
        assert got["n_rows"].tolist() == w["n_rows"].tolist()
        gv, wv = got["valid_to"], w["valid_to"]
        assert (gv.isna() == wv.isna()).all()
        assert (gv.dropna().to_numpy() == wv.dropna().to_numpy()).all()


def test_scd2_semantics_small():
    t = pa.table({
        "u": pa.array([1, 1, 1, 1, 2], pa.int64()),
        "ts": pa.array([10, 20, 30, 40, 5], pa.int64()),
        "eid": pa.array([0, 1, 2, 3, 4], pa.int64()),
        "st": pa.array(["a", "a", "b", "a", "c"]),
    })
    got = (scd2_intervals(ray.data.from_arrow(t), key_col="u",
                          ts_col="ts", seq_col="eid", state_col="st")
           .to_pandas().sort_values(["u", "valid_from"])
           .reset_index(drop=True))
    assert got["state"].tolist() == ["a", "b", "a", "c"]
    assert got["valid_from"].tolist() == [10, 30, 40, 5]
    assert got["valid_to"].tolist()[:2] == [30, 40]
    assert got["valid_to"].isna().tolist() == [False, False, True, True]
    assert got["n_rows"].tolist() == [2, 1, 1, 1]
