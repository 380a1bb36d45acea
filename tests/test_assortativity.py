"""Hourly co-occurrence edges + degree assortativity
(stages/graph.py:window_cooccurrence_edges / degree_assortativity)
vs a DuckDB replay; hand-checked graphs; partition invariance."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from featurebox_ray.stages.graph import (degree_assortativity,
                                         window_cooccurrence_edges)

ORACLE = """
    WITH e AS (
      SELECT CAST(t // {w} AS BIGINT) AS b, u FROM ev
      WHERE t IS NOT NULL AND u IS NOT NULL GROUP BY 1, 2),
    w AS (SELECT b FROM e GROUP BY b HAVING count(*) <= {cap}),
    p AS (SELECT DISTINCT a.u AS ua, c.u AS ub
          FROM e a JOIN e c ON a.b = c.b AND a.u < c.u
          JOIN w ON w.b = a.b),
    d AS (SELECT u, CAST(count(*) AS BIGINT) AS deg
          FROM (SELECT ua AS u FROM p UNION ALL SELECT ub FROM p)
          GROUP BY u),
    s AS (SELECT CAST(count(*) AS BIGINT) AS m,
                 CAST(sum(da.deg * db.deg) AS BIGINT) AS sjk,
                 CAST(sum(da.deg + db.deg) AS BIGINT) AS sj,
                 CAST(sum(da.deg * da.deg + db.deg * db.deg)
                      AS BIGINT) AS sq
          FROM p JOIN d da ON da.u = p.ua JOIN d db ON db.u = p.ub)
    SELECT m, sjk, sj, sq,
           CASE WHEN CAST(2 * m AS DOUBLE) * CAST(sq AS DOUBLE)
                     - CAST(sj AS DOUBLE) * CAST(sj AS DOUBLE) = 0
                THEN NULL
                ELSE (CAST(4 * m AS DOUBLE) * CAST(sjk AS DOUBLE)
                      - CAST(sj AS DOUBLE) * CAST(sj AS DOUBLE))
                     / (CAST(2 * m AS DOUBLE) * CAST(sq AS DOUBLE)
                        - CAST(sj AS DOUBLE) * CAST(sj AS DOUBLE))
           END AS r
    FROM s
"""


def test_assortativity_duckdb_fuzz_partition_invariant():
    rng = np.random.default_rng(271)
    n = 1200
    ts = [None if rng.random() < 0.02
          else int(rng.integers(0, 40 * 100)) for _ in range(n)]
    us = [None if rng.random() < 0.02
          else int(rng.integers(0, 25)) for _ in range(n)]
    pdf = pd.DataFrame({"t": pd.array(ts, dtype="Int64"),
                        "u": pd.array(us, dtype="Int64")})
    con = duckdb.connect()
    con.register("ev", pdf)
    exp = con.sql(ORACLE.format(w=100, cap=4096)).df()
    prev = None
    t = pa.table({"t": pa.array(ts, pa.int64()),
                  "u": pa.array(us, pa.int64())})
    for parts in (1, 9):
        ds = ray.data.from_arrow(t)
        if parts > 1:
            ds = ds.repartition(parts)
        edges = window_cooccurrence_edges(
            ds, ts_col="t", actor_col="u", width_us=100,
            num_partitions=5)
        got = degree_assortativity(edges).to_pandas()
        pd.testing.assert_frame_equal(
            got.astype(exp.dtypes.to_dict()),
            exp.reset_index(drop=True), check_exact=True)
        if prev is not None:
            assert got.equals(prev)
        prev = got


def test_assortativity_hand_checked_star():
    # star graph: center 0 joined to 1,2,3 in one window ->
    # K4 actually (all pairs in one window) — use two windows:
    # window 0: {0,1}; window 1: {0,2}; window 2: {0,3}
    t = pa.table({"t": pa.array([0, 1, 100, 101, 200, 201],
                                pa.int64()),
                  "u": pa.array([0, 1, 0, 2, 0, 3], pa.int64())})
    edges = window_cooccurrence_edges(
        ray.data.from_arrow(t), ts_col="t", actor_col="u",
        width_us=100, num_partitions=3)
    e = edges.to_pandas().sort_values(["src", "dst"])
    assert e.values.tolist() == [[0, 1], [0, 2], [0, 3]]
    got = degree_assortativity(edges).to_pandas().iloc[0]
    # star: M=3, deg(0)=3, leaves 1 -> jk=3 each, sjk=9, sj=12, sq=30
    assert (got["m"], got["sjk"], got["sj"], got["sq"]) == (3, 9, 12, 30)
    # r = (4*3*9 - 144) / (2*3*30 - 144) = -36/36 = -1 (perfect
    # disassortativity, the star-graph signature)
    assert got["r"] == -1.0


def test_assortativity_regular_graph_null():
    # one window with 3 users -> triangle, all degrees 2 -> den 0
    t = pa.table({"t": pa.array([0, 1, 2], pa.int64()),
                  "u": pa.array([7, 8, 9], pa.int64())})
    edges = window_cooccurrence_edges(
        ray.data.from_arrow(t), ts_col="t", actor_col="u",
        width_us=100)
    got = degree_assortativity(edges).to_pandas().iloc[0]
    assert got["m"] == 3 and pd.isna(got["r"])


def test_cooccurrence_dedups_across_windows():
    # same pair in two windows -> one edge
    t = pa.table({"t": pa.array([0, 1, 100, 101], pa.int64()),
                  "u": pa.array([4, 5, 4, 5], pa.int64())})
    edges = window_cooccurrence_edges(
        ray.data.from_arrow(t), ts_col="t", actor_col="u",
        width_us=100).to_pandas()
    assert edges.values.tolist() == [[4, 5]]
