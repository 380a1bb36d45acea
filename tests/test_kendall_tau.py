"""Kendall tau-b (stages/regress.py:kendall_tau) vs a DuckDB all-pairs
replay; planted monotone series; partition invariance."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from featurebox_ray.stages.regress import kendall_tau

ORACLE = """
    WITH e AS (
      SELECT k AS u, rid AS id, x AS t,
             CAST(round(coalesce(v, 0) * 100) AS BIGINT) AS y
      FROM pts WHERE k IS NOT NULL AND x IS NOT NULL
        AND v IS NOT NULL),
    p AS (SELECT a.u AS u,
                 CASE WHEN a.t = b.t THEN 0
                      WHEN (a.t < b.t AND a.y < b.y)
                        OR (a.t > b.t AND a.y > b.y) THEN 1
                      WHEN a.y = b.y THEN 0 ELSE -1 END AS s,
                 CASE WHEN a.t = b.t THEN 1 ELSE 0 END AS tx,
                 CASE WHEN a.y = b.y THEN 1 ELSE 0 END AS ty
          FROM e a JOIN e b ON a.u = b.u AND a.id < b.id),
    g AS (SELECT u, CAST(count(*) AS BIGINT) AS n0,
                 CAST(sum(s) AS BIGINT) AS cd,
                 CAST(sum(tx) AS BIGINT) AS n1,
                 CAST(sum(ty) AS BIGINT) AS n2
          FROM p GROUP BY u),
    c AS (SELECT u, CAST(count(*) AS BIGINT) AS n FROM e GROUP BY u)
    SELECT c.u AS k, c.n, g.cd,
           CASE WHEN (g.n0 - g.n1) * (g.n0 - g.n2) = 0 THEN NULL
                ELSE CAST(g.cd AS DOUBLE)
                     / sqrt(CAST((g.n0 - g.n1) * (g.n0 - g.n2)
                                 AS DOUBLE))
           END AS tau
    FROM c JOIN g ON c.u = g.u ORDER BY k
"""


def test_kendall_tau_duckdb_fuzz_partition_invariant():
    rng = np.random.default_rng(911)
    n = 600
    ks = [None if rng.random() < 0.02 else int(rng.integers(0, 25))
          for _ in range(n)]
    # coarse grids force plenty of x- and y-ties
    xs = [None if rng.random() < 0.02 else int(rng.integers(0, 12))
          for _ in range(n)]
    vs = [None if rng.random() < 0.03
          else float(rng.integers(-40, 40)) / 4 for _ in range(n)]
    pdf = pd.DataFrame({"k": pd.array(ks, dtype="Int64"),
                        "rid": np.arange(n),
                        "x": pd.array(xs, dtype="Int64"), "v": vs})
    con = duckdb.connect()
    con.register("pts", pdf)
    exp = con.sql(ORACLE).df().reset_index(drop=True)
    t = pa.table({"k": pa.array(ks, pa.int64()),
                  "x": pa.array(xs, pa.int64()),
                  "v": pa.array(vs, pa.float64())})
    prev = None
    for parts in (1, 7):
        ds = ray.data.from_arrow(t)
        if parts > 1:
            ds = ds.repartition(parts)
        got = (kendall_tau(ds, key_col="k", x_col="x", y_col="v",
                           num_partitions=5)
               .to_pandas().sort_values("k").reset_index(drop=True))
        pd.testing.assert_frame_equal(
            got.astype(exp.dtypes.to_dict()), exp, check_exact=True)
        if prev is not None:
            assert got.equals(prev)
        prev = got


def test_kendall_tau_planted_monotone():
    # key 1 strictly increasing -> tau 1; key 2 strictly decreasing
    # -> tau -1; key 3 constant y -> NULL; key 4 single row -> absent
    rows = ([(1, i, float(i)) for i in range(6)]
            + [(2, i, float(-i)) for i in range(6)]
            + [(3, i, 5.0) for i in range(4)] + [(4, 0, 1.0)])
    t = pa.table({"k": pa.array([r[0] for r in rows], pa.int64()),
                  "x": pa.array([r[1] for r in rows], pa.int64()),
                  "v": pa.array([r[2] for r in rows], pa.float64())})
    got = (kendall_tau(ray.data.from_arrow(t), key_col="k",
                       x_col="x", y_col="v")
           .to_pandas().set_index("k").sort_index())
    assert got.loc[1, "tau"] == 1.0 and got.loc[1, "cd"] == 15
    assert got.loc[2, "tau"] == -1.0 and got.loc[2, "cd"] == -15
    assert np.isnan(got.loc[3, "tau"])
    assert 4 not in got.index
