"""Difference-in-differences (stages/regress.py:did_estimate) vs a
DuckDB cell-mean replay; planted uplift; partition invariance."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from featurebox_ray.stages.regress import did_estimate

ORACLE = """
    WITH e AS (SELECT g, a, CAST(t AS BIGINT) AS t,
                      CAST(round(coalesce(v, 0) * 100) AS BIGINT)
                        AS y
               FROM tab WHERE g IS NOT NULL AND a IS NOT NULL
                 AND t IS NOT NULL),
    b AS (SELECT min(t) AS mn, max(t) AS mx FROM e),
    c AS (SELECT mn + (mx - mn) * 4 // 5 AS cut FROM b),
    s AS (SELECT g, a, CASE WHEN t >= (SELECT cut FROM c)
                            THEN 1 ELSE 0 END AS post, y FROM e),
    m AS (SELECT g,
              CAST(sum(CASE WHEN a=1 AND post=0 THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_t_pre,
              CAST(sum(CASE WHEN a=1 AND post=1 THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_t_post,
              CAST(sum(CASE WHEN a=0 AND post=0 THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_c_pre,
              CAST(sum(CASE WHEN a=0 AND post=1 THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_c_post,
              CAST(sum(CASE WHEN a=1 AND post=0 THEN y END)
                   AS BIGINT) AS s_t_pre,
              CAST(sum(CASE WHEN a=1 AND post=1 THEN y END)
                   AS BIGINT) AS s_t_post,
              CAST(sum(CASE WHEN a=0 AND post=0 THEN y END)
                   AS BIGINT) AS s_c_pre,
              CAST(sum(CASE WHEN a=0 AND post=1 THEN y END)
                   AS BIGINT) AS s_c_post
          FROM s GROUP BY g)
    SELECT g, n_t_pre, n_t_post, n_c_pre, n_c_post,
           CASE WHEN n_t_pre = 0 OR n_t_post = 0 OR n_c_pre = 0
                  OR n_c_post = 0 THEN NULL
                ELSE (CAST(s_t_post AS DOUBLE)
                        / CAST(n_t_post AS DOUBLE)
                      - CAST(s_t_pre AS DOUBLE)
                        / CAST(n_t_pre AS DOUBLE))
                     - (CAST(s_c_post AS DOUBLE)
                          / CAST(n_c_post AS DOUBLE)
                        - CAST(s_c_pre AS DOUBLE)
                          / CAST(n_c_pre AS DOUBLE))
           END AS did
    FROM m ORDER BY g
"""


def test_did_duckdb_fuzz_partition_invariant():
    rng = np.random.default_rng(557)
    n = 2500
    g = [None if rng.random() < 0.02
         else f"g{rng.integers(0, 4)}" for _ in range(n)]
    a = [None if rng.random() < 0.02 else int(rng.integers(0, 2))
         for _ in range(n)]
    t_ = [None if rng.random() < 0.02
          else int(rng.integers(0, 10 ** 6)) for _ in range(n)]
    v = [None if rng.random() < 0.03
         else round(float(rng.normal(10, 3)), 2) for _ in range(n)]
    pdf = pd.DataFrame({"g": g, "a": a, "t": t_, "v": v})
    con = duckdb.connect()
    con.register("tab", pdf)
    exp = con.sql(ORACLE).df().reset_index(drop=True)
    t = pa.table({"g": pa.array(g, pa.string()),
                  "a": pa.array(a, pa.int64()),
                  "t": pa.array(t_, pa.int64()),
                  "v": pa.array(v, pa.float64())})
    prev = None
    for parts in (1, 10):
        ds = ray.data.from_arrow(t)
        if parts > 1:
            ds = ds.repartition(parts)
        got = (did_estimate(ds, group_col="g", side_col="a",
                            ts_col="t", value_col="v")
               .to_pandas().sort_values("g").reset_index(drop=True))
        pd.testing.assert_frame_equal(
            got.astype(exp.dtypes.to_dict()), exp, check_exact=True)
        if prev is not None:
            assert got.equals(prev)
        prev = got


def test_did_planted_uplift():
    # control flat at 1.00; treatment 1.00 pre, 3.00 post
    # -> did = +200 cents
    rows = []
    for a in (0, 1):
        for t_ in (0, 100):
            for _ in range(5):
                v = 1.0 if (a == 0 or t_ == 0) else 3.0
                rows.append(("x", a, t_, v))
    t = pa.table({"g": [r[0] for r in rows],
                  "a": pa.array([r[1] for r in rows], pa.int64()),
                  "t": pa.array([r[2] for r in rows], pa.int64()),
                  "v": pa.array([r[3] for r in rows], pa.float64())})
    got = did_estimate(ray.data.from_arrow(t), group_col="g",
                       side_col="a", ts_col="t",
                       value_col="v").to_pandas()
    assert got.iloc[0]["did"] == 200.0
