"""Linear-interpolation resampling (stages/window.py:resample_linear)
vs a DuckDB grid-join replay; grid-hit and tie semantics."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from featurebox_ray.stages.window import resample_linear

ORACLE = """
    WITH d0 AS (SELECT k, id, t, v FROM ev
                WHERE k IS NOT NULL AND t IS NOT NULL
                  AND v IS NOT NULL),
    d AS (SELECT k, t, v FROM d0
          QUALIFY row_number() OVER (PARTITION BY k, t
                                     ORDER BY id DESC) = 1),
    b AS (SELECT k, min(t) AS lo, max(t) AS hi FROM d GROUP BY k),
    grid AS (SELECT k, unnest(range(((lo + {s} - 1) // {s}) * {s},
                                    (hi // {s}) * {s} + 1, {s})) AS g
             FROM b),
    p AS (SELECT grid.k, grid.g, max(d.t) AS t0 FROM grid
          JOIN d ON d.k = grid.k AND d.t <= grid.g GROUP BY 1, 2),
    nx AS (SELECT grid.k, grid.g, min(d.t) AS t1 FROM grid
           JOIN d ON d.k = grid.k AND d.t > grid.g GROUP BY 1, 2),
    j AS (SELECT p.k, p.g, p.t0, v0.v AS v0, nx.t1, v1.v AS v1
          FROM p JOIN d v0 ON v0.k = p.k AND v0.t = p.t0
          LEFT JOIN nx ON nx.k = p.k AND nx.g = p.g
          LEFT JOIN d v1 ON v1.k = nx.k AND v1.t = nx.t1)
    SELECT k, g, CASE WHEN t0 = g THEN v0
                 ELSE v0 + (v1 - v0) * (CAST(g - t0 AS DOUBLE)
                                        / CAST(t1 - t0 AS DOUBLE)) END
             AS value
    FROM j ORDER BY k, g
"""


def test_resample_duckdb_fuzz_partition_invariant():
    rng = np.random.default_rng(101)
    n, step = 1500, 100
    pdf = pd.DataFrame({
        "id": np.arange(n),
        "k": rng.integers(0, 30, n),
        # duplicate ts within keys to exercise last-write-wins
        "t": rng.integers(0, 5000, n),
        "v": np.round(rng.normal(0, 10, n), 3),
    })
    pdf.loc[rng.choice(n, 8, replace=False), "v"] = np.nan
    con = duckdb.connect()
    con.register("ev", pdf.astype({"v": "float64"}))
    exp = con.sql(ORACLE.format(s=step)).df().reset_index(drop=True)
    t = pa.table({
        "id": pa.array(pdf.id, pa.int64()),
        "k": pa.array(pdf.k, pa.int64()),
        "t": pa.array(pdf.t, pa.int64()),
        "v": pa.array(pdf.v, pa.float64(), from_pandas=True),
    })
    prev = None
    for parts in (1, 6):
        ds = ray.data.from_arrow(t)
        if parts > 1:
            ds = ds.repartition(parts)
        got = (resample_linear(ds, key_col="k", ts_col="t", id_col="id",
                               value_col="v", step=step,
                               num_partitions=4)
               .to_pandas().sort_values(["k", "g"])
               .reset_index(drop=True))
        pd.testing.assert_frame_equal(got.astype(exp.dtypes.to_dict()),
                                      exp, check_exact=True)
        if prev is not None:
            assert got.equals(prev)
        prev = got


def test_resample_hand_case():
    # key 1: points (0, 0.0), (10, 10.0); grid step 4 -> g=0,4,8
    # g=0 exact hit 0.0; g=4 -> 4.0; g=8 -> 8.0
    t = pa.table({"id": pa.array([0, 1], pa.int64()),
                  "k": pa.array([1, 1], pa.int64()),
                  "t": pa.array([0, 10], pa.int64()),
                  "v": pa.array([0.0, 10.0], pa.float64())})
    got = (resample_linear(ray.data.from_arrow(t), key_col="k",
                           ts_col="t", id_col="id", value_col="v",
                           step=4, num_partitions=2)
           .to_pandas().sort_values("g"))
    assert got.g.tolist() == [0, 4, 8]
    assert got.value.tolist() == [0.0, 4.0, 8.0]


def test_resample_tie_last_write_wins():
    # duplicate ts=0: id 1 wins (value 5); grid point 0 returns 5
    t = pa.table({"id": pa.array([0, 1, 2], pa.int64()),
                  "k": pa.array([1, 1, 1], pa.int64()),
                  "t": pa.array([0, 0, 10], pa.int64()),
                  "v": pa.array([99.0, 5.0, 15.0], pa.float64())})
    got = (resample_linear(ray.data.from_arrow(t), key_col="k",
                           ts_col="t", id_col="id", value_col="v",
                           step=5, num_partitions=2)
           .to_pandas().sort_values("g"))
    assert got.g.tolist() == [0, 5, 10]
    assert got.value.tolist() == [5.0, 10.0, 15.0]
