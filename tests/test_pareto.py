"""Pareto frontier (stages/rank.py:pareto_front) vs a DuckDB
NOT EXISTS anti-join replay; hand-checked frontier; partition
invariance."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from featurebox_ray.stages.rank import pareto_front

ORACLE = """
    WITH e AS (SELECT g, id, x, y FROM t
               WHERE g IS NOT NULL AND id IS NOT NULL
                 AND x IS NOT NULL AND y IS NOT NULL)
    SELECT g, id, x, y FROM e
    WHERE NOT EXISTS (
      SELECT 1 FROM e o
      WHERE o.g = e.g AND o.x >= e.x AND o.y >= e.y
        AND (o.x > e.x OR o.y > e.y))
    ORDER BY g, id
"""


def test_pareto_duckdb_fuzz_partition_invariant():
    rng = np.random.default_rng(541)
    n = 1200
    g = [None if rng.random() < 0.02
         else f"g{rng.integers(0, 5)}" for _ in range(n)]
    ids = rng.permutation(n * 2)[:n]
    # coarse grid so ties and duplicate points occur
    x = [None if rng.random() < 0.02
         else int(rng.integers(0, 25)) for _ in range(n)]
    y = [None if rng.random() < 0.02
         else int(rng.integers(0, 25)) for _ in range(n)]
    pdf = pd.DataFrame({"g": g, "id": ids, "x": x, "y": y})
    con = duckdb.connect()
    con.register("t", pdf)
    exp = con.sql(ORACLE).df().reset_index(drop=True)
    t = pa.table({"g": pa.array(g, pa.string()),
                  "id": pa.array(ids, pa.int64()),
                  "x": pa.array(x, pa.int64()),
                  "y": pa.array(y, pa.int64())})
    prev = None
    for parts in (1, 9):
        ds = ray.data.from_arrow(t)
        if parts > 1:
            ds = ds.repartition(parts)
        got = (pareto_front(ds, group_col="g", id_col="id",
                            x_col="x", y_col="y", num_partitions=4)
               .to_pandas().sort_values(["g", "id"])
               .reset_index(drop=True))
        pd.testing.assert_frame_equal(
            got.astype(exp.dtypes.to_dict()), exp, check_exact=True)
        if prev is not None:
            assert got.equals(prev)
        prev = got


def test_pareto_hand_checked():
    # frontier of {(1,5), (3,3), (5,1)}; (2,2) dominated by (3,3);
    # duplicate frontier points both kept; (3,2) dominated by same-x
    # (3,3)
    t = pa.table({"g": ["a"] * 6,
                  "id": [1, 2, 3, 4, 5, 6],
                  "x": [1, 3, 5, 2, 3, 3],
                  "y": [5, 3, 1, 2, 3, 2]})
    got = (pareto_front(ray.data.from_arrow(t), group_col="g",
                        id_col="id", x_col="x", y_col="y")
           .to_pandas().sort_values("id"))
    assert got["id"].tolist() == [1, 2, 3, 5]
