"""Budgeted corpus selection (stages/rank.py:budget_select) vs a
DuckDB window-sum replay."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray

from featurebox_ray.stages.rank import budget_select

ORACLE = """
    WITH c AS (SELECT id, score, cost,
                      sum(cost) OVER (ORDER BY score DESC, neg_id DESC
                                      ROWS UNBOUNDED PRECEDING) AS cum
               FROM t)
    SELECT id, score, cost, CAST(cum AS BIGINT) AS cum_cost
    FROM c WHERE cum <= {b} ORDER BY id
"""


def _table(seed=79, n=400):
    rng = np.random.default_rng(seed)
    return pa.table({
        "id": pa.array(range(n), pa.int64()),
        # heavy score ties exercise the deterministic boundary
        "score": pa.array(rng.integers(0, 12, n), pa.int64()),
        "cost": pa.array(rng.integers(0, 50, n), pa.int64()),
        "neg_id": pa.array(-np.arange(n), pa.int64()),
    })


@pytest.mark.parametrize("budget", [0, 700, 10**9])
def test_budget_select_duckdb_fuzz(budget):
    t = _table()
    con = duckdb.connect()
    con.register("t", t.to_pandas())
    exp = con.sql(ORACLE.format(b=budget)).df().reset_index(drop=True)
    prev = None
    for parts in (1, 8):
        ds = ray.data.from_arrow(t)
        if parts > 1:
            ds = ds.repartition(parts)
        got = (budget_select(ds, order_cols=["score", "neg_id"],
                             cost_col="cost", budget=budget,
                             descending=True).to_pandas())
        if len(exp) == 0:
            # filter-all: Ray drops the schema of an empty dataset
            assert len(got) == 0
            continue
        got = (got.sort_values("id").reset_index(drop=True)
               [["id", "score", "cost", "cum_cost"]])
        pd.testing.assert_frame_equal(got.astype(exp.dtypes.to_dict()),
                                      exp)
        if prev is not None:
            assert got.equals(prev)
        prev = got
    if budget >= 10**9:
        assert len(got) == t.num_rows   # everything fits


def test_budget_select_negative_cost_raises():
    t = pa.table({"id": pa.array([1, 2], pa.int64()),
                  "cost": pa.array([5, -1], pa.int64())})
    with pytest.raises(Exception, match="negative cost"):
        budget_select(ray.data.from_arrow(t), order_cols=["id"],
                      cost_col="cost", budget=10,
                      descending=False).to_pandas()
