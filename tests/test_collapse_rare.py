"""Rare-category collapsing (stages/encode.py:collapse_rare) vs a
DuckDB count-CTE replay."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from featurebox_ray.stages.encode import collapse_rare

ORACLE = """
    WITH c AS (SELECT cat, count(*) AS n FROM t
               WHERE cat IS NOT NULL GROUP BY cat)
    SELECT t.id, t.cat,
           CASE WHEN t.cat IS NULL THEN NULL
                WHEN c.n >= 5 THEN t.cat ELSE '__other__' END AS cat_rc
    FROM t LEFT JOIN c USING (cat) ORDER BY t.id
"""


def test_collapse_rare_duckdb_fuzz_partition_invariant():
    rng = np.random.default_rng(83)
    n = 600
    # zipf-ish: a few huge categories, a long rare tail, some nulls
    cats = [f"c{min(int(rng.zipf(1.6)), 40)}" for _ in range(n)]
    cats = [None if rng.random() < 0.04 else c for c in cats]
    t = pa.table({"id": pa.array(range(n), pa.int64()),
                  "cat": pa.array(cats, pa.string())})
    con = duckdb.connect()
    con.register("t", t.to_pandas())
    exp = con.sql(ORACLE).df().reset_index(drop=True)
    prev = None
    for parts in (1, 7):
        ds = ray.data.from_arrow(t)
        if parts > 1:
            ds = ds.repartition(parts)
        got = (collapse_rare(ds, col="cat", min_count=5)
               .to_pandas().sort_values("id").reset_index(drop=True))
        pd.testing.assert_frame_equal(got.astype(exp.dtypes.to_dict()),
                                      exp)
        if prev is not None:
            assert got.equals(prev)
        prev = got
    # both the sentinel and survivors exist in the fuzz corpus
    assert (got.cat_rc == "__other__").any()
    assert (got.cat_rc.dropna() != "__other__").any()
    # nulls stay null
    assert got.loc[got.cat.isna(), "cat_rc"].isna().all()


def test_collapse_rare_custom_sentinel_and_outcol():
    t = pa.table({"id": pa.array([0, 1, 2], pa.int64()),
                  "cat": pa.array(["a", "a", "b"], pa.string())})
    got = (collapse_rare(ray.data.from_arrow(t), col="cat",
                         min_count=2, other="RARE", out_col="o")
           .to_pandas().sort_values("id"))
    assert got.o.tolist() == ["a", "a", "RARE"]
