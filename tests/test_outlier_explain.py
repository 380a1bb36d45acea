"""Outlier explanation (stages/cohesion.py:outlier_explanation) vs a
DuckDB unnest replay; planted-outlier sanity; partition invariance."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from featurebox_ray.stages.cohesion import outlier_explanation

ORACLE = """
    WITH x AS (
      SELECT vid, i,
             CAST(floor(CAST(emb[i] AS DOUBLE) * 1024 + 0.5)
                  AS BIGINT) AS qx
      FROM t, unnest(range(1, len(emb) + 1)) AS r(i)
      WHERE vid IS NOT NULL AND emb IS NOT NULL
    ), s AS (
      SELECT i, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(qx) AS BIGINT) AS sv,
             CAST(sum(qx * qx) AS BIGINT) AS qv
      FROM x GROUP BY i
    ), z AS (
      SELECT x.vid, x.i,
             CAST(abs(s.n * x.qx - s.sv) AS DOUBLE)
               / sqrt(CAST(s.n * s.qv - s.sv * s.sv AS DOUBLE)) AS z
      FROM x JOIN s ON x.i = s.i
      WHERE s.n * s.qv - s.sv * s.sv > 0
    )
    SELECT vid, i AS dim, z FROM z
    QUALIFY row_number() OVER (
      PARTITION BY vid ORDER BY z DESC, i ASC) = 1
    ORDER BY vid
"""


def test_outlier_explain_duckdb_partition_invariant():
    rng = np.random.default_rng(286)
    n, d = 800, 6
    x = rng.normal(0, 1, (n, d)).astype(np.float32)
    x[:, 3] = 0.0                      # constant dim -> excluded
    x[7, 2] += 9.0                     # planted outlier on dim 3(1b)
    vecs = [row.tolist() for row in x]
    vecs[5] = None
    ids = [None if i == 9 else i for i in range(n)]
    pdf = pd.DataFrame({
        "vid": pd.array(ids, dtype="Int64"),
        "emb": [None if v is None else np.asarray(v, np.float32)
                for v in vecs]})
    con = duckdb.connect()
    con.register("t", pdf)
    exp = con.sql(ORACLE).df().reset_index(drop=True)
    assert int(exp.loc[exp.vid == 7, "dim"].iloc[0]) == 3
    assert (exp.dim != 4).all()        # constant dim never wins
    t = pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array(vecs, pa.list_(pa.float32()))})
    prev = None
    for parts in (1, 5):
        ds = ray.data.from_arrow(t)
        if parts > 1:
            ds = ds.repartition(parts)
        got = (outlier_explanation(ds, quant_bits=10).to_pandas()
               .sort_values("vec_id").reset_index(drop=True)
               .rename(columns={"vec_id": "vid"}))
        pd.testing.assert_frame_equal(
            got.astype(exp.dtypes.to_dict()), exp)
        if prev is not None:
            assert got.equals(prev)
        prev = got
