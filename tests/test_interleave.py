"""Weighted interleave (stages/sample.py:weighted_interleave) vs a
DuckDB stride-scheduling replay; hand-checked stride pattern;
partition invariance."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from featurebox_ray.stages.sample import weighted_interleave

ORACLE = """
    WITH s AS (SELECT id, src, w FROM t
               WHERE id IS NOT NULL AND src IS NOT NULL),
    r AS (SELECT id, src, w,
                 row_number() OVER (PARTITION BY src ORDER BY id)
                   AS rn
          FROM s),
    p AS (SELECT id, src, rn,
                 CAST(rn AS DOUBLE) / CAST(w AS DOUBLE) AS pos
          FROM r),
    o AS (SELECT *, row_number() OVER (ORDER BY pos, src, id)
                      AS ord
          FROM p)
    SELECT src, id, rn, pos, ord FROM o WHERE ord <= {lim}
    ORDER BY ord
"""


def test_weighted_interleave_duckdb_fuzz_partition_invariant():
    rng = np.random.default_rng(431)
    n = 900
    srcs = [None if rng.random() < 0.02 else f"s{rng.integers(0, 4)}"
            for _ in range(n)]
    ids = rng.permutation(n * 3)[:n]
    wmap = {"s0": 3, "s1": 1, "s2": 2, "s3": 1}
    ws = [wmap.get(s, 1) for s in srcs]
    pdf = pd.DataFrame({"id": ids, "src": srcs, "w": ws})
    con = duckdb.connect()
    con.register("t", pdf)
    exp = con.sql(ORACLE.format(lim=300)).df().reset_index(drop=True)
    t = pa.table({"id": pa.array(ids, pa.int64()),
                  "src": pa.array(srcs, pa.string()),
                  "w": pa.array(ws, pa.int64())})
    prev = None
    for parts in (1, 10):
        ds = ray.data.from_arrow(t)
        if parts > 1:
            ds = ds.repartition(parts)
        got = (weighted_interleave(ds, source_col="src", id_col="id",
                                   weight_col="w", limit=300,
                                   num_partitions=5)
               .to_pandas().sort_values("ord")
               .reset_index(drop=True))[["src", "id", "rn", "pos",
                                         "ord"]]
        pd.testing.assert_frame_equal(
            got.astype(exp.dtypes.to_dict()), exp, check_exact=True)
        if prev is not None:
            assert got.equals(prev)
        prev = got


def test_weighted_interleave_stride_pattern():
    # source a (w=2) should appear twice as often as b (w=1):
    # pos a: .5 1 1.5 2 ...; pos b: 1 2 3 ... -> a a b a a b ...
    t = pa.table({"id": list(range(12)),
                  "src": ["a"] * 6 + ["b"] * 6,
                  "w": [2] * 6 + [1] * 6})
    got = (weighted_interleave(ray.data.from_arrow(t),
                               source_col="src", id_col="id",
                               weight_col="w", limit=9)
           .to_pandas().sort_values("ord"))
    assert got["src"].tolist() == ["a", "a", "b", "a", "a", "b",
                                   "a", "a", "b"]
