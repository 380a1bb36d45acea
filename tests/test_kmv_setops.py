"""KMV set algebra (stages/sketch.py:kmv_set_ops) vs a DuckDB sketch
replay; unsaturated-sketch exactness; partition invariance."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from featurebox_ray.stages.sketch import kmv_set_ops

ORACLE = """
    WITH h AS (
      SELECT DISTINCT g,
             CAST(CAST('0x' || substr(md5(CAST(v AS VARCHAR)),
                                      1, 15) AS UBIGINT) AS BIGINT)
               AS hv
      FROM t WHERE g IN ('A', 'B') AND v IS NOT NULL),
    sa AS (SELECT hv FROM h WHERE g = 'A' ORDER BY hv LIMIT {k}),
    sb AS (SELECT hv FROM h WHERE g = 'B' ORDER BY hv LIMIT {k}),
    su AS (SELECT DISTINCT hv FROM (SELECT hv FROM sa
                                    UNION SELECT hv FROM sb)
           ORDER BY hv LIMIT {k}),
    stats AS (
      SELECT (SELECT count(*) FROM sa) AS ka,
             (SELECT max(hv) FROM sa) AS kth_a,
             (SELECT count(*) FROM sb) AS kb,
             (SELECT max(hv) FROM sb) AS kth_b,
             (SELECT count(*) FROM su) AS ku,
             (SELECT max(hv) FROM su) AS kth_u,
             (SELECT count(*) FROM su
              WHERE hv IN (SELECT hv FROM sa)
                AND hv IN (SELECT hv FROM sb)) AS nboth)
    SELECT 'A' AS group_a, 'B' AS group_b,
           CAST(ka AS BIGINT) AS k_used_a,
           CAST(kb AS BIGINT) AS k_used_b,
           CAST(ku AS BIGINT) AS k_used_union,
           CASE WHEN ka < {k} THEN CAST(ka AS DOUBLE)
                ELSE ({k} - 1) * 1152921504606846976.0
                     / CAST(kth_a AS DOUBLE) END AS est_a,
           CASE WHEN kb < {k} THEN CAST(kb AS DOUBLE)
                ELSE ({k} - 1) * 1152921504606846976.0
                     / CAST(kth_b AS DOUBLE) END AS est_b,
           CASE WHEN ku < {k} THEN CAST(ku AS DOUBLE)
                ELSE ({k} - 1) * 1152921504606846976.0
                     / CAST(kth_u AS DOUBLE) END AS est_union,
           CAST(nboth AS DOUBLE) / CAST(ku AS DOUBLE) AS jaccard_k,
           (CAST(nboth AS DOUBLE) / CAST(ku AS DOUBLE))
             * (CASE WHEN ku < {k} THEN CAST(ku AS DOUBLE)
                     ELSE ({k} - 1) * 1152921504606846976.0
                          / CAST(kth_u AS DOUBLE) END)
             AS est_intersection
    FROM stats
"""


def test_kmv_setops_duckdb_fuzz_partition_invariant():
    rng = np.random.default_rng(569)
    n = 4000
    g = [str(x) for x in rng.choice(["A", "B", "C"], n)]
    # overlapping value universes so the intersection is non-trivial
    v = [None if rng.random() < 0.02
         else int(rng.integers(0, 600)
                  + (0 if gg == "A" else 200)) for gg in g]
    t = pa.table({"g": pa.array(g, pa.string()),
                  "v": pa.array(v, pa.int64())})
    # register the ARROW table: pandas would lift v to float64 and
    # DuckDB would then stringify "123.0" vs the engine's "123"
    con = duckdb.connect()
    con.register("t", t)
    k = 64
    exp = con.sql(ORACLE.format(k=k)).df().reset_index(drop=True)
    prev = None
    for parts in (1, 10):
        ds = ray.data.from_arrow(t)
        if parts > 1:
            ds = ds.repartition(parts)
        got = (kmv_set_ops(ds, group_col="g", value_col="v",
                           group_a="A", group_b="B", k=k)
               .to_pandas().reset_index(drop=True))
        pd.testing.assert_frame_equal(
            got.astype(exp.dtypes.to_dict()), exp, check_exact=True)
        if prev is not None:
            assert got.equals(prev)
        prev = got


def test_kmv_setops_unsaturated_exact():
    # fewer distincts than k: estimates are EXACT counts and the
    # intersection estimate is exactly right
    t = pa.table({"g": ["A"] * 4 + ["B"] * 3,
                  "v": pa.array([1, 2, 3, 4, 3, 4, 5], pa.int64())})
    got = kmv_set_ops(ray.data.from_arrow(t), group_col="g",
                      value_col="v", group_a="A", group_b="B",
                      k=64).to_pandas().iloc[0]
    assert got["est_a"] == 4.0
    assert got["est_b"] == 3.0
    assert got["est_union"] == 5.0
    assert got["est_intersection"] == (2.0 / 5.0) * 5.0
