"""Simplified silhouette (stages/cohesion.py:simplified_silhouette)
vs a DuckDB unnest replay; planted-geometry sanity; partition
invariance."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray

from featurebox_ray.stages.cohesion import simplified_silhouette

ORACLE = """
    WITH x AS (
      SELECT vec_id, label, i,
             CAST(floor(CAST(emb[i] AS DOUBLE) * 256 + 0.5)
                  AS HUGEINT) AS xq
      FROM t, unnest(range(1, len(emb) + 1)) AS r(i)
      WHERE label IS NOT NULL AND emb IS NOT NULL
    ), s AS (
      SELECT label AS clabel, i, sum(xq) AS sd, count(*) AS n
      FROM x GROUP BY label, i
    ), d AS (
      SELECT x.vec_id, x.label, s.clabel,
             CAST(sum((s.n * x.xq - s.sd) * (s.n * x.xq - s.sd))
                  AS DOUBLE)
               / CAST(any_value(s.n * s.n) AS DOUBLE)
               / 65536.0 AS dist2,
             CAST(any_value(s.n) AS BIGINT) AS cn
      FROM x JOIN s ON x.i = s.i
      GROUP BY x.vec_id, x.label, s.clabel
    ), ab AS (
      SELECT vec_id, label,
             max(CASE WHEN clabel = label THEN dist2 END) AS a,
             max(CASE WHEN clabel = label THEN cn END) AS n,
             min(CASE WHEN clabel <> label THEN dist2 END) AS b
      FROM d GROUP BY vec_id, label
    )
    SELECT vec_id, label, n, a, b,
           CASE WHEN greatest(a, b) = 0 THEN 0.0
                ELSE (b - a) / greatest(a, b) END AS sil
    FROM ab ORDER BY vec_id
"""


def test_silhouette_duckdb_fuzz_partition_invariant():
    rng = np.random.default_rng(443)
    n, dims = 300, 6
    labels = [None if rng.random() < 0.03
              else int(rng.integers(0, 4)) for _ in range(n)]
    centers = rng.normal(size=(4, dims))
    vecs = [None if rng.random() < 0.02 else
            (centers[l if l is not None else 0]
             + 0.3 * rng.normal(size=dims)).astype(np.float32)
            for l in labels]
    pdf = pd.DataFrame({
        "vec_id": range(n), "label": labels,
        "emb": [None if v is None else list(map(float, v))
                for v in vecs]})
    con = duckdb.connect()
    con.register("t", pdf)
    exp = con.sql(ORACLE).df().reset_index(drop=True)
    t = pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "label": pa.array(labels, pa.int32()),
        "emb": pa.array([None if v is None else list(v)
                         for v in vecs], pa.list_(pa.float32()))})
    prev = None
    for parts in (1, 7):
        ds = ray.data.from_arrow(t)
        if parts > 1:
            ds = ds.repartition(parts)
        got = (simplified_silhouette(ds, vec_col="emb",
                                     id_col="vec_id",
                                     group_col="label",
                                     quant_bits=8)
               .to_pandas().sort_values("vec_id")
               .reset_index(drop=True))
        pd.testing.assert_frame_equal(
            got.astype(exp.dtypes.to_dict()), exp, check_exact=True)
        if prev is not None:
            assert got.equals(prev)
        prev = got


def test_silhouette_planted_geometry():
    # two tight, well-separated clusters: sil ~ 1 everywhere;
    # one point planted ON the other centroid: sil = -1
    t = pa.table({
        "vec_id": [1, 2, 3, 4, 5],
        "label": [0, 0, 1, 1, 0],
        "emb": pa.array([[0.0, 0.0], [0.0, 0.0],
                         [1.0, 1.0], [1.0, 1.0],
                         [1.0, 1.0]], pa.list_(pa.float32()))})
    got = (simplified_silhouette(ray.data.from_arrow(t),
                                 vec_col="emb", id_col="vec_id",
                                 group_col="label")
           .to_pandas().set_index("vec_id"))
    # own centroid of label 0 = (1/3, 1/3); point 5 sits exactly on
    # label-1's centroid -> b = 0 < a -> sil = -1
    assert got.loc[5, "sil"] == -1.0
    assert got.loc[3, "sil"] > 0.9
    assert got.loc[1, "sil"] > 0.5


def test_silhouette_single_group_raises():
    t = pa.table({"vec_id": [1, 2], "label": [0, 0],
                  "emb": pa.array([[0.0], [1.0]],
                                  pa.list_(pa.float32()))})
    with pytest.raises(ValueError, match=">= 2 groups"):
        simplified_silhouette(ray.data.from_arrow(t), vec_col="emb",
                              id_col="vec_id", group_col="label")
