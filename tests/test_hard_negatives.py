"""Hard-negative mining (stages/ann.py:hard_negatives) vs a DuckDB
all-pairs replay; cross-catalog mode; planted-geometry sanity."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from featurebox_ray.stages.ann import hard_negatives

ORACLE = """
    WITH c AS (
      SELECT id, lab, i,
             CAST(floor(CAST(v[i] AS DOUBLE) * 256 + 0.5) AS BIGINT)
               AS xq
      FROM t, unnest(range(1, len(v) + 1)) r(i)
      WHERE lab IS NOT NULL
    ), d AS (
      SELECT a.id AS vec_id, a.lab AS label, b.id AS neg_id,
             b.lab AS neg_label,
             CAST(sum(a.xq * b.xq) AS BIGINT) AS dot
      FROM c a JOIN c b ON a.i = b.i AND a.lab <> b.lab
                       AND a.id <> b.id
      GROUP BY 1, 2, 3, 4
    )
    SELECT vec_id, label, neg_id, neg_label, dot FROM d
    QUALIFY row_number() OVER (PARTITION BY vec_id
                               ORDER BY dot DESC, neg_id) = 1
    ORDER BY vec_id
"""


def _emb_table(seed=109, n=150, d=8):
    rng = np.random.default_rng(seed)
    vecs = rng.normal(size=(n, d)).astype(np.float32)
    labs = rng.integers(0, 4, n).astype(object)
    for i in rng.choice(n, 5, replace=False):
        labs[i] = None
    return vecs, labs


def test_hard_negatives_duckdb_fuzz_partition_invariant():
    vecs, labs = _emb_table()
    n = len(vecs)
    pdf = pd.DataFrame({"id": range(n),
                        "lab": pd.array(labs, dtype="Int64"),
                        "v": [list(map(float, r)) for r in vecs]})
    con = duckdb.connect()
    con.register("t", pdf)
    exp = con.sql(ORACLE).df().reset_index(drop=True)
    t = pa.table({
        "id": pa.array(range(n), pa.int64()),
        "lab": pa.array(pd.array(labs, dtype="Int64")),
        "v": pa.array([list(map(float, r)) for r in vecs],
                      pa.list_(pa.float32())),
    })
    prev = None
    for parts in (1, 5):
        ds = ray.data.from_arrow(t)
        if parts > 1:
            ds = ds.repartition(parts)
        got = (hard_negatives(ds, vec_col="v", id_col="id",
                              label_col="lab", quant_bits=8)
               .to_pandas().sort_values("id")
               .rename(columns={"id": "vec_id"})
               .reset_index(drop=True))
        pd.testing.assert_frame_equal(got.astype(exp.dtypes.to_dict()),
                                      exp, check_exact=True)
        if prev is not None:
            assert got.equals(prev)
        prev = got


def test_hard_negatives_planted_geometry():
    # class 0 near e1, class 1 near e1 too (hard), class 2 near e2
    # (easy): negatives of class-0 points must come from class 1
    vecs = np.array([[1.0, 0.0], [0.99, 0.1], [0.98, 0.05],
                     [0.0, 1.0]], np.float64)
    labs = [0, 1, 1, 2]
    t = pa.table({"vec_id": pa.array(range(4), pa.int64()),
                  "embedding": pa.array([list(r) for r in vecs],
                                        pa.list_(pa.float32())),
                  "label": pa.array(labs, pa.int64())})
    got = (hard_negatives(ray.data.from_arrow(t), quant_bits=8)
           .to_pandas().sort_values("vec_id"))
    assert got.loc[got.vec_id == 0, "neg_label"].item() == 1
    assert got.loc[got.vec_id == 3, "neg_id"].item() in (0, 1, 2)


def test_hard_negatives_cross_catalog():
    # queries mined against a SEPARATE catalog (train-vs-bank shape)
    cat = pa.table({"vec_id": pa.array([10, 11], pa.int64()),
                    "embedding": pa.array([[1.0, 0.0], [0.0, 1.0]],
                                          pa.list_(pa.float32())),
                    "label": pa.array([0, 1], pa.int64())})
    qry = pa.table({"vec_id": pa.array([1], pa.int64()),
                    "embedding": pa.array([[1.0, 0.1]],
                                          pa.list_(pa.float32())),
                    "label": pa.array([0], pa.int64())})
    got = hard_negatives(ray.data.from_arrow(qry),
                         ray.data.from_arrow(cat)).to_pandas()
    # only the different-label catalog row qualifies
    assert got.neg_id.tolist() == [11]


PROTO_ORACLE = """
    WITH c AS (
      SELECT lab, i,
             CAST(floor(CAST(v[i] AS DOUBLE) * 256 + 0.5) AS BIGINT)
               AS xq
      FROM t, unnest(range(1, len(v) + 1)) r(i)
      WHERE lab IS NOT NULL AND v IS NOT NULL)
    SELECT CAST(lab AS BIGINT) AS label, i AS dim,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(xq) AS BIGINT) AS sum_q,
           CAST(sum(xq) AS DOUBLE) / CAST(count(*) AS DOUBLE) / 256.0
             AS mean
    FROM c GROUP BY lab, i ORDER BY label, dim
"""


def test_label_prototypes_duckdb_fuzz_partition_invariant():
    from featurebox_ray.stages.cohesion import label_prototypes

    vecs, labs = _emb_table(seed=173, n=200, d=5)
    n = len(vecs)
    pdf = pd.DataFrame({"lab": pd.array(labs, dtype="Int64"),
                        "v": [list(map(float, r)) for r in vecs]})
    con = duckdb.connect()
    con.register("t", pdf)
    exp = con.sql(PROTO_ORACLE).df().reset_index(drop=True)
    t = pa.table({
        "label": pa.array(pd.array(labs, dtype="Int64")),
        "embedding": pa.array([list(map(float, r)) for r in vecs],
                              pa.list_(pa.float32())),
    })
    prev = None
    for parts in (1, 5):
        ds = ray.data.from_arrow(t)
        if parts > 1:
            ds = ds.repartition(parts)
        got = (label_prototypes(ds, quant_bits=8, num_partitions=3)
               .to_pandas().sort_values(["label", "dim"])
               .reset_index(drop=True))
        pd.testing.assert_frame_equal(got.astype(exp.dtypes.to_dict()),
                                      exp, check_exact=True)
        if prev is not None:
            assert got.equals(prev)
        prev = got


def test_label_prototypes_hand_case():
    from featurebox_ray.stages.cohesion import label_prototypes

    t = pa.table({"label": pa.array([0, 0, 1], pa.int64()),
                  "embedding": pa.array([[1.0, 0.0], [0.0, 1.0],
                                         [2.0, 2.0]],
                                        pa.list_(pa.float32()))})
    got = (label_prototypes(ray.data.from_arrow(t), quant_bits=8)
           .to_pandas().sort_values(["label", "dim"]))
    assert got["mean"].tolist() == [0.5, 0.5, 2.0, 2.0]
    assert got.n.tolist() == [2, 2, 1, 1]
