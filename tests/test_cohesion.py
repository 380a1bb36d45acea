"""Per-group centroid-distance features (stages/cohesion.py)."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest
import ray

from featurebox_ray.stages.cohesion import group_centroid_distance


def _tbl(rng, n=120, dims=8, n_groups=4, with_nulls=True):
    vecs = (rng.random((n, dims), dtype=np.float32) - 0.5).astype(
        np.float32)
    labels = rng.integers(0, n_groups, n)
    return pa.table({
        "vec_id": pa.array(np.arange(n), pa.int64()),
        "embedding": pa.array(
            [None if with_nulls and i % 31 == 0 else v.tolist()
             for i, v in enumerate(vecs)], pa.list_(pa.float32())),
        "label": pa.array([None if with_nulls and i % 29 == 0 else int(v)
                           for i, v in enumerate(labels)], pa.int32()),
    })


def _want_sql(t, qb):
    con = duckdb.connect()
    con.register("embeddings", t)
    return con.execute(f"""
        WITH x AS (
          SELECT vec_id, label, i,
                 CAST(floor(CAST(embedding[i] AS DOUBLE) * {1 << qb}
                            + 0.5) AS HUGEINT) AS xq
          FROM embeddings,
               unnest(range(1, len(embedding) + 1)) AS r(i)
          WHERE label IS NOT NULL AND embedding IS NOT NULL
        ), s AS (
          SELECT label, i, sum(xq) AS sd,
                 count(*) AS n
          FROM x GROUP BY label, i
        )
        SELECT x.vec_id, x.label,
               CAST(any_value(s.n) AS BIGINT) AS n,
               CAST(sum((s.n * x.xq - s.sd) * (s.n * x.xq - s.sd))
                    AS DOUBLE)
                 / CAST(any_value(s.n * s.n) AS DOUBLE)
                 / {float(1 << (2 * qb))} AS dist2
        FROM x JOIN s ON x.label = s.label AND x.i = s.i
        GROUP BY x.vec_id, x.label
        ORDER BY x.vec_id
    """).fetch_arrow_table()


def test_cohesion_matches_duckdb_and_partition_invariant():
    rng = np.random.default_rng(19)
    t = _tbl(rng)
    want = _want_sql(t, qb=8)
    base = None
    for parts in (1, 4, 7):
        got = (group_centroid_distance(
            ray.data.from_arrow(t).repartition(parts), quant_bits=8)
            .to_pandas().sort_values("vec_id").reset_index(drop=True))
        assert got["vec_id"].tolist() == want["vec_id"].to_pylist()
        assert got["n"].tolist() == want["n"].to_pylist()
        # bit-exact: integer sums + two IEEE divisions both sides
        assert got["dist2"].tolist() == want["dist2"].to_pylist()
        if base is None:
            base = got
        else:
            assert np.array_equal(got["dist2"].to_numpy(),
                                  base["dist2"].to_numpy())


def test_cohesion_centroid_zero_distance():
    # identical vectors -> centroid == vector -> dist2 exactly 0
    v = [0.25, -0.5, 0.125]
    t = pa.table({
        "vec_id": pa.array([1, 2, 3], pa.int64()),
        "embedding": pa.array([v, v, v], pa.list_(pa.float32())),
        "label": pa.array([0, 0, 0], pa.int32()),
    })
    got = group_centroid_distance(ray.data.from_arrow(t)).to_pandas()
    assert got["dist2"].tolist() == [0.0, 0.0, 0.0]
    assert got["n"].tolist() == [3, 3, 3]


def test_cohesion_outlier_ranks_highest():
    rng = np.random.default_rng(3)
    base = rng.random((40, 16), dtype=np.float32) * 0.05
    base[7] += 0.9  # planted outlier
    t = pa.table({
        "vec_id": pa.array(np.arange(40), pa.int64()),
        "embedding": pa.array([v.tolist() for v in base],
                              pa.list_(pa.float32())),
        "label": pa.array(np.zeros(40, np.int32)),
    })
    got = (group_centroid_distance(ray.data.from_arrow(t).repartition(3))
           .to_pandas())
    assert got.loc[got["dist2"].idxmax(), "vec_id"] == 7


def test_cohesion_guard():
    t = pa.table({
        "vec_id": pa.array([1, 2], pa.int64()),
        "embedding": pa.array([[1e6] * 4, [-1e6] * 4],
                              pa.list_(pa.float32())),
        "label": pa.array([0, 0], pa.int32()),
    })
    with pytest.raises(Exception, match="quant_bits"):
        group_centroid_distance(ray.data.from_arrow(t),
                                quant_bits=30).to_pandas()


def test_script_profile_matches_duckdb():
    from featurebox_ray.stages.text import script_profile_fn

    texts = ["Hello мир 世界 123  ", "¡Hola! عالم", "", None,
             "abcЖ漢5 \tx", "ONLY LATIN words", "٠١٢ نص عربي"]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    got = (ray.data.from_arrow(t).repartition(3)
           .map_batches(script_profile_fn, batch_format="pyarrow")
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    con = duckdb.connect()
    con.register("d", t)
    want = con.execute(r"""
        SELECT doc_id, length(text) AS sc_n_chars,
               len(regexp_extract_all(text, '\p{Latin}')) AS sc_latin,
               len(regexp_extract_all(text, '\p{Cyrillic}')) AS sc_cyrillic,
               len(regexp_extract_all(text, '\p{Han}')) AS sc_han,
               len(regexp_extract_all(text, '\p{Arabic}')) AS sc_arabic,
               len(regexp_extract_all(text, '[0-9]')) AS sc_digit,
               len(regexp_extract_all(text, '\s')) AS sc_space,
               length(text)
                 - len(regexp_extract_all(text, '\p{Latin}'))
                 - len(regexp_extract_all(text, '\p{Cyrillic}'))
                 - len(regexp_extract_all(text, '\p{Han}'))
                 - len(regexp_extract_all(text, '\p{Arabic}'))
                 - len(regexp_extract_all(text, '[0-9]'))
                 - len(regexp_extract_all(text, '\s')) AS sc_other,
               CASE WHEN length(text) > 0 THEN
                 CAST(len(regexp_extract_all(text, '\p{Latin}'))
                      AS DOUBLE) / CAST(length(text) AS DOUBLE)
               END AS sc_latin_ratio
        FROM d ORDER BY doc_id
    """).fetch_arrow_table()
    for c in want.column_names:
        g = got[c].tolist()
        w = want[c].to_pylist()
        g = [None if isinstance(v, float) and v != v else v for v in g]
        assert g == w, (c, g, w)


def test_cohesion_ragged_embeddings_raise():
    # review fix: ragged lists whose total divides evenly must not
    # silently reshape into garbage distances
    t = pa.table({
        "vec_id": pa.array([1, 2], pa.int64()),
        "embedding": pa.array([[0.1, 0.2], [0.1, 0.2, 0.3, 0.4]],
                              pa.list_(pa.float32())),
        "label": pa.array([0, 0], pa.int32()),
    })
    with pytest.raises(Exception, match="ragged"):
        group_centroid_distance(ray.data.from_arrow(t)).to_pandas()
