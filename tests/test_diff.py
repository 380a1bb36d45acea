"""Snapshot diff (stages/diff.py)."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest
import ray

from featurebox_ray.stages.diff import snapshot_diff


def _sides(rng, n=200):
    ids = np.arange(n)
    txt = [f"doc {i} body" for i in ids]
    old = pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array([None if i % 19 == 0 else txt[i]
                          for i in ids], pa.string()),
        "lang": pa.array(["en"] * n),
    })
    # new: drop %17, change %13 text, null-flip %23 lang, add n..n+9
    keep = ids[ids % 17 != 0]
    new = pa.table({
        "doc_id": pa.array(np.concatenate([keep, np.arange(n, n + 10)]),
                           pa.int64()),
        "text": pa.array(
            [("CHANGED" if i % 13 == 0 else
              (None if i % 19 == 0 else txt[i])) for i in keep]
            + [f"new {j}" for j in range(10)], pa.string()),
        "lang": pa.array([None if i % 23 == 0 else "en" for i in keep]
                         + ["en"] * 10, pa.string()),
    })
    return old, new


def test_snapshot_diff_duckdb_fuzz():
    rng = np.random.default_rng(3)
    old, new = _sides(rng)
    con = duckdb.connect()
    con.register("o", old)
    con.register("n", new)
    want = con.execute("""
        SELECT * FROM (
          SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
                 CASE WHEN o.doc_id IS NULL THEN 'added'
                      WHEN n.doc_id IS NULL THEN 'removed'
                      WHEN o.text IS DISTINCT FROM n.text
                        OR o.lang IS DISTINCT FROM n.lang THEN 'changed'
                 END AS status
          FROM o FULL JOIN n ON o.doc_id = n.doc_id
        ) WHERE status IS NOT NULL
        ORDER BY doc_id
    """).fetch_arrow_table()
    for po, pn, parts in ((1, 1, 2), (4, 3, 5), (7, 2, 9)):
        got = (snapshot_diff(
            ray.data.from_arrow(old).repartition(po),
            ray.data.from_arrow(new).repartition(pn),
            id_col="doc_id", cmp_cols=["text", "lang"],
            num_partitions=parts)
            .to_pandas().sort_values("doc_id").reset_index(drop=True))
        assert got["doc_id"].tolist() == want["doc_id"].to_pylist()
        assert got["status"].tolist() == want["status"].to_pylist()


def test_snapshot_diff_null_equality_is_unchanged():
    old = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                    "text": pa.array([None, "x"], pa.string())})
    new = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                    "text": pa.array([None, None], pa.string())})
    got = snapshot_diff(ray.data.from_arrow(old),
                        ray.data.from_arrow(new),
                        id_col="doc_id", cmp_cols=["text"]).to_pandas()
    # id 1: NULL == NULL -> unchanged (no row); id 2: x -> NULL changed
    assert got["doc_id"].tolist() == [2]
    assert got["status"].tolist() == ["changed"]


def test_snapshot_diff_duplicate_and_null_id_guards():
    dup = pa.table({"doc_id": pa.array([1, 1], pa.int64()),
                    "text": pa.array(["a", "b"], pa.string())})
    ok = pa.table({"doc_id": pa.array([1], pa.int64()),
                   "text": pa.array(["a"], pa.string())})
    with pytest.raises(Exception, match="unique"):
        snapshot_diff(ray.data.from_arrow(dup), ray.data.from_arrow(ok),
                      id_col="doc_id", cmp_cols=["text"]).to_pandas()
    withnull = pa.table({"doc_id": pa.array([None], pa.int64()),
                         "text": pa.array(["a"], pa.string())})
    with pytest.raises(Exception, match="non-null"):
        snapshot_diff(ray.data.from_arrow(withnull),
                      ray.data.from_arrow(ok),
                      id_col="doc_id", cmp_cols=["text"]).to_pandas()


def test_snapshot_diff_identical_sides_empty():
    t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "text": pa.array(["a", None, "c"], pa.string())})
    got = snapshot_diff(ray.data.from_arrow(t), ray.data.from_arrow(t),
                        id_col="doc_id", cmp_cols=["text"])
    assert got.count() == 0


def test_category_drift_duckdb_fuzz():
    from featurebox_ray.stages.diff import category_drift

    rng = np.random.default_rng(101)
    cats = np.array(["en", "de", "fr", "es"])
    old = pa.table({"lang": pa.array(
        [None if i % 19 == 0 else cats[v] for i, v in
         enumerate(rng.integers(0, 4, 300))], pa.string())})
    new = pa.table({"lang": pa.array(
        [None if i % 23 == 0 else cats[v] for i, v in
         enumerate(rng.integers(0, 3, 200))], pa.string())})  # no 'es'
    con = duckdb.connect()
    con.register("o", old)
    con.register("n", new)
    want = con.execute("""
        WITH oc AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_old
                    FROM o GROUP BY lang),
        nc AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_new
               FROM n GROUP BY lang),
        j AS (SELECT coalesce(oc.lang, nc.lang) AS lang,
                     coalesce(n_old, 0) AS n_old,
                     coalesce(n_new, 0) AS n_new
              FROM oc FULL JOIN nc ON oc.lang IS NOT DISTINCT FROM
                                      nc.lang)
        SELECT lang, n_old, n_new,
               CAST(n_old AS DOUBLE)
                 / (SELECT CAST(count(*) AS DOUBLE) FROM o)
                   AS share_old,
               CAST(n_new AS DOUBLE)
                 / (SELECT CAST(count(*) AS DOUBLE) FROM n)
                   AS share_new
        FROM j ORDER BY lang NULLS FIRST
    """).fetch_arrow_table()
    for po, pn, parts in ((1, 1, 2), (4, 3, 5)):
        got = (category_drift(ray.data.from_arrow(old).repartition(po),
                              ray.data.from_arrow(new).repartition(pn),
                              col="lang", num_partitions=parts)
               .to_pandas().sort_values("lang", na_position="first")
               .reset_index(drop=True))
        assert len(got) == want.num_rows
        for c in ("n_old", "n_new", "share_old", "share_new"):
            gv = [None if isinstance(v, float) and v != v else v
                  for v in got[c].tolist()]
            assert gv == want[c].to_pylist(), (c, po, pn, parts)
