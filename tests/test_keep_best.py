"""Keep-best exact dedup (stages/dedup.py:keep_best_dedup) — planted
duplicates and DuckDB parity."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from featurebox_ray.stages.dedup import keep_best_dedup


def _run(t, parts=1):
    ds = ray.data.from_arrow(t)
    if parts > 1:
        ds = ds.repartition(parts)
    return (keep_best_dedup(ds, text_col="text", id_col="doc_id",
                            score_col="score", num_partitions=4)
            .to_pandas().sort_values("doc_id").reset_index(drop=True))


def test_keep_best_planted():
    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5, 6, 7], pa.int64()),
        "text": pa.array(["dup", "dup", "dup", "uniq", None, None,
                          "tie"], pa.string()),
        "score": pa.array([10, 30, 30, 1, 5, None, None], pa.int64()),
    })
    got = _run(t, 2)
    # max score wins (30), tie -> min id (2); nulls all kept;
    # null score kept when it is the only row of its text
    assert got.doc_id.tolist() == [2, 4, 5, 6, 7]
    assert got.loc[got.doc_id == 2, "score"].item() == 30


def test_keep_best_duckdb_fuzz():
    rng = np.random.default_rng(83)
    n = 400
    texts = [None if rng.random() < 0.05
             else f"t{rng.integers(0, 60)}" for _ in range(n)]
    scores = [None if rng.random() < 0.1
              else int(rng.integers(0, 50)) for _ in range(n)]
    t = pa.table({"doc_id": pa.array(range(n), pa.int64()),
                  "text": pa.array(texts, pa.string()),
                  "score": pa.array(scores, pa.int64())})
    con = duckdb.connect()
    con.register("t", t.to_pandas())
    exp = con.sql("""
        SELECT doc_id, text, score FROM t
        QUALIFY text IS NULL OR row_number() OVER (
            PARTITION BY text
            ORDER BY score DESC NULLS LAST, doc_id) = 1
        ORDER BY doc_id
    """).df().reset_index(drop=True)
    prev = None
    for parts in (1, 5):
        got = _run(t, parts)
        pd.testing.assert_frame_equal(got.astype(exp.dtypes.to_dict()),
                                      exp)
        if prev is not None:
            assert got.equals(prev)
        prev = got
