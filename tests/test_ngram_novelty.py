"""Per-doc n-gram novelty (stages/substr.py:ngram_novelty) vs a DuckDB
replay; md5/poly mode agreement; hand case."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from featurebox_ray.stages.substr import ngram_novelty

ORACLE = r"""
    WITH base AS (SELECT id, regexp_extract_all(coalesce(text, ''),
                                                '\S+') AS t
                  FROM docs),
    g AS (SELECT DISTINCT id,
                 array_to_string(list_slice(t, i, i + 1), ' ') AS gram
          FROM base, LATERAL unnest(range(1, len(t))) AS u(i)
          WHERE len(t) >= 2),
    m AS (SELECT gram, min(id) AS first_doc FROM g GROUP BY gram),
    s AS (SELECT g.id, CAST(count(*) AS BIGINT) AS n_grams,
                 CAST(count(*) FILTER (WHERE g.id = m.first_doc)
                      AS BIGINT) AS n_novel
          FROM g JOIN m USING (gram) GROUP BY g.id)
    SELECT d.id, coalesce(s.n_grams, 0) AS n_grams,
           coalesce(s.n_novel, 0) AS n_novel,
           CASE WHEN s.n_grams IS NULL THEN NULL
                ELSE CAST(s.n_novel AS DOUBLE)
                     / CAST(s.n_grams AS DOUBLE) END AS novelty
    FROM docs d LEFT JOIN s USING (id) ORDER BY d.id
"""


def _fuzz(seed=67, n=180):
    rng = np.random.default_rng(seed)
    vocab = [f"w{i}" for i in range(15)]
    docs = []
    for _ in range(n):
        m = int(rng.integers(0, 8))
        docs.append(" ".join(rng.choice(vocab, m)) if m else
                    (None if rng.random() < 0.5 else ""))
    # planted exact duplicate: doc n gets doc 0's text -> novelty 0
    docs[0] = "a b c d e"
    docs[-1] = "a b c d e"
    return docs


def test_ngram_novelty_duckdb_fuzz_partition_invariant():
    docs = _fuzz()
    pdf = pd.DataFrame({"id": range(len(docs)), "text": docs})
    con = duckdb.connect()
    con.register("docs", pdf)
    exp = con.sql(ORACLE).df().reset_index(drop=True)
    t = pa.table({"id": pa.array(pdf.id, pa.int64()),
                  "text": pa.array(docs, pa.string())})
    prev = None
    for parts in (1, 6):
        ds = ray.data.from_arrow(t)
        if parts > 1:
            ds = ds.repartition(parts)
        got = (ngram_novelty(ds, id_col="id", k=2, num_partitions=4)
               .to_pandas().sort_values("id").reset_index(drop=True))
        pd.testing.assert_frame_equal(got.astype(exp.dtypes.to_dict()),
                                      exp)
        if prev is not None:
            assert got.equals(prev)
        prev = got
    # the planted duplicate of doc 0 has zero novelty
    assert got.loc[got.id == len(docs) - 1, "novelty"].item() == 0.0
    assert got.loc[got.id == 0, "novelty"].item() == 1.0


def test_ngram_novelty_poly_mode_agrees():
    docs = _fuzz(seed=71)
    t = pa.table({"id": pa.array(range(len(docs)), pa.int64()),
                  "text": pa.array(docs, pa.string())})
    a = (ngram_novelty(ray.data.from_arrow(t), id_col="id", k=2,
                       num_partitions=4, hash_mode="md5")
         .to_pandas().sort_values("id").reset_index(drop=True))
    b = (ngram_novelty(ray.data.from_arrow(t), id_col="id", k=2,
                       num_partitions=4, hash_mode="poly")
         .to_pandas().sort_values("id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


def test_ngram_novelty_hand_case():
    t = pa.table({
        "id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["x y z", "x y q", "z"], pa.string()),
    })
    got = (ngram_novelty(ray.data.from_arrow(t), id_col="id", k=2,
                         num_partitions=2)
           .to_pandas().sort_values("id").reset_index(drop=True))
    # doc1 grams {x y, y z} both novel; doc2 {x y (seen), y q (new)};
    # doc3 has no bigrams
    assert got.n_grams.tolist() == [2, 2, 0]
    assert got.n_novel.tolist() == [2, 1, 0]
    assert got.novelty.tolist()[:2] == [1.0, 0.5]
    assert pd.isna(got.novelty.iloc[2])
