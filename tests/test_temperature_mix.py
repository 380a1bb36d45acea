"""Temperature-scaled corpus rebalancing
(stages/sample.py:temperature_rebalance) vs a DuckDB replay of the
identical threshold arithmetic, plus threshold-math unit checks."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from featurebox_ray.stages.sample import (MOD, temperature_rebalance,
                                          temperature_thresholds)

ORACLE = """
    WITH c AS (SELECT g, count(*) AS n FROM t
               WHERE g IS NOT NULL AND id IS NOT NULL GROUP BY g),
         mm AS (SELECT min(n) AS nmin FROM c),
         thr AS (SELECT g,
                   CAST(floor(least(1.0, sqrt(CAST(nmin AS DOUBLE)
                                              / CAST(n AS DOUBLE)))
                        * 4294967296.0) AS HUGEINT) AS thr
                 FROM c, mm)
    SELECT t.id, t.g FROM t JOIN thr USING (g)
    WHERE ((CAST(t.id AS HUGEINT) % 4294967296) * 2654435761)
          % 4294967296 < thr.thr
    ORDER BY t.id
"""


def test_temperature_thresholds_math():
    # alpha=1 equalizes in expectation: smallest group keeps all
    thr = temperature_thresholds({"a": 100, "b": 400}, 1.0)
    assert thr["a"] == MOD
    assert thr["b"] == int(np.floor(np.float64(0.25) * MOD))
    # alpha=0.5: sqrt smoothing
    thr = temperature_thresholds({"a": 100, "b": 400}, 0.5)
    assert thr["b"] == int(np.floor(np.sqrt(np.float64(0.25)) * MOD))
    # alpha=0.25 is DEFINED as sqrt(sqrt(r))
    thr = temperature_thresholds({"a": 100, "b": 400}, 0.25)
    assert thr["b"] == int(np.floor(np.sqrt(np.sqrt(np.float64(0.25)))
                                    * MOD))
    # alpha->0 keeps everything
    thr = temperature_thresholds({"a": 1, "b": 10**9}, 0.0)
    assert all(v == MOD for v in thr.values())


def test_temperature_rebalance_duckdb_fuzz_partition_invariant():
    rng = np.random.default_rng(31)
    sizes = {"en": 900, "fr": 200, "de": 60, "sw": 25}
    gs, ids = [], []
    i = 0
    for g, n in sizes.items():
        for _ in range(n):
            gs.append(g)
            ids.append(i)
            i += 1
    # a few null groups / null ids must drop on both sides
    gs += [None, "en"]
    ids += [i, None]
    order = rng.permutation(len(gs))
    gs = [gs[j] for j in order]
    ids = [ids[j] for j in order]
    t = pa.table({"id": pa.array(ids, pa.int64()),
                  "g": pa.array(gs, pa.string())})
    con = duckdb.connect()
    con.register("t", t.to_pandas())
    exp = con.sql(ORACLE).df().reset_index(drop=True)
    prev = None
    for parts in (1, 7):
        ds = ray.data.from_arrow(t)
        if parts > 1:
            ds = ds.repartition(parts)
        got = (temperature_rebalance(ds, group_col="g", key_col="id",
                                     alpha=0.5)
               .to_pandas().sort_values("id").reset_index(drop=True))
        pd.testing.assert_frame_equal(got.astype(exp.dtypes.to_dict()),
                                      exp)
        if prev is not None:
            assert got.equals(prev)
        prev = got
    # the smallest group survives intact (threshold = 2^32 keeps all)
    assert (got.g == "sw").sum() == sizes["sw"]
    # the largest shrinks toward sqrt(nmin/n) of itself
    frac = (got.g == "en").sum() / sizes["en"]
    expect = np.sqrt(sizes["sw"] / sizes["en"])
    assert abs(frac - expect) < 0.1


SKIPGRAM_ORACLE = r"""
    WITH base AS (SELECT id, regexp_extract_all(coalesce(text, ''),
                                                '\S+') AS t
                  FROM docs),
    tok AS (SELECT id, unnest(t) AS w, generate_subscripts(t, 1) AS i
            FROM base),
    pr AS (SELECT a.w || ' ' || b.w AS pair
           FROM tok a JOIN tok b
             ON a.id = b.id AND b.i > a.i AND b.i <= a.i + 2)
    SELECT pair, CAST(count(*) AS BIGINT) AS cnt FROM pr
    GROUP BY pair ORDER BY cnt DESC, pair ASC LIMIT 15
"""


def test_skipgram_pairs_duckdb_fuzz_partition_invariant():
    from featurebox_ray.stages.tfidf import skipgram_pairs

    rng = np.random.default_rng(59)
    vocab = [f"w{i}" for i in range(12)]
    docs = []
    for _ in range(200):
        n = int(rng.integers(0, 9))
        docs.append(" ".join(rng.choice(vocab, n)) if n else
                    (None if rng.random() < 0.5 else ""))
    pdf = pd.DataFrame({"id": range(len(docs)), "text": docs})
    con = duckdb.connect()
    con.register("docs", pdf)
    exp = con.sql(SKIPGRAM_ORACLE).df().reset_index(drop=True)
    t = pa.table({"id": pa.array(pdf.id, pa.int64()),
                  "text": pa.array(docs, pa.string())})
    prev = None
    for parts in (1, 6):
        ds = ray.data.from_arrow(t)
        if parts > 1:
            ds = ds.repartition(parts)
        got = (skipgram_pairs(ds, id_col="id", window=2, k=15,
                              num_partitions=4)
               .to_pandas().reset_index(drop=True))
        pd.testing.assert_frame_equal(got.astype(exp.dtypes.to_dict()),
                                      exp)
        if prev is not None:
            assert got.equals(prev)
        prev = got


def test_skipgram_window1_equals_bigrams():
    from featurebox_ray.stages.tfidf import skipgram_pairs, top_bigrams

    t = pa.table({"id": pa.array([0, 1], pa.int64()),
                  "text": pa.array(["a b a b c", "b c"], pa.string())})
    sg = (skipgram_pairs(ray.data.from_arrow(t), id_col="id", window=1,
                         k=10, num_partitions=2).to_pandas())
    bg = (top_bigrams(ray.data.from_arrow(t), id_col="id", k=10,
                      num_partitions=2).to_pandas())
    assert sg.pair.tolist() == bg.bigram.tolist()
    assert sg.cnt.tolist() == bg.cnt.tolist()


FOLDS_ORACLE = """
    SELECT g, id,
           CAST((row_number() OVER (
               PARTITION BY g
               ORDER BY ((CAST(id AS HUGEINT) % 4294967296)
                         * 2654435761) % 4294967296, id) - 1) % 4
                AS BIGINT) AS fold
    FROM t WHERE id IS NOT NULL ORDER BY id
"""


def test_stratified_folds_duckdb_fuzz_exact_balance():
    from featurebox_ray.stages.sample import stratified_folds

    rng = np.random.default_rng(127)
    n = 500
    gs = [None if rng.random() < 0.03 else f"g{rng.integers(0, 7)}"
          for _ in range(n)]
    ids = list(range(n))
    ids[5] = None
    t = pa.table({"id": pa.array(ids, pa.int64()),
                  "g": pa.array(gs, pa.string())})
    con = duckdb.connect()
    con.register("t", t.to_pandas())
    exp = con.sql(FOLDS_ORACLE).df().reset_index(drop=True)
    prev = None
    for parts in (1, 6):
        ds = ray.data.from_arrow(t)
        if parts > 1:
            ds = ds.repartition(parts)
        got = (stratified_folds(ds, group_col="g", key_col="id",
                                n_folds=4, num_partitions=3)
               .to_pandas().sort_values("id").reset_index(drop=True))
        pd.testing.assert_frame_equal(got.astype(exp.dtypes.to_dict()),
                                      exp)
        if prev is not None:
            assert got.equals(prev)
        prev = got
    # EXACT balance: within every group fold sizes differ by <= 1
    for _, grp in got.groupby("g", dropna=False):
        sizes = grp.fold.value_counts()
        assert sizes.max() - sizes.min() <= 1


RISING_ORACLE = r"""
    WITH tok AS (
      SELECT CASE WHEN id <= {mid} THEN 0 ELSE 1 END AS side,
             unnest(regexp_extract_all(coalesce(text, ''),
                                       '\S+')) AS w
      FROM docs WHERE id IS NOT NULL),
    c AS (SELECT w AS term,
                 CAST(count(*) FILTER (WHERE side = 0) AS BIGINT)
                   AS early,
                 CAST(count(*) FILTER (WHERE side = 1) AS BIGINT)
                   AS late
          FROM tok GROUP BY w)
    SELECT term, early, late,
           CAST(late + 1 AS DOUBLE) / CAST(early + 1 AS DOUBLE)
             AS rise
    FROM c ORDER BY rise DESC, term ASC LIMIT 12
"""


def test_rising_terms_duckdb_fuzz_partition_invariant():
    from featurebox_ray.stages.tfidf import rising_terms

    rng = np.random.default_rng(163)
    old_vocab = [f"o{i}" for i in range(10)]
    new_vocab = [f"n{i}" for i in range(6)]
    docs = []
    n = 300
    for i in range(n):
        pool = old_vocab if i < n // 2 else old_vocab + new_vocab * 3
        k = int(rng.integers(0, 8))
        docs.append(" ".join(rng.choice(pool, k)) if k else None)
    pdf = pd.DataFrame({"id": range(n), "text": docs})
    con = duckdb.connect()
    con.register("docs", pdf)
    mid = (0 + n - 1) // 2
    exp = con.sql(RISING_ORACLE.format(mid=mid)).df().reset_index(
        drop=True)
    t = pa.table({"id": pa.array(range(n), pa.int64()),
                  "text": pa.array(docs, pa.string())})
    prev = None
    for parts in (1, 6):
        ds = ray.data.from_arrow(t)
        if parts > 1:
            ds = ds.repartition(parts)
        got = (rising_terms(ds, id_col="id", split_id=mid, k=12,
                            num_partitions=4)
               .to_pandas().reset_index(drop=True))
        pd.testing.assert_frame_equal(got.astype(exp.dtypes.to_dict()),
                                      exp)
        if prev is not None:
            assert got.equals(prev)
        prev = got
    # planted new-vocabulary terms dominate the rising list
    assert all(term.startswith("n") for term in got.term.head(6))
