"""Gopher/C4 quality rules (stages/text.py:gopher_quality_fn) vs a
DuckDB replay with adversarial bullets/ellipses/newlines/unicode."""

import functools

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from featurebox_ray.stages.text import gopher_quality_fn

ORACLE = r"""
    WITH base AS (
      SELECT id, coalesce(text, '') AS tx,
             regexp_extract_all(coalesce(text, ''), '\S+') AS t,
             string_split(coalesce(text, ''), chr(10)) AS ls
      FROM docs),
    s AS (
      SELECT id,
        len(t) AS gq_n_words,
        coalesce(length(array_to_string(t, '')), 0)
                  AS gq_word_chars,
        len(regexp_extract_all(tx, '#')) AS gq_n_hash,
        len(regexp_extract_all(tx, '\.\.\.')) AS gq_n_ellipsis,
        len(ls) AS gq_n_lines,
        len(list_filter(ls, x -> regexp_matches(x, '^\s*[-*•]')))
          AS gq_n_bullet_lines,
        len(list_filter(ls, x -> regexp_matches(x, '\.\.\.\s*$')))
          AS gq_n_ellipsis_lines,
        len(list_filter(t, x -> x IN ('the','be','to','of','and',
            'that','have','with'))) AS gq_n_stop,
        len(list_filter(t, x -> regexp_matches(x, '[A-Za-z]')))
          AS gq_n_alpha_words
      FROM base)
    SELECT id, gq_n_words, gq_word_chars,
           CASE WHEN gq_n_words = 0 THEN NULL
                ELSE CAST(gq_word_chars AS DOUBLE)
                     / CAST(gq_n_words AS DOUBLE) END
             AS gq_mean_word_len,
           gq_n_hash, gq_n_ellipsis, gq_n_lines, gq_n_bullet_lines,
           gq_n_ellipsis_lines, gq_n_stop, gq_n_alpha_words,
           (gq_n_words >= 3 AND gq_n_words <= 100000
            AND 3 * gq_n_words <= gq_word_chars
            AND gq_word_chars <= 10 * gq_n_words
            AND 10 * (gq_n_hash + gq_n_ellipsis) < gq_n_words
            AND 10 * gq_n_bullet_lines < 9 * gq_n_lines
            AND 10 * gq_n_ellipsis_lines < 3 * gq_n_lines
            AND 10 * gq_n_alpha_words >= 8 * gq_n_words
            AND gq_n_stop >= 1) AS gq_keep
    FROM s ORDER BY id
"""


def test_gopher_rules_duckdb_fuzz_partition_invariant():
    rng = np.random.default_rng(73)
    pieces = ["the", "of", "with", "cat", "runs", "x#y", "wait...",
              "- bullet", "* item", "• dot", "naïve", "ünïcode",
              "12345", "...", "#", "a", "longwordhere"]
    docs = []
    for _ in range(250):
        k = int(rng.integers(0, 14))
        words = list(rng.choice(pieces, k)) if k else []
        txt = " ".join(words)
        # inject newlines so line rules fire
        if k > 4 and rng.random() < 0.6:
            ws = txt.split(" ")
            cut = int(rng.integers(1, len(ws)))
            txt = " ".join(ws[:cut]) + "\n" + " ".join(ws[cut:])
        docs.append(txt if k else
                    (None if rng.random() < 0.5 else ""))
    pdf = pd.DataFrame({"id": range(len(docs)), "text": docs})
    con = duckdb.connect()
    con.register("docs", pdf)
    exp = con.sql(ORACLE).df().reset_index(drop=True)
    t = pa.table({"id": pa.array(pdf.id, pa.int64()),
                  "text": pa.array(docs, pa.string())})
    fn = functools.partial(gopher_quality_fn, min_words=3,
                           min_stop_hits=1)
    prev = None
    for parts in (1, 7):
        ds = ray.data.from_arrow(t)
        if parts > 1:
            ds = ds.repartition(parts)
        got = (ds.map_batches(fn, batch_format="pyarrow",
                              zero_copy_batch=True)
               .drop_columns(["text"]).to_pandas()
               .sort_values("id").reset_index(drop=True))
        pd.testing.assert_frame_equal(got.astype(exp.dtypes.to_dict()),
                                      exp)
        if prev is not None:
            assert got.equals(prev)
        prev = got
    # a doc made of stopwords with sane lengths must be kept
    one = pa.table({"id": pa.array([0], pa.int64()),
                    "text": pa.array(["the cat runs with the dog"],
                                     pa.string())})
    kept = (ray.data.from_arrow(one)
            .map_batches(fn, batch_format="pyarrow")
            .to_pandas())
    assert bool(kept.gq_keep.item())


DIV_ORACLE = r"""
    WITH tok AS (
      SELECT id, unnest(regexp_extract_all(coalesce(text, ''),
                                           '\S+')) AS w
      FROM docs),
    c AS (SELECT id, w, CAST(count(*) AS BIGINT) AS n_i
          FROM tok GROUP BY id, w),
    s AS (SELECT id, CAST(sum(n_i) AS BIGINT) AS n_tokens,
                 CAST(count(*) AS BIGINT) AS n_types,
                 CAST(sum(n_i * n_i) AS BIGINT) AS sum_sq
          FROM c GROUP BY id)
    SELECT d.id, coalesce(s.n_tokens, 0) AS n_tokens,
           coalesce(s.n_types, 0) AS n_types,
           coalesce(s.sum_sq, 0) AS sum_sq,
           CASE WHEN s.n_tokens IS NULL THEN NULL
                ELSE CAST(s.n_tokens AS DOUBLE)
                     * CAST(s.n_tokens AS DOUBLE)
                     / CAST(s.sum_sq AS DOUBLE) END AS simpson_d
    FROM docs d LEFT JOIN s USING (id) ORDER BY d.id
"""


def test_lexical_diversity_duckdb_fuzz():
    from featurebox_ray.stages.text import lexical_diversity_fn

    rng = np.random.default_rng(181)
    vocab = [f"w{i}" for i in range(8)]
    docs = []
    for _ in range(200):
        k = int(rng.integers(0, 15))
        docs.append(" ".join(rng.choice(vocab, k)) if k else
                    (None if rng.random() < 0.5 else ""))
    pdf = pd.DataFrame({"id": range(len(docs)), "text": docs})
    con = duckdb.connect()
    con.register("docs", pdf)
    exp = con.sql(DIV_ORACLE).df().reset_index(drop=True)
    t = pa.table({"id": pa.array(pdf.id, pa.int64()),
                  "text": pa.array(docs, pa.string())})
    fn = functools.partial(lexical_diversity_fn, id_col="id")
    got = (ray.data.from_arrow(t).repartition(5)
           .map_batches(fn, batch_format="pyarrow",
                        zero_copy_batch=True)
           .to_pandas().sort_values("id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got.astype(exp.dtypes.to_dict()),
                                  exp, check_exact=True)
    # extremes: all-same-word doc -> D = 1; all-distinct -> D = N
    one = pa.table({"id": pa.array([0, 1], pa.int64()),
                    "text": pa.array(["a a a a", "a b c d"],
                                     pa.string())})
    g2 = (ray.data.from_arrow(one)
          .map_batches(fn, batch_format="pyarrow").to_pandas()
          .sort_values("id"))
    assert g2.simpson_d.tolist() == [1.0, 4.0]


def test_compression_ratio_properties():
    from featurebox_ray.stages.text import compression_ratio_fn

    t = pa.table({
        "id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array(["a" * 2000,                # ultra-repetitive
                          "".join(chr(33 + (i * 17) % 90)
                                  for i in range(2000)),  # high entropy
                          "", None], pa.string()),
    })
    fn = functools.partial(compression_ratio_fn, id_col="id")
    got = (ray.data.from_arrow(t).repartition(2)
           .map_batches(fn, batch_format="pyarrow")
           .to_pandas().sort_values("id").reset_index(drop=True))
    # repetitive text compresses far better than pseudo-random text
    assert got.ratio[0] < 0.05 < got.ratio[1]
    assert got.raw_len[2] == 0 and pd.isna(got.ratio[2])
    assert pd.isna(got.raw_len[3])
    # deterministic across runs / partitionings
    again = (ray.data.from_arrow(t)
             .map_batches(fn, batch_format="pyarrow")
             .to_pandas().sort_values("id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, again)
