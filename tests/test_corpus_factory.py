"""Composed corpus factory (q300 chain: exact_dedup -> gopher ->
per-lang rollup) vs a DuckDB chained-CTE replay on a synthetic corpus
with planted duplicates and junk docs."""

import duckdb
import functools

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray

from featurebox_ray.stages.dedup import exact_dedup
from featurebox_ray.stages.text import gopher_quality_fn

GOOD = ("the quick brown fox jumps over the lazy dog and then "
        "runs far away to find some food for the evening meal")
JUNK = "### ### ### ..."


def _rollup(gq):
    got = gq.to_pandas()
    got = got[got.gq_keep.fillna(False)]
    out = (got.groupby("lang")
           .agg(n_docs=("doc_id", "size"),
                n_tokens=("gq_n_words", "sum")).reset_index())
    out["avg_tokens"] = out.n_tokens / out.n_docs
    return out.sort_values("lang").reset_index(drop=True)


def test_factory_chain_matches_duckdb():
    rng = np.random.default_rng(300)
    rows = []
    for i in range(300):
        lang = ["en", "de"][i % 2]
        if i % 10 == 0:
            rows.append((i, JUNK, lang))          # fails gopher
        elif i % 7 == 0:
            rows.append((i, GOOD, lang))          # exact duplicate
        else:
            rows.append((i, GOOD + f" extra{i} words here", lang))
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "lang"])
    con = duckdb.connect()
    con.register("documents", pdf)
    exp = con.sql(r"""
        WITH dd AS (SELECT doc_id, text, lang FROM documents
                    QUALIFY row_number() OVER (
                      PARTITION BY text ORDER BY doc_id) = 1),
        base AS (SELECT lang, text AS tx,
                        regexp_extract_all(text, '\S+') AS t,
                        string_split(text, chr(10)) AS ls FROM dd),
        s AS (SELECT lang, len(t) AS w,
                coalesce(length(array_to_string(t, '')), 0) AS wc,
                len(regexp_extract_all(tx, '#')) AS nh,
                len(regexp_extract_all(tx, '\.\.\.')) AS ne,
                len(ls) AS nl,
                len(list_filter(ls, x -> regexp_matches(
                    x, '^\s*[-*•]'))) AS nb,
                len(list_filter(ls, x -> regexp_matches(
                    x, '\.\.\.\s*$'))) AS nel,
                len(list_filter(t, x -> regexp_matches(
                    x, '[A-Za-z]'))) AS na
              FROM base),
        kept AS (SELECT lang, w FROM s
                 WHERE w >= 5 AND w <= 100000
                   AND 3 * w <= wc AND wc <= 10 * w
                   AND 10 * (nh + ne) < w
                   AND 10 * nb < 9 * nl AND 10 * nel < 3 * nl
                   AND 10 * na >= 8 * w)
        SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(w) AS BIGINT) AS n_tokens,
               CAST(sum(w) AS DOUBLE) / CAST(count(*) AS DOUBLE)
                   AS avg_tokens
        FROM kept GROUP BY lang ORDER BY lang
    """).df().reset_index(drop=True)
    # junk docs must be filtered, duplicate GOOD docs collapse to one
    assert (exp.n_docs < 150).all()

    docs = ray.data.from_arrow(
        pa.Table.from_pandas(pdf, preserve_index=False)).repartition(5)
    dd = exact_dedup(docs, text_col="text", id_col="doc_id",
                     num_partitions=4)
    gq = dd.map_batches(functools.partial(gopher_quality_fn,
                                          min_words=5,
                                          min_stop_hits=0),
                        batch_format="pyarrow", zero_copy_batch=True)
    got = _rollup(gq)
    pd.testing.assert_frame_equal(got.astype(exp.dtypes.to_dict()),
                                  exp)
