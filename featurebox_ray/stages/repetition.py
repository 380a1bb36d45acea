"""Gopher-style repetition / quality-filter signals per document
(Rae et al. 2021 §A1.1 "repetition removal"): duplicate-word fraction,
most-frequent-bigram and -trigram fractions, mean word length.

Map-only operator — per batch everything is Arrow/pandas C kernels
(whitespace split, shifted binary_join for n-grams, C hash-table group
counting on the ACTUAL strings so distinct-counts are exact string
semantics with zero collision risk).  Every emitted fraction is ONE
int/int float64 division, so the DuckDB replay (count/count(DISTINCT)/
max-count aggregates) is bit-exact.

At 100 TB: no shuffle, no state — an embarrassingly parallel pass whose
output feeds the corpus-filter predicate (e.g. drop docs with
``top_bigram_frac > 0.18`` per the Gopher thresholds).

Reference analog: none (beyond-reference training-data operator).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .dedup import split_tokens
from .decontam import batch_ngrams
from .text import _row_sums


def _max_count_per_doc(grams: pa.Array, gram_doc: np.ndarray,
                       nrows: int) -> np.ndarray:
    """max over grams g of count(doc, g) — exact string grouping via the
    pandas C hash table (no per-row Python, no hash-collision risk)."""
    out = np.zeros(nrows, np.int64)
    if len(grams) == 0:
        return out
    df = pd.DataFrame({"d": gram_doc,
                       "g": grams.to_pandas().to_numpy()})
    counts = df.groupby(["d", "g"], sort=False).size()
    mx = counts.groupby(level=0).max()
    out[mx.index.to_numpy()] = mx.to_numpy()
    return out


def repetition_features_fn(batch: pa.Table, *, id_col: str = "doc_id",
                           text_col: str = "text", pre=None) -> pa.Table:
    texts = batch[text_col]
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    nrows = batch.num_rows
    flat, off = pre if pre is not None else split_tokens(texts)
    n_tok = np.diff(off).astype(np.int64)

    # distinct words per doc: exact string grouping (C hash table)
    n_distinct = np.zeros(nrows, np.int64)
    if len(flat):
        row_ids = np.repeat(np.arange(nrows, dtype=np.int64), n_tok)
        df = pd.DataFrame({"d": row_ids,
                           "w": flat.to_pandas().to_numpy()})
        nd = df.drop_duplicates().groupby("d", sort=False).size()
        n_distinct[nd.index.to_numpy()] = nd.to_numpy()

    sum_len = _row_sums(
        pc.utf8_length(flat).to_numpy(zero_copy_only=False).astype(np.int64)
        if len(flat) else np.empty(0, np.int64), off)

    big, big_doc = batch_ngrams(texts, 2, pre=(flat, off))
    tri, tri_doc = batch_ngrams(texts, 3, pre=(flat, off))
    max_big = _max_count_per_doc(big, big_doc, nrows)
    max_tri = _max_count_per_doc(tri, tri_doc, nrows)

    with np.errstate(invalid="ignore", divide="ignore"):
        dup_word = np.where(n_tok > 0,
                            (n_tok - n_distinct).astype(np.float64) / n_tok,
                            0.0)
        top_big = np.where(n_tok >= 2,
                           max_big.astype(np.float64) / (n_tok - 1), 0.0)
        top_tri = np.where(n_tok >= 3,
                           max_tri.astype(np.float64) / (n_tok - 2), 0.0)
        mean_len = np.where(n_tok > 0,
                            sum_len.astype(np.float64) / n_tok, 0.0)

    return pa.table({
        id_col: batch[id_col].cast(pa.int64()),
        "n_tokens": pa.array(n_tok),
        "dup_word_frac": pa.array(dup_word),
        "top_bigram_frac": pa.array(top_big),
        "top_trigram_frac": pa.array(top_tri),
        "mean_word_len": pa.array(mean_len),
    })


def repetition_features(ds, *, id_col: str = "doc_id",
                        text_col: str = "text", batch_size=None):
    """Dataset → per-document repetition/quality signal table."""
    return ds.map_batches(
        repetition_features_fn, batch_format="pyarrow",
        zero_copy_batch=True, batch_size=batch_size,
        fn_kwargs={"id_col": id_col, "text_col": text_col})
