"""Document chunking — the LLM-training row expander: split each
document into fixed-size token windows with overlap (stride), one output
row per chunk.

Pure flat-map (no shuffle, no state): each block expands independently,
so the stage streams and scales linearly.  The kernel is fully
vectorized — Arrow's C++ whitespace splitter tokenizes the batch, one
"ragged arange" builds every chunk's token indices at once, a single
``take`` gathers them, and ``pc.binary_join`` re-joins chunk text —
no per-row Python anywhere.

Chunk spec (deterministic, SQL-replayable): token starts are multiples
of ``stride = chunk_tokens - overlap``; chunk ``i`` covers tokens
``[i*stride, min(i*stride + chunk_tokens, n))``, and emission stops
with the first window that reaches the doc end (no chunk is ever a
subset of its predecessor).  Zero-token documents emit zero chunks.
The trailing chunk may be short (standard training-prep behavior).

Reference analog: the reference's per-record entry splitters
(``BaseFeaturizer.transform`` iterating compositions) — here the
expansion is batch-vectorized instead of per-entry Python.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .dedup import split_tokens


def _check_spec(chunk_tokens: int, overlap: int) -> None:
    if chunk_tokens < 1:
        raise ValueError("chunk_tokens must be >= 1")
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("overlap must satisfy 0 <= overlap < chunk_tokens")


def chunk_kernel(batch: pa.Table, *, id_col: str, text_col: str,
                 chunk_tokens: int, overlap: int) -> pa.Table:
    _check_spec(chunk_tokens, overlap)
    stride = chunk_tokens - overlap
    texts = batch[text_col].combine_chunks()
    flat, off = split_tokens(texts)
    n_tok = np.diff(off)                         # tokens per doc
    # emission stops once a window reaches the doc end: the last start is
    # the smallest stride multiple with start + chunk_tokens >= n, so no
    # chunk is ever fully contained in its predecessor (which would
    # double-count the tail tokens of docs with n in (k*stride,
    # k*stride + overlap])
    n_chunks = np.where(
        n_tok > 0,
        np.where(n_tok <= chunk_tokens, 1,
                 (n_tok - chunk_tokens + stride - 1) // stride + 1),
        0).astype(np.int64)
    total = int(n_chunks.sum())
    empty_schema = pa.schema([
        (id_col, batch.schema.field(id_col).type),
        ("chunk_idx", pa.int64()), ("chunk_text", pa.string()),
        ("n_tokens", pa.int64())])
    if total == 0:
        return empty_schema.empty_table()

    doc_of_chunk = np.repeat(np.arange(len(n_tok)), n_chunks)
    # chunk ordinal within its doc: global arange minus each doc's base
    chunk_base = np.concatenate([[0], np.cumsum(n_chunks)[:-1]])
    chunk_idx = np.arange(total) - chunk_base[doc_of_chunk]
    local_start = chunk_idx * stride
    lens = np.minimum(chunk_tokens,
                      n_tok[doc_of_chunk] - local_start).astype(np.int64)
    g_start = off[:-1][doc_of_chunk] + local_start
    # ragged arange: token index j of chunk c is g_start[c] + j
    tok_base = np.concatenate([[0], np.cumsum(lens)[:-1]])
    flat_idx = (np.repeat(g_start - tok_base, lens)
                + np.arange(int(lens.sum())))
    # int64 offsets + large list/string: no 2^31 tokens-per-batch or
    # 2 GiB text-per-batch ceiling on the expanded payload
    gathered = flat.take(pa.array(flat_idx, pa.int64()))
    if not pa.types.is_large_string(gathered.type):
        gathered = gathered.cast(pa.large_string())
    offsets = pa.array(np.concatenate([[0], np.cumsum(lens)]), pa.int64())
    chunks_list = pa.LargeListArray.from_arrays(offsets, gathered)
    chunk_text = pc.binary_join(chunks_list,
                                pa.scalar(" ", pa.large_string()))

    ids = batch[id_col].combine_chunks().take(
        pa.array(doc_of_chunk, pa.int64()))
    return pa.table({
        id_col: ids,
        "chunk_idx": pa.array(chunk_idx, pa.int64()),
        "chunk_text": chunk_text.cast(pa.string()),
        "n_tokens": pa.array(lens, pa.int64()),
    })


def chunk_documents(ds, *, id_col: str = "doc_id",
                    text_col: str = "text", chunk_tokens: int = 256,
                    overlap: int = 0):
    """Expand each document into overlapping token-window chunks.
    Returns ``(id_col, chunk_idx:int64, chunk_text:string,
    n_tokens:int64)``."""
    _check_spec(chunk_tokens, overlap)  # fail eagerly, not inside tasks

    def fn(b: pa.Table) -> pa.Table:
        return chunk_kernel(b, id_col=id_col, text_col=text_col,
                            chunk_tokens=chunk_tokens, overlap=overlap)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
