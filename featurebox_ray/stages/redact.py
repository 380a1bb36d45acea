"""Regex pattern redaction — the PII-scrub shape (emails, phone
numbers, credential-looking tokens) as a vectorized map-only stage.

Both Arrow's ``replace_substring_regex`` and DuckDB's
``regexp_replace(..., 'g')`` run RE2 syntax, so a redaction pass
value-hashes exactly against the SQL replay — pick RE2-compatible
patterns (no backreferences/lookahead).  At 100 TB this is an
embarrassingly parallel pass; compiled-pattern state lives inside
Arrow's kernel (nothing to broadcast).

Reference analog: none (beyond-reference training-data operator).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def pattern_redact(ds, *, text_col: str = "text", pattern: str,
                   replacement: str = "[REDACTED]",
                   out_col: str | None = None,
                   count_col: str | None = "n_redactions",
                   batch_size=None):
    """Replace every match of ``pattern`` in ``text_col`` (in place, or
    into ``out_col`` if given) and optionally append the per-row match
    count as ``count_col``."""
    target = out_col or text_col

    def redact(batch: pa.Table) -> pa.Table:
        texts = batch[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        cleaned = pc.replace_substring_regex(texts, pattern=pattern,
                                             replacement=replacement)
        if target in batch.column_names:
            batch = batch.set_column(
                batch.column_names.index(target), target, cleaned)
        else:
            batch = batch.append_column(target, cleaned)
        if count_col:
            n = pc.count_substring_regex(texts, pattern).cast(pa.int64())
            batch = batch.append_column(count_col, n)
        return batch

    return ds.map_batches(redact, batch_format="pyarrow",
                          zero_copy_batch=True, batch_size=batch_size)
