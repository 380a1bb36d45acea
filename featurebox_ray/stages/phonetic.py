"""Phonetic blocking keys — a simplified Soundex for entity-resolution
blocking: names that sound alike get the same 4-char key, so the
quadratic fuzzy-match (``stages/editdist.py``) only runs inside
blocks.  The classic record-linkage first stage.

SIMPLIFIED Soundex (documented delta from the 1918 original: the
letters-separated-by-H/W-collapse rule is dropped) — chosen because
every step is then a pure RE2 substitution chain, and Arrow's
``replace_substring_regex`` and DuckDB's ``regexp_replace`` are BOTH
RE2: the engine and the SQL oracle execute literally the same regex
program, so keys replay bit-exactly.  RE2 has no backreferences, so
run-collapsing is seven single-digit passes (``'1+'→'1'`` …) instead
of ``'(\\d)\\1+'``.

Steps: strip non-alpha, uppercase; first letter kept; all letters map
to digit classes (BFPV→1, CGJKQSXZ→2, DT→3, L→4, MN→5, R→6,
AEIOUYHW→0); adjacent equal digits collapse; the first code char
drops; zeros drop; pad/truncate to 3 digits → ``letter + 3 digits``.
Empty/non-alpha names key to NULL.

Map-only (no shuffle); one Arrow kernel chain per block.
Reference analog: none (no string normalization in the reference).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["soundex_key", "add_soundex_key"]

_CLASSES = [("[BFPV]", "1"), ("[CGJKQSXZ]", "2"), ("[DT]", "3"),
            ("[L]", "4"), ("[MN]", "5"), ("[R]", "6"),
            ("[AEIOUYHW]", "0")]


def soundex_key(names) -> pa.Array:
    """Vectorized simplified-Soundex over a string Array/ChunkedArray."""
    if isinstance(names, pa.ChunkedArray):
        names = names.combine_chunks()
    s = pc.utf8_upper(pc.replace_substring_regex(
        pc.cast(names, pa.string()), "[^A-Za-z]", ""))
    nonempty = pc.greater(pc.utf8_length(s), 0)
    first = pc.utf8_slice_codeunits(s, 0, 1)
    m = s
    for pat, rep in _CLASSES:
        m = pc.replace_substring_regex(m, pat, rep)
    for d in "0123456":
        m = pc.replace_substring_regex(m, d + "+", d)
    rest = pc.utf8_slice_codeunits(m, 1, 1 << 30)
    rest = pc.replace_substring(rest, "0", "")
    padded = pc.utf8_slice_codeunits(
        pc.binary_join_element_wise(rest, "000", ""), 0, 3)
    key = pc.binary_join_element_wise(first, padded, "")
    return pc.if_else(nonempty, key, pa.nulls(len(s), pa.string()))


def add_soundex_key(ds, *, name_col: str, out_col: str = "soundex"):
    """Append the blocking key column — map-only, zero-copy Arrow."""
    def fn(b: pa.Table) -> pa.Table:
        return b.append_column(out_col, soundex_key(b[name_col]))

    return ds.map_batches(fn, batch_format="pyarrow",
                          zero_copy_batch=True)
