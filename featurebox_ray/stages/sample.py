"""Deterministic hash sampling — a streaming, shuffle-free sample that is
stable across runs, partitionings and cluster sizes.

``keep row ⇔ ((key mod 2^32) * 2654435761) mod 2^32 < threshold`` — the
Knuth multiplicative hash over the low 32 bits of an integer key.  Because
the decision is a pure function of the key, the sample is (a) reproducible
(re-runs and resumed checkpoints pick the same rows), (b) consistent
across tables (sampling two fact tables by the same key yields joinable
samples), and (c) exact-arithmetic replayable in SQL
(``((key % 4294967296) * 2654435761) % 4294967296`` in HUGEINT).  All ops
stay under 2^64 after the ``% 2^32`` mask, so numpy uint64 and SQL HUGEINT
agree exactly.

Defined for NON-NEGATIVE integer keys (SQL ``%`` and numpy ``%`` diverge
on negatives); null keys are dropped.

Reference analog: none (the reference's shuffle-split is random-state
based, ``featurebox/data/array_extract.py``); this is the at-scale
debug/estimation sampler a 100-TB pipeline needs — a 1% flat sample
costs one vectorized filter per block, no pass over the data beyond the
stream itself.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

KNUTH_MULT = 2654435761       # 2^32 / golden ratio, odd
MOD_BITS = 32
MOD = 1 << MOD_BITS


def sample_threshold(fraction: float) -> int:
    """Integer threshold for a given sampling fraction (use the SAME
    constant in the SQL replay: ``< sample_threshold(f)``)."""
    return int(round(fraction * MOD))


def hash_sample(ds, *, key_col: str, threshold: int):
    """Keep rows whose multiplicative key hash lands under ``threshold``
    (≈ ``threshold / 2**32`` of all distinct keys — all rows of one key
    are kept or dropped together)."""

    def filt(batch: pa.Table) -> pa.Table:
        col = batch[key_col]
        if col.null_count:
            batch = batch.filter(pc.is_valid(col))
            col = batch[key_col]
        k = col.to_numpy(zero_copy_only=False).astype(np.int64)
        if k.size and int(k.min()) < 0:
            raise ValueError(
                f"hash_sample requires non-negative keys; {key_col} has "
                f"min {int(k.min())}")
        h = ((k.view(np.uint64) % np.uint64(MOD)) * np.uint64(KNUTH_MULT)
             ) % np.uint64(MOD)
        return batch.filter(pa.array(h < np.uint64(threshold)))

    return ds.map_batches(filt, batch_format="pyarrow", zero_copy_batch=True)
