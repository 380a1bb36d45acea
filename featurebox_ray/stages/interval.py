"""Broadcast interval (range) join — match fact rows whose timestamp falls
inside ``[lo, hi)`` of a small interval table, with arbitrary overlaps.

The interval side rides the object store ONCE (``ray.put``); every batch
task walks a sorted-by-``lo`` view with two vectorized ``searchsorted``
probes.  Candidates for a row at ``ts`` are the intervals with
``lo ∈ (ts - max_width, ts]`` (any interval is at most ``max_width`` wide,
so nothing earlier can still cover ``ts``); the expansion is a
``repeat``/``arange`` gather, then an exact ``hi > ts`` filter.  Per-batch
cost is O(rows × overlap_degree) with no shuffle of the fact side at all —
the 100-TB shape for joining events to a bounded set of windows
(deployments, incidents, experiment arms).

This is a beyond-reference operator (the reference joins only on equality
/ as-of keys); the as-of analog lives in ``stages/asof.py``.

Skew note: a single pathological interval covering everything makes
``max_width`` large and every row a candidate of all intervals — cap or
split wide intervals upstream (mirror of the bucket caps in
``stages/neighbor.py``).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _as_int64(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Timestamps/ints to a comparable int64 vector (us for timestamps)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    t = col.type
    if pa.types.is_timestamp(t):
        col = col.cast(pa.int64())
    return col.to_numpy(zero_copy_only=False).astype(np.int64)


def broadcast_interval_join(
    ds,
    intervals: pa.Table,
    *,
    ts_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    keep_cols: Sequence[str] | None = None,
):
    """Inner-join ``ds`` rows to every interval with ``lo <= ts < hi``.

    ``intervals`` is a small driver-side Arrow table; its non-bound columns
    (e.g. a window id) are attached to each matched row.  Output = matched
    fact rows (optionally projected to ``keep_cols``) + interval columns;
    rows matching no interval are dropped, rows matching m intervals appear
    m times.
    """
    import ray

    if intervals.num_rows == 0:
        # keep the output schema identical to the non-empty path:
        # keep_cols + the interval attach columns, all correctly typed
        attach_schema = intervals.drop_columns([lo_col, hi_col]).schema

        def empty(b: pa.Table) -> pa.Table:
            out = b.select(list(keep_cols) if keep_cols else b.column_names)
            out = out.slice(0, 0)
            for f in attach_schema:
                out = out.append_column(f.name, pa.array([], f.type))
            return out
        return ds.map_batches(empty, batch_format="pyarrow",
                              zero_copy_batch=True)

    lo = _as_int64(intervals[lo_col])
    hi = _as_int64(intervals[hi_col])
    order = np.argsort(lo, kind="stable")
    iv_sorted = intervals.take(pa.array(order))
    lo, hi = lo[order], hi[order]
    max_width = int((hi - lo).max())
    attach = iv_sorted.drop_columns([lo_col, hi_col])
    iv_ref = ray.put((lo, hi, max_width, attach))

    def join_batch(batch: pa.Table) -> pa.Table:
        lo_, hi_, w_, attach_ = ray.get(iv_ref)
        if batch[ts_col].null_count:
            # SQL range predicates on NULL ts are false — drop the rows
            # (a null would otherwise become INT64_MIN and wrap below)
            batch = batch.filter(pc.is_valid(batch[ts_col]))
        proj = batch.select(list(keep_cols)) if keep_cols else batch
        ts = _as_int64(batch[ts_col])
        left = np.searchsorted(lo_, ts - w_, side="right")
        right = np.searchsorted(lo_, ts, side="right")
        counts = right - left
        out_row = np.repeat(np.arange(len(ts)), counts)
        cum = np.concatenate([[0], np.cumsum(counts)])
        cand = (np.arange(int(counts.sum())) - cum[out_row]) + left[out_row]
        ok = hi_[cand] > ts[out_row]
        out_row, cand = out_row[ok], cand[ok]
        out = proj.take(pa.array(out_row, pa.int64()))
        for name in attach_.column_names:
            out = out.append_column(
                name, attach_[name].take(pa.array(cand, pa.int64())))
        return out

    return ds.map_batches(join_batch, batch_format="pyarrow",
                          zero_copy_batch=True)


def top_k_per_group(ds, *, group_col: str, order_col: str, tie_col: str,
                    k: int, keep_cols: Sequence[str]) -> pa.Table:
    """Driver-side small result: top-k rows per group by
    ``(order_col DESC, tie_col ASC)`` — the interval-anchor builder.
    The groupby shuffles only ``keep_cols``; the returned table is
    O(groups × k) rows, intended for broadcast.
    """
    from .partition import materialized_block_refs

    import ray

    def topk(t: pa.Table) -> pa.Table:
        v = t[order_col].to_numpy(zero_copy_only=False).astype(np.float64)
        tie = t[tie_col].to_numpy(zero_copy_only=False)
        sel = np.lexsort((tie, -v))[:k]
        return t.select(list(keep_cols)).take(pa.array(np.sort(sel), pa.int64()))

    small = ds.groupby(group_col).map_groups(topk, batch_format="pyarrow")
    blocks = [b for b in ray.get(materialized_block_refs(small))
              if b.num_rows > 0]
    if not blocks:
        # preserve the source column types so empty and non-empty
        # results have the same schema (callers cast/take on these)
        src = ds.schema()
        src = getattr(src, "base_schema", None) if src is not None else None
        return pa.schema(
            [(c, src.field(c).type if src is not None else pa.null())
             for c in keep_cols]).empty_table()
    return pa.concat_tables(blocks, promote_options="default")
