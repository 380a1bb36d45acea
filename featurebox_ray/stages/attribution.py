"""Multi-touch conversion attribution — split each conversion's value
linearly across the touch events that preceded it within a horizon,
in EXACT integer cents via the largest-remainder method (credit sums
reconcile to the attributed conversion total to the cent, the property
finance teams actually audit).

Per conversion with value ``c`` cents and ``n`` preceding touches:
every touch gets ``c // n`` and the first ``c % n`` touches in
``(ts, event_id)`` order get one extra cent — all integer ops, so the
per-type credit totals replay bit-exactly in SQL (`row_number()` +
``cents // n + (rn <= cents % n)``).

Scale shape: one user-keyed exchange; inside each sorted partition the
conversion→touch windows expand via the bounded searchsorted span walk
(the q49/q171 convention, expansion capped by ``max_expansion``), the
per-touch credits reduce to per-type int64 partials in the kernel, and
the driver merges ≤ types × partitions partial rows as Python ints —
no second shuffle.

Only conversions with positive cents attribute (non-positive carry no
credit — documented, mirrored by the oracle); conversions with zero
preceding touches attribute nothing.

Reference analog: none; the training-data sibling is credit assignment
over session context windows (SURVEY.md §2.5 windowed aggregates).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["linear_attribution"]


def linear_attribution(ds, *, key_col: str, ts_col: str, seq_col: str,
                       type_col: str, value_col: str, conv_type: str,
                       horizon, num_partitions: int = 16,
                       max_expansion: int = 50_000_000):
    """Returns ``(event_type, credit_cents:int64, n_touches:int64)`` —
    the linearly attributed credit per touch type.  ``horizon`` follows
    the asof native-unit convention (plain int = µs for timestamp[us]
    inputs)."""
    import ray

    from .partition import materialized_block_refs, partitioned_map

    h = int(horizon)

    def prep(b: pa.Table) -> pa.Table:
        keep = pc.and_(pc.and_(pc.is_valid(b[key_col]),
                               pc.is_valid(b[ts_col])),
                       pc.and_(pc.is_valid(b[seq_col]),
                               pc.is_valid(b[type_col])))
        if not pc.all(keep).as_py():
            b = b.filter(keep)
        ts = b[ts_col].combine_chunks()
        if pa.types.is_timestamp(ts.type):
            ts = ts.cast(pa.int64())
        from ..functions.segments import cents_exact

        cents = cents_exact(b[value_col].combine_chunks(),
                            col=value_col)
        return pa.table({key_col: b[key_col], "__t": ts,
                         "__s": b[seq_col], "__ty": b[type_col],
                         "__c": pa.array(cents)})

    prepped = ds.map_batches(prep, batch_format="pyarrow",
                             zero_copy_batch=True)

    empty = pa.table({"event_type": pa.array([], pa.string()),
                      "credit": pa.array([], pa.int64()),
                      "touches": pa.array([], pa.int64())})

    def kernel(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or key_col not in t.column_names:
            return empty
        keys = t[key_col].combine_chunks()
        ts = t["__t"].to_numpy(zero_copy_only=False)
        ty = t["__ty"].combine_chunks()
        cents = t["__c"].to_numpy(zero_copy_only=False)
        codes = pc.dictionary_encode(keys).indices.to_numpy(
            zero_copy_only=False).astype(np.int64)
        is_conv = pc.equal(ty, conv_type).to_numpy(
            zero_copy_only=False)
        is_touch = ~is_conv
        conv = np.flatnonzero(is_conv & (cents > 0))
        if len(conv) == 0:
            return empty
        # per-segment monotone offset (the _window_bounds_time trick):
        # gaps wider than the horizon make ONE global searchsorted give
        # the per-key window [t-h, t) with no cross-key leakage
        from ..functions.segments import segment_ids

        seg_start, row_in_seg, is_start = segment_ids(codes)
        rel = ts - ts[seg_start]
        start_pos = np.flatnonzero(is_start)
        seg_ends = np.append(start_pos[1:], len(codes))
        span_t = rel[seg_ends - 1]
        seg_off = np.zeros(len(start_pos), np.int64)
        if len(start_pos) > 1:
            seg_off[1:] = np.cumsum(span_t[:-1] + h + 1)
        mono = rel + np.repeat(seg_off, seg_ends - start_pos)
        lo = np.searchsorted(mono, mono[conv] - h, "left")
        hi = np.searchsorted(mono, mono[conv], "left")
        lo = np.maximum(lo, seg_start[conv])
        hi = np.maximum(hi, lo)
        spans = hi - lo
        if int(spans.sum()) > max_expansion:
            raise ValueError("linear_attribution: window expansion "
                             f"{int(spans.sum())} exceeds max_expansion"
                             f"={max_expansion} — shrink the horizon")
        total = int(spans.sum())
        if total == 0:
            return empty
        gid = np.repeat(np.arange(len(conv)), spans)
        rows = (np.arange(total)
                - np.repeat(np.cumsum(spans) - spans, spans)
                + lo[gid])
        m = is_touch[rows]
        # 1-based rank among the conversion's touches, in row order
        # (= (ts, seq) order — the partition sort)
        c = np.cumsum(m)
        blk0 = np.minimum(np.cumsum(spans) - spans, total - 1)
        base = np.where(spans > 0, c[blk0] - m[blk0], 0)
        rank = c - base[gid]
        gid_t, rank_t, rows_t = gid[m], rank[m], rows[m]
        n = np.bincount(gid_t, minlength=len(conv)).astype(np.int64)
        cc = cents[conv]
        credit = (cc[gid_t] // n[gid_t]
                  + (rank_t <= cc[gid_t] % n[gid_t]))
        tcodes_arr = pc.dictionary_encode(ty.take(
            pa.array(rows_t, pa.int64())))
        tcodes = tcodes_arr.indices.to_numpy(zero_copy_only=False)
        tvals = tcodes_arr.dictionary
        s = np.zeros(len(tvals), np.int64)
        cnt = np.zeros(len(tvals), np.int64)
        np.add.at(s, tcodes, credit)
        np.add.at(cnt, tcodes, 1)
        return pa.table({"event_type": tvals.cast(pa.string()),
                         "credit": pa.array(s),
                         "touches": pa.array(cnt)})

    partials = partitioned_map(prepped, kernel, key=key_col,
                               sort_keys=[key_col, "__t", "__s"],
                               num_partitions=num_partitions,
                               strategy="tasks")
    agg: dict = {}
    for blk in ray.get(materialized_block_refs(partials)):
        for et, cr, tc in zip(blk["event_type"].to_pylist(),
                              blk["credit"].to_pylist(),
                              blk["touches"].to_pylist()):
            c0, t0 = agg.get(et, (0, 0))
            agg[et] = (c0 + cr, t0 + tc)
    types = sorted(agg)
    return pa.table({
        "event_type": pa.array(types, pa.string()),
        "credit_cents": pa.array([agg[t][0] for t in types], pa.int64()),
        "n_touches": pa.array([agg[t][1] for t in types], pa.int64()),
    })
