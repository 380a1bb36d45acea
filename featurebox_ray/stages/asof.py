"""Point-in-time-correct as-of join (backfill) — SURVEY.md §2.4 / §7.3 step 5.

For every left row (turn) pick the latest right row (feature update) of the
same ``key`` with ``right.ts <= left.ts`` (or ``< ts`` when ``strict``, the
leakage-control flag).  Generalizes the reference's broadcast element-property
lookup (featurebox/featurizers/compositionfeaturizer.py:79) along the time
axis.

Physical plan (no driver-side work, one shuffle):

1. tag both sides (``__side``: right sorts before left at equal ts for
   ``<=`` semantics, after it for strict ``<``), harmonize schemas with null
   columns, ``union``;
2. conv-hash ``partitioned_map`` sorted by ``(key, ts, __side, right value
   cols)`` — every key's merged timeline is contiguous and ordered;
3. one vectorized pass: ``last_occurrence_index`` (a segmented running
   maximum over right-row positions) gives, for each left row, the most
   recent visible right row; Arrow ``take`` with null indices materializes
   the backfilled columns (null where no update precedes the turn — the
   null-backfill path for keys absent from the right side).

Ties at identical ``(key, ts)`` on the right side resolve to the row with the
largest value tuple (deterministic; the oracle SQL replicates this with a
ROW_NUMBER dedup).

The monotonic-ts watermark invariant of the north rule holds by construction:
within a partition the cursor (running max) never moves backward, and a
partition holds every row of its keys, so no update outside the partition can
be visible.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions import segments as seg
from .partition import partitioned_map

SIDE_COL = "__side"


def asof_join(
    left_ds,
    right_ds,
    *,
    key: str = "conv_id",
    ts_col: str = "ts",
    right_cols: Sequence[str],
    strict: bool = False,
    num_partitions: int = 32,
    strategy: str = "groupby",
    order_col: Optional[str] = None,
    direction: str = "backward",
    tolerance_s: Optional[float] = None,
):
    """As-of join two Datasets.  ``right_cols`` are the value columns pulled
    from the right side (appended to every left row, null when no match).

    ``direction="backward"`` (default) matches the latest right row with
    ``right.ts <= left.ts`` (``<`` when strict) — the point-in-time
    backfill.  ``direction="forward"`` matches the EARLIEST right row with
    ``right.ts >= left.ts`` (``>`` when strict) — the next-event lookup
    (DuckDB ``ASOF JOIN ... ON r.ts >= l.ts`` semantics).  When several
    right rows share (key, ts), backward picks the one sorting LAST by
    ``right_cols``, forward the one sorting FIRST (both deterministic).

    ``direction="nearest"`` matches the right row with the smallest
    ``|right.ts - left.ts|``; equal distances resolve to the BACKWARD
    candidate (deterministic, mirrors the point-in-time preference).
    At tied right (key, ts) the backward candidate is the row sorting
    LAST by ``right_cols`` and the forward candidate the row sorting
    FIRST — exactly the backward/forward rules composed.  ``strict``
    is meaningless for nearest and rejected.

    ``tolerance_s`` (pandas ``merge_asof(tolerance=)`` semantics): a
    match further than this many seconds from the left row is treated
    as no match (right cols null) — the staleness bound for
    point-in-time feature backfill.  For nearest the bound applies to
    the absolute gap."""
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward|forward|nearest, got {direction!r}")
    if direction == "nearest" and strict:
        raise ValueError("strict is not defined for direction='nearest'")
    tol_us = None
    if tolerance_s is not None:
        tol_us = int(round(tolerance_s * 1_000_000))
        if tol_us < 0:
            raise ValueError("tolerance_s must be non-negative")
    right_cols = list(right_cols)
    left_schema = left_ds.schema()
    left_names = list(left_schema.names)
    left_types = {n: t for n, t in zip(left_schema.names, left_schema.types)}
    right_schema = right_ds.schema()
    right_types = {n: t for n, t in zip(right_schema.names, right_schema.types)}

    overlap = [c for c in right_cols if c in left_names]
    if overlap:
        raise ValueError(f"right_cols {overlap} collide with left columns")

    left_tag = 1
    if direction in ("backward", "nearest"):
        # right rows at equal ts sort BEFORE left (match) unless strict;
        # nearest uses the backward layout — an equal-ts right row is a
        # gap-0 backward candidate, which always wins the gap compare
        right_tag = 2 if strict else 0
    else:
        # forward: right rows at equal ts sort AFTER left (match) unless
        # strict, mirroring the backward tag trick
        right_tag = 0 if strict else 2
    all_names = left_names + right_cols
    # common physical schema for union
    types = dict(left_types)
    types.update({c: right_types[c] for c in right_cols})

    def tag_left(t: pa.Table) -> pa.Table:
        n = t.num_rows
        for c in right_cols:
            t = t.append_column(c, pa.nulls(n, types[c]))
        return t.append_column(SIDE_COL, pa.array(np.full(n, left_tag, np.int8)))

    def tag_right(t: pa.Table) -> pa.Table:
        n = t.num_rows
        cols = {}
        for c in all_names:
            if c in (key, ts_col):
                cols[c] = t[c].cast(types[c])
            elif c in right_cols:
                cols[c] = t[c]
            else:
                cols[c] = pa.nulls(n, types[c])
        out = pa.table(cols)
        return out.append_column(SIDE_COL, pa.array(np.full(n, right_tag, np.int8)))

    lt = left_ds.map_batches(tag_left, batch_format="pyarrow", zero_copy_batch=True)
    rt = right_ds.map_batches(tag_right, batch_format="pyarrow", zero_copy_batch=True)
    unioned = lt.union(rt)

    def merge(table: pa.Table) -> pa.Table:
        import pyarrow.compute as pc_

        codes = pc_.dictionary_encode(table[key].combine_chunks()).indices.to_numpy(
            zero_copy_only=False
        )
        side = table[SIDE_COL].combine_chunks().to_numpy()
        seg_start, _, is_start = seg.segment_ids(codes)
        is_right = side == right_tag
        left_mask = side == left_tag
        if direction == "backward":
            match = seg.last_occurrence_index(is_right, seg_start)
        elif direction == "forward":
            n = len(codes)
            starts_idx = np.flatnonzero(is_start)
            ends = np.append(starts_idx[1:], n)
            seg_id = np.cumsum(is_start) - 1
            match = seg.next_occurrence_index(is_right, ends[seg_id])
        else:  # nearest: both scans, smaller |gap| wins, tie -> backward
            n = len(codes)
            starts_idx = np.flatnonzero(is_start)
            ends = np.append(starts_idx[1:], n)
            seg_id = np.cumsum(is_start) - 1
            mb = seg.last_occurrence_index(is_right, seg_start)
            mf = seg.next_occurrence_index(is_right, ends[seg_id])
            ts_i = (table[ts_col].combine_chunks().cast(pa.int64())
                    .to_numpy(zero_copy_only=False))
            big = np.iinfo(np.int64).max // 2
            gb = np.where(mb >= 0, ts_i - ts_i[np.where(mb >= 0, mb, 0)], big)
            gf = np.where(mf >= 0, ts_i[np.where(mf >= 0, mf, 0)] - ts_i, big)
            match = np.where(gb <= gf, mb, mf)
        left_pos = np.flatnonzero(left_mask)
        src = match[left_pos]  # right row index per left row, -1 = none
        if tol_us is not None:
            # the bound must be in the ts column's NATIVE unit: scale
            # from seconds by the Arrow timestamp unit; plain numeric ts
            # columns follow the repo's int64-microseconds convention
            tt = table.schema.field(ts_col).type
            unit = tt.unit if pa.types.is_timestamp(tt) else "us"
            tol_native = int(round(
                (tol_us / 1_000_000)
                * {"s": 1, "ms": 10**3, "us": 10**6, "ns": 10**9}[unit]))
            ts_np = (table[ts_col].combine_chunks().cast(pa.int64())
                     .to_numpy(zero_copy_only=False))
            has = src >= 0
            gap = np.abs(ts_np[left_pos] - ts_np[np.where(has, src, 0)])
            src = np.where(has & (gap <= tol_native), src, -1)
        idx = pa.array(
            np.where(src >= 0, src, 0),
            type=pa.int64(),
            mask=(src < 0),
        )
        out = table.filter(pa.array(left_mask)).drop_columns(
            [SIDE_COL] + right_cols
        )
        for c in right_cols:
            out = out.append_column(c, table[c].take(idx))
        return out

    # order_col last: deterministic output order for left rows tied on
    # (key, ts) — same key list the fused transcript pipeline uses
    sort_keys = [key, ts_col, SIDE_COL] + right_cols
    if order_col is not None:
        sort_keys.append(order_col)
    return partitioned_map(
        unioned,
        merge,
        key=key,
        sort_keys=sort_keys,
        num_partitions=num_partitions,
        strategy=strategy,
    )


def asof_interpolate(left, right, *, key: str, ts_col: str,
                     left_id: str, right_id: str, value_col: str,
                     out_col: str = "interp",
                     num_partitions: int = 16, left_schema=None):
    """Interpolating as-of join — for every left row, the LINEAR
    interpolation of the right series at the left timestamp (between
    the bracketing right rows of the same key), the middle ground
    between backward as-of (:func:`asof_join`, stale value) and
    nearest (q104): align a slowly-sampled metric onto event
    timestamps without staircase bias.

    Semantics: the right side first collapses to one value per
    DISTINCT (key, ts) — last-write-wins by ``right_id`` (the
    resample_linear convention that makes interpolation unambiguous
    under ts ties); an exact ts hit returns that value; a left row
    strictly inside a bracket gets ``v0 + (v1−v0)·((t−t0)/(t1−t0))``
    in that FIXED correctly-rounded IEEE order (bit-exact in SQL); a
    left row before the key's first or after its last right row — or
    with no right rows at all — emits NULL.

    ONE tagged-union key-keyed exchange sorted ``(key, ts, side,
    right_id)`` with right rows leading each timestamp; the kernel is
    one segmented searchsorted.  NULL key/ts (and right NULL value)
    rows drop.  Emits the left ``(key, ts_col, left_id)`` plus
    ``out_col`` (float64).

    Reference analog: none (time-axis extension of the as-of family,
    north-rule step 5).
    """
    # the flagship left_schema convention: .schema() on a lazy
    # MAPPED dataset executes a full block just for column types —
    # callers with mapped inputs pass the schema explicitly
    schema = left_schema if left_schema is not None else left.schema()
    base = getattr(schema, "base_schema", schema)
    ktype = base.field(key).type
    ttype = base.field(ts_col).type
    is_ts = pa.types.is_timestamp(ttype)

    def prep_left(b: pa.Table) -> pa.Table:
        keep = pc.fill_null(pc.and_(
            pc.and_(pc.is_valid(b[key]), pc.is_valid(b[ts_col])),
            pc.is_valid(b[left_id])), False)
        if not pc.all(keep).as_py():
            b = b.filter(keep)
        ts = b[ts_col].combine_chunks()
        return pa.table({
            key: b[key],
            "__ts": ts.cast(pa.int64()) if is_ts else ts,
            "__side": pa.array(np.ones(b.num_rows, np.int8)),
            "__id": b[left_id].combine_chunks().cast(pa.int64()),
            "__v": pa.nulls(b.num_rows, pa.float64())})

    def prep_right(b: pa.Table) -> pa.Table:
        keep = pc.is_valid(b[key])
        for c in (ts_col, value_col, right_id):
            keep = pc.and_(keep, pc.is_valid(b[c]))
        keep = pc.fill_null(keep, False)
        if not pc.all(keep).as_py():
            b = b.filter(keep)
        ts = b[ts_col].combine_chunks()
        return pa.table({
            key: b[key],
            "__ts": ts.cast(pa.int64()) if is_ts else ts,
            "__side": pa.array(np.zeros(b.num_rows, np.int8)),
            "__id": b[right_id].combine_chunks().cast(pa.int64()),
            "__v": pc.cast(b[value_col].combine_chunks(),
                           pa.float64())})

    unioned = (left.map_batches(prep_left, batch_format="pyarrow",
                                zero_copy_batch=True)
               .union(right.map_batches(prep_right,
                                        batch_format="pyarrow",
                                        zero_copy_batch=True)))

    empty = pa.table({key: pa.array([], ktype),
                      ts_col: pa.array([], pa.int64()),
                      left_id: pa.array([], pa.int64()),
                      out_col: pa.array([], pa.float64())})

    def kernel(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or key not in t.column_names:
            return empty
        keys = t[key].combine_chunks()
        enc = pc.dictionary_encode(keys)
        codes = enc.indices.to_numpy(
            zero_copy_only=False).astype(np.int64)
        ts = t["__ts"].to_numpy(zero_copy_only=False)
        side = t["__side"].to_numpy(zero_copy_only=False)
        rid = pc.fill_null(t["__id"].combine_chunks(), 0).to_numpy(
            zero_copy_only=False).astype(np.int64)
        v = pc.fill_null(t["__v"].combine_chunks(),
                         np.nan).to_numpy(zero_copy_only=False)
        out_k, out_t, out_i, out_v = [], [], [], []
        seg_start = np.flatnonzero(
            np.concatenate([[True], codes[1:] != codes[:-1]]))
        seg_end = np.append(seg_start[1:], len(codes))
        for s0, s1 in zip(seg_start.tolist(), seg_end.tolist()):
            sl = slice(s0, s1)
            r = side[sl] == 0
            lmask = ~r
            if not lmask.any():
                continue
            lts = ts[sl][lmask]
            lid = rid[sl][lmask]
            rts_all = ts[sl][r]
            rv_all = v[sl][r]
            # last-write-wins per distinct right ts (sorted by
            # (ts, id): keep the LAST of each ts run)
            if len(rts_all):
                lastw = np.concatenate(
                    [rts_all[:-1] != rts_all[1:], [True]])
                rts, rv = rts_all[lastw], rv_all[lastw]
            else:
                rts = np.empty(0, np.int64)
                rv = np.empty(0, np.float64)
            yv = np.full(len(lts), np.nan)
            if len(rts):
                i0 = np.searchsorted(rts, lts, side="right") - 1
                inside = (i0 >= 0) & (lts <= rts[-1])
                i0c = np.clip(i0, 0, len(rts) - 1)
                t0, v0 = rts[i0c], rv[i0c]
                hit = (t0 == lts) & inside
                i1 = np.clip(i0c + 1, 0, len(rts) - 1)
                t1, v1 = rts[i1], rv[i1]
                den = np.where(t1 > t0, t1 - t0, 1)
                frac = ((lts - t0).astype(np.float64)
                        / den.astype(np.float64))
                lerp = v0 + (v1 - v0) * frac
                yv = np.where(hit, v0,
                              np.where(inside & ~hit, lerp, np.nan))
            out_k.append(np.full(len(lts), codes[s0], np.int64))
            out_t.append(lts)
            out_i.append(lid)
            out_v.append(yv)
        if not out_k:
            return empty
        kcodes = np.concatenate(out_k)
        yall = np.concatenate(out_v)
        return pa.table({
            key: enc.dictionary.take(pa.array(kcodes, pa.int64())),
            ts_col: pa.array(np.concatenate(out_t)),
            left_id: pa.array(np.concatenate(out_i)),
            out_col: pa.array(yall, pa.float64(),
                              mask=np.isnan(yall))})

    return partitioned_map(unioned, kernel, key=key,
                           sort_keys=[key, "__ts", "__side",
                                      "__id"],
                           num_partitions=num_partitions,
                           strategy="tasks")


def asof_leakage_audit(joined_ds, right_ds, *, key: str,
                       ts_col: str, matched_ts_col: str,
                       num_partitions: int = 16):
    """Temporal-leakage audit as an OPERATOR — the north-rule's
    zero-leakage probe promoted from test to first-class pipeline
    stage: given an as-of join's OUTPUT (each left row carrying the
    matched right timestamp) and the right table itself, recompute
    the correct backward as-of choice per row and count
    disagreements.  ``n_mismatch > 0`` means the join either looked
    into the future (leakage) or missed the latest eligible version
    (staleness) — both audit-fatal.

    Emits per key: ``(key, n_rows:int64, n_matched:int64,
    n_mismatch:int64)``.  One tagged-union keyed exchange (right rows
    tag 0, joined rows tag 1, sorted by ts within the run); expected
    match via one searchsorted over run-offset-normalized timestamps
    (the q311 stride trick, overflow-guarded).  NULL key/ts rows of
    either side drop; a NULL ``matched_ts_col`` is correct exactly
    when no right row is at-or-before the left ts.
    Reference analog: the operator form of the flagship's
    leakage-probe tests (north_star contract)."""
    import ray

    from .partition import partitioned_map

    schema = joined_ds.schema()
    base = getattr(schema, "base_schema", schema)
    key_type = base.field(key).type

    def tag_right(b: pa.Table) -> pa.Table:
        keep = pc.fill_null(pc.and_(pc.is_valid(b[key]),
                                    pc.is_valid(b[ts_col])), False)
        if not pc.all(keep).as_py():
            b = b.filter(keep)
        ts = b[ts_col].combine_chunks()
        if pa.types.is_timestamp(ts.type):
            ts = ts.cast(pa.int64())
        return pa.table({key: b[key], "__tag": pa.array(
            np.zeros(b.num_rows, np.int8)),
            "__t": ts, "__m": pa.nulls(b.num_rows, pa.int64())})

    def tag_joined(b: pa.Table) -> pa.Table:
        keep = pc.fill_null(pc.and_(pc.is_valid(b[key]),
                                    pc.is_valid(b[ts_col])), False)
        if not pc.all(keep).as_py():
            b = b.filter(keep)
        ts = b[ts_col].combine_chunks()
        if pa.types.is_timestamp(ts.type):
            ts = ts.cast(pa.int64())
        mt = b[matched_ts_col].combine_chunks()
        if pa.types.is_timestamp(mt.type):
            mt = mt.cast(pa.int64())
        return pa.table({key: b[key], "__tag": pa.array(
            np.ones(b.num_rows, np.int8)),
            "__t": ts, "__m": mt.cast(pa.int64())})

    unioned = (right_ds.map_batches(tag_right, batch_format="pyarrow",
                                    zero_copy_batch=True)
               .union(joined_ds.map_batches(
                   tag_joined, batch_format="pyarrow",
                   zero_copy_batch=True)))

    empty = pa.table({key: pa.array([], key_type),
                      "n_rows": pa.array([], pa.int64()),
                      "n_matched": pa.array([], pa.int64()),
                      "n_mismatch": pa.array([], pa.int64())})

    def kernel(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or key not in t.column_names:
            return empty
        keys = t[key].combine_chunks()
        kc = pc.dictionary_encode(keys).indices.to_numpy(
            zero_copy_only=False).astype(np.int64)
        tag = t["__tag"].to_numpy(zero_copy_only=False)
        ts = t["__t"].to_numpy(zero_copy_only=False)
        new_key = np.concatenate([[True], kc[1:] != kc[:-1]])
        seg = np.cumsum(new_key.astype(np.int64)) - 1
        n_seg = int(seg[-1]) + 1
        mn = ts.min()
        K = np.int64(ts.max() - mn) + 2
        if np.int64(n_seg) * K >= np.int64(2 ** 62):
            raise ValueError("asof_leakage_audit: run-offset stride "
                             "overflow — raise num_partitions")
        ts_adj = (ts - mn) + seg * K
        is_r = tag == 0
        r_adj = ts_adj[is_r]                   # sorted (key, tag, ts)
        l_idx = np.flatnonzero(~is_r)
        pos = np.searchsorted(r_adj, ts_adj[l_idx], side="right") - 1
        # a hit must come from the SAME segment
        ok = pos >= 0
        exp_seg = np.where(ok, seg[np.flatnonzero(is_r)][
            np.maximum(pos, 0)], -1)
        ok &= exp_seg == seg[l_idx]
        exp_ts = np.where(ok, ts[np.flatnonzero(is_r)][
            np.maximum(pos, 0)], 0)
        m_arr = t["__m"].combine_chunks()
        m_valid = np.asarray(pc.is_valid(m_arr))[l_idx]
        m_vals = np.asarray(pc.fill_null(m_arr, 0))[l_idx]
        mismatch = (m_valid != ok) | (ok & (m_vals != exp_ts))
        # reduce per segment over joined rows
        lseg = seg[l_idx]
        n_rows = np.zeros(n_seg, np.int64)
        n_match = np.zeros(n_seg, np.int64)
        n_mis = np.zeros(n_seg, np.int64)
        np.add.at(n_rows, lseg, 1)
        np.add.at(n_match, lseg, m_valid.astype(np.int64))
        np.add.at(n_mis, lseg, mismatch.astype(np.int64))
        firsts = np.flatnonzero(new_key)
        keep = n_rows > 0                       # keys with joined rows
        return pa.table({
            key: keys.take(pa.array(firsts[keep], pa.int64())),
            "n_rows": pa.array(n_rows[keep]),
            "n_matched": pa.array(n_match[keep]),
            "n_mismatch": pa.array(n_mis[keep])})

    return partitioned_map(unioned, kernel, key=key,
                           sort_keys=[key, "__tag", "__t"],
                           num_partitions=num_partitions,
                           strategy="tasks")
