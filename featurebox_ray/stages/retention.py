"""Retention cohort matrix — the classic product-analytics aggregate:
bucket every user by their FIRST activity period (the cohort), then
count how many of each cohort's users were active 0, 1, 2, … periods
later.  Output is the (cohort, offset) → active-user-count long table
that retention heatmaps draw.

Physical plan: ONE user-keyed exchange (first activity and all
activity periods of a user are needed together — same co-location
contract as every window stage); the kernel walks user segments
vectorized (cohort = segment-min period via ``np.minimum.reduceat``,
distinct (user, period) pairs via a sorted run mask) and emits one row
per distinct (user, period) — already user-deduplicated, so the second
exchange is a plain int64 partial-count sum per (cohort, offset), the
cheapest aggregate shape in the repo.

Everything is int64 (epoch-period buckets, counts) — exact under any
partitioning; the SQL replay is exact by construction.

NULL ts rows drop (they are in no period); NULL keys form one user
(SQL GROUP BY semantics — mirror with IS NOT DISTINCT FROM if the key
can be NULL).

Reference analog: none (beyond-reference behavioral aggregate next to
funnel_features and session stats).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_PERIOD_US = {"day": 86_400_000_000, "week": 604_800_000_000}


def retention_cohorts(ds, *, key_col: str = "user_id",
                      ts_col: str = "ts", period: str = "week",
                      num_partitions: int = 16):
    """Long-form retention matrix: ``(cohort:int64, offset:int64,
    n_users:int64)`` — cohort = the user's first activity period
    (``epoch_us // period_us``), offset = activity period − cohort,
    n_users = distinct users of that cohort active at that offset.
    """
    from .partition import partitioned_map

    if period not in _PERIOD_US:
        raise ValueError(f"period must be one of {sorted(_PERIOD_US)}")
    width = _PERIOD_US[period]

    def prep(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b[ts_col]))
        ts = b[ts_col].combine_chunks()
        ts_i = (ts.cast(pa.int64()) if pa.types.is_timestamp(ts.type)
                else ts)
        per = pc.divide(ts_i, width)
        return pa.table({key_col: b[key_col], "__per": per})

    def per_user(t: pa.Table) -> pa.Table:
        empty = pa.table({"cohort": pa.array([], pa.int64()),
                          "offset": pa.array([], pa.int64()),
                          "cnt": pa.array([], pa.int64())})
        if t.num_rows == 0 or key_col not in t.column_names:
            return empty
        keys = t[key_col].combine_chunks()
        per = t["__per"].to_numpy(zero_copy_only=False)
        enc = pc.dictionary_encode(keys)
        codes = (pc.fill_null(enc.indices, -1)
                 .to_numpy(zero_copy_only=False).astype(np.int64))
        # partitioned_map delivered the partition sorted by
        # (user, period): distinct (user, period) pairs are run starts
        c_s, p_s = codes, per
        new_pair = np.concatenate(
            [[True], (c_s[1:] != c_s[:-1]) | (p_s[1:] != p_s[:-1])])
        new_user = np.concatenate([[True], c_s[1:] != c_s[:-1]])
        u_starts = np.flatnonzero(new_user)
        cohort_per_user = np.minimum.reduceat(p_s, u_starts)
        user_run = np.cumsum(new_user) - 1
        sel = np.flatnonzero(new_pair)
        cohort = cohort_per_user[user_run[sel]]
        offset = p_s[sel] - cohort
        # partial counts per (cohort, offset) — one row per distinct
        # (user, period), so summing counts users exactly once
        pair = cohort * (offset.max() + 1 if len(offset) else 1) + offset
        u, inv = np.unique(pair, return_inverse=True)
        cnt = np.bincount(inv)
        # recover (cohort, offset) for the unique pairs
        first = np.zeros(len(u), np.int64)
        first[inv] = np.arange(len(inv))
        return pa.table({
            "cohort": pa.array(cohort[first], pa.int64()),
            "offset": pa.array(offset[first], pa.int64()),
            "cnt": pa.array(cnt.astype(np.int64)),
        })

    prepped = ds.map_batches(prep, batch_format="pyarrow",
                             zero_copy_batch=True)
    partials = partitioned_map(prepped, per_user, key=key_col,
                               sort_keys=[key_col, "__per"],
                               num_partitions=num_partitions,
                               strategy="tasks")

    def combine(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "cohort" not in t.column_names:
            return pa.table({"cohort": pa.array([], pa.int64()),
                             "offset": pa.array([], pa.int64()),
                             "n_users": pa.array([], pa.int64())})
        co = t["cohort"].to_numpy(zero_copy_only=False)
        of = t["offset"].to_numpy(zero_copy_only=False)
        cn = t["cnt"].to_numpy(zero_copy_only=False)
        key = co * (of.max() + 1) + of
        u, inv = np.unique(key, return_inverse=True)
        sums = np.zeros(len(u), np.int64)
        np.add.at(sums, inv, cn)
        first = np.zeros(len(u), np.int64)
        first[inv] = np.arange(len(inv))
        return pa.table({
            "cohort": pa.array(co[first], pa.int64()),
            "offset": pa.array(of[first], pa.int64()),
            "n_users": pa.array(sums),
        })

    return partitioned_map(partials, combine, key="cohort",
                           sort_keys=["cohort", "offset"],
                           num_partitions=min(num_partitions, 8),
                           strategy="tasks")


def cohort_value_curve(ds, *, key_col: str = "user_id",
                       ts_col: str = "ts", value_col: str = "value",
                       period: str = "week",
                       num_partitions: int = 16):
    """Cohort VALUE curve (LTV buildup) — the revenue companion of
    :func:`retention_cohorts`: for every (cohort, offset) cell, the
    exact total of ``value_col`` (quantized to cents) generated by the
    cohort's users that many periods after their first activity.

    Same two-exchange shape: the user-keyed kernel derives each user's
    cohort (first period — rows arrive sorted by (user, period)) and
    collapses to per-partition ``(cohort, offset, cents)`` int64
    partials (composite ``cohort·2^20 + offset`` codes — offsets
    beyond 2^20 periods raise); the second tiny exchange finishes the
    sums.  NULL key/ts rows drop; NULL value counts 0 (mirrors SQL
    ``coalesce``).  Emits ``(cohort:int64, offset:int64,
    cents:int64)``.
    """
    from .partition import partitioned_map

    if period not in _PERIOD_US:
        raise ValueError(f"period must be one of {sorted(_PERIOD_US)}")
    width = _PERIOD_US[period]

    def prep(b: pa.Table) -> pa.Table:
        keep = pc.and_(pc.is_valid(b[key_col]), pc.is_valid(b[ts_col]))
        if not pc.all(keep).as_py():
            b = b.filter(keep)
        ts = b[ts_col].combine_chunks()
        ts_i = (ts.cast(pa.int64()) if pa.types.is_timestamp(ts.type)
                else ts)
        per = pc.divide(ts_i, width)
        from ..functions.segments import cents_exact

        cents = cents_exact(b[value_col].combine_chunks(),
                            col=value_col)
        return pa.table({key_col: b[key_col], "__per": per,
                         "__c": pa.array(cents)})

    def kernel(t: pa.Table) -> pa.Table:
        empty = pa.table({"cohort": pa.array([], pa.int64()),
                          "offset": pa.array([], pa.int64()),
                          "cents": pa.array([], pa.int64())})
        if t.num_rows == 0 or key_col not in t.column_names:
            return empty
        codes = pc.dictionary_encode(
            t[key_col].combine_chunks()).indices.to_numpy(
            zero_copy_only=False).astype(np.int64)
        per = t["__per"].to_numpy(zero_copy_only=False)
        cents = t["__c"].to_numpy(zero_copy_only=False)
        seg_start = np.flatnonzero(np.concatenate(
            [[True], codes[1:] != codes[:-1]]))
        run_id = np.cumsum(np.concatenate(
            [[0], (codes[1:] != codes[:-1]).astype(np.int64)]))
        cohort = per[seg_start][run_id]   # sorted by (user, per)
        offset = per - cohort
        if offset.size and int(offset.max()) >= (1 << 20):
            raise ValueError("cohort_value_curve: offset exceeds 2^20 "
                             "periods — widen the period")
        comp = cohort * (1 << 20) + offset
        u, inv = np.unique(comp, return_inverse=True)
        s = np.zeros(len(u), np.int64)
        np.add.at(s, inv, cents)
        return pa.table({"cohort": pa.array(u >> 20, pa.int64()),
                         "offset": pa.array(u & ((1 << 20) - 1),
                                            pa.int64()),
                         "cents": pa.array(s)})

    def combine(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "cohort" not in t.column_names:
            return pa.table({"cohort": pa.array([], pa.int64()),
                             "offset": pa.array([], pa.int64()),
                             "cents": pa.array([], pa.int64())})
        comp = (t["cohort"].to_numpy(zero_copy_only=False)
                * (1 << 20)
                + t["offset"].to_numpy(zero_copy_only=False))
        u, inv = np.unique(comp, return_inverse=True)
        s = np.zeros(len(u), np.int64)
        np.add.at(s, inv, t["cents"].to_numpy(zero_copy_only=False))
        return pa.table({"cohort": pa.array(u >> 20, pa.int64()),
                         "offset": pa.array(u & ((1 << 20) - 1),
                                            pa.int64()),
                         "cents": pa.array(s)})

    prepped = ds.map_batches(prep, batch_format="pyarrow",
                             zero_copy_batch=True)
    partials = partitioned_map(prepped, kernel, key=key_col,
                               sort_keys=[key_col, "__per"],
                               num_partitions=num_partitions,
                               strategy="tasks")
    return partitioned_map(partials, combine, key="cohort",
                           sort_keys=["cohort", "offset"],
                           num_partitions=max(num_partitions // 4, 1),
                           strategy="tasks")


def longest_streak(ds, *, key_col: str = "user_id",
                   ts_col: str = "ts", period: str = "day",
                   num_partitions: int = 16):
    """Per-key longest streak of CONSECUTIVE active periods — the
    engagement/habit feature (max run of days with ≥1 event), the
    gaps-and-islands maximum at corpus scale.

    ONE key-keyed exchange sorted ``(key, period)``; the kernel
    dedupes each key's periods (runs of equal values), marks
    consecutive steps (``diff == 1``) and takes the longest run —
    all vectorized run-length math, exact ints.  SQL replays with
    the classic ``period − row_number()`` island grouping.  NULL
    key/ts rows drop.  Emits ``(key_col, n_periods:int64,
    longest:int64)``.
    """
    from .partition import partitioned_map

    if period not in _PERIOD_US:
        raise ValueError(f"period must be one of {sorted(_PERIOD_US)}")
    width = _PERIOD_US[period]
    schema = ds.schema()
    base = getattr(schema, "base_schema", schema)
    ktype = base.field(key_col).type

    def prep(b: pa.Table) -> pa.Table:
        keep = pc.and_(pc.is_valid(b[key_col]), pc.is_valid(b[ts_col]))
        if not pc.all(keep).as_py():
            b = b.filter(keep)
        ts = b[ts_col].combine_chunks()
        ts_i = (ts.cast(pa.int64()) if pa.types.is_timestamp(ts.type)
                else ts)
        return pa.table({key_col: b[key_col],
                         "__per": pc.divide(ts_i, width)})

    def kernel(t: pa.Table) -> pa.Table:
        empty = pa.table({key_col: pa.array([], ktype),
                          "n_periods": pa.array([], pa.int64()),
                          "longest": pa.array([], pa.int64())})
        if t.num_rows == 0 or key_col not in t.column_names:
            return empty
        keys = t[key_col].combine_chunks()
        codes = pc.dictionary_encode(keys).indices.to_numpy(
            zero_copy_only=False).astype(np.int64)
        per = t["__per"].to_numpy(zero_copy_only=False)
        # distinct (key, period): rows sorted by (key, per)
        first = np.concatenate([[True], (codes[1:] != codes[:-1])
                                | (per[1:] != per[:-1])])
        codes, per = codes[first], per[first]
        key_rows = np.flatnonzero(first)
        n_keys = int(codes.max()) + 1
        n_per = np.bincount(codes, minlength=n_keys).astype(np.int64)
        # island id: a new island starts at a key change or a gap > 1
        new_island = np.concatenate(
            [[True], (codes[1:] != codes[:-1])
             | (per[1:] != per[:-1] + 1)])
        isl = np.cumsum(new_island) - 1
        isl_len = np.bincount(isl).astype(np.int64)
        isl_key = codes[np.flatnonzero(new_island)]
        longest = np.zeros(n_keys, np.int64)
        np.maximum.at(longest, isl_key, isl_len)
        first_rows = np.searchsorted(codes, np.arange(n_keys))
        return pa.table({
            key_col: keys.take(pa.array(key_rows[first_rows],
                                        pa.int64())),
            "n_periods": pa.array(n_per),
            "longest": pa.array(longest),
        })

    prepped = ds.map_batches(prep, batch_format="pyarrow",
                             zero_copy_batch=True)
    return partitioned_map(prepped, kernel, key=key_col,
                           sort_keys=[key_col, "__per"],
                           num_partitions=num_partitions,
                           strategy="tasks")
