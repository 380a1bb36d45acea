"""Cyclical seasonal profile + peak detection — fold timestamps onto a
repeating period (hour-of-day, day-of-week), aggregate a value per
(group, phase bin), and elect each group's PEAK bin by mean value.
The seasonality diagnostic behind traffic-shaped batch scheduling and
per-cohort activity fingerprints (distinct from ``tumbling_window``:
this is phase-folded ``(ts // width) % n_bins``, not calendar
buckets).

Exactness: per-bin sufficient statistics are exact int64 (count +
cents); the peak election ranks bins by ``CAST(cents AS DOUBLE) /
CAST(n AS DOUBLE)`` — ONE IEEE division, identical in SQL — with ties
broken by lowest bin, so the winner replays bit-exactly
(``row_number() OVER (ORDER BY mean DESC, bin)``).

Scale shape: per-block ``(group, bin, n, cents)`` partials via dense
``code·n_bins + bin`` cells, ONE group-keyed exchange of the tiny
partial rows, per-group argmax in the kernel.  Timestamps must be
non-negative (epoch-us after 1970 — trunc/floor division agree;
negative ts raise rather than silently disagreeing with SQL ``//``).

Reference analog: none; companion of ``window.tumbling_window_stats``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["seasonal_peak"]


def seasonal_peak(ds, *, group_col: str, ts_col: str, value_col: str,
                  bin_width_s: int = 3600, n_bins: int = 24,
                  num_partitions: int = 8):
    """Per-group phase profile over ``bin = (ts_us // width) % n_bins``
    plus the peak bin by mean cents: returns ``(group_col, bin:int64,
    n:int64, cents:int64, is_peak:bool)`` — every populated bin, with
    exactly one peak row per group.  NULL group/ts rows drop; NULL
    values count 0 cents."""
    from .partition import partitioned_map

    width = int(bin_width_s) * 1_000_000

    def partial(b: pa.Table) -> pa.Table:
        gtype = b.schema.field(group_col).type
        empty = pa.table({group_col: pa.array([], gtype),
                          "bin": pa.array([], pa.int64()),
                          "n": pa.array([], pa.int64()),
                          "cents": pa.array([], pa.int64())})
        keep = pc.fill_null(pc.and_(pc.is_valid(b[group_col]),
                                    pc.is_valid(b[ts_col])), False)
        if not pc.all(keep).as_py():
            b = b.filter(keep)
        if b.num_rows == 0:
            return empty
        ts = b[ts_col].combine_chunks()
        if pa.types.is_timestamp(ts.type):
            ts = ts.cast(pa.int64())
        t = ts.to_numpy(zero_copy_only=False)
        if t.min() < 0:
            raise ValueError("seasonal_peak: negative timestamps — "
                             "trunc vs floor division would diverge")
        bins = (t // width) % n_bins
        from ..functions.segments import cents_exact

        cents = cents_exact(b[value_col].combine_chunks(),
                            col=value_col)
        gd = pc.dictionary_encode(b[group_col].combine_chunks())
        codes = gd.indices.to_numpy(zero_copy_only=False).astype(
            np.int64)
        cell = codes * n_bins + bins
        ucell, inv = np.unique(cell, return_inverse=True)
        n = np.zeros(len(ucell), np.int64)
        s = np.zeros(len(ucell), np.int64)
        np.add.at(n, inv, 1)
        np.add.at(s, inv, cents)
        return pa.table({
            group_col: gd.dictionary.take(
                pa.array(ucell // n_bins, pa.int64())),
            "bin": pa.array((ucell % n_bins).astype(np.int64)),
            "n": pa.array(n), "cents": pa.array(s)})

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True, batch_size=None)

    schema = ds.schema()
    base = getattr(schema, "base_schema", schema)
    gtype = base.field(group_col).type
    empty = pa.table({group_col: pa.array([], gtype),
                      "bin": pa.array([], pa.int64()),
                      "n": pa.array([], pa.int64()),
                      "cents": pa.array([], pa.int64()),
                      "is_peak": pa.array([], pa.bool_())})

    def kernel(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or group_col not in t.column_names:
            return empty
        keys = t[group_col].combine_chunks()
        codes = pc.dictionary_encode(keys).indices.to_numpy(
            zero_copy_only=False).astype(np.int64)
        bins = t["bin"].to_numpy(zero_copy_only=False)
        # combine duplicate (group, bin) partial rows (sorted order)
        new_run = np.concatenate(
            [[True], (codes[1:] != codes[:-1]) | (bins[1:] != bins[:-1])])
        starts = np.flatnonzero(new_run)
        n = np.add.reduceat(t["n"].to_numpy(zero_copy_only=False),
                            starts).astype(np.int64)
        s = np.add.reduceat(t["cents"].to_numpy(zero_copy_only=False),
                            starts).astype(np.int64)
        g = codes[starts]
        b = bins[starts]
        mean = s.astype(np.float64) / n.astype(np.float64)
        # per-group argmax: order by (group, -mean, bin), take first
        order = np.lexsort((b, -mean, g))
        gfirst = np.concatenate([[True], g[order][1:] != g[order][:-1]])
        peak = np.zeros(len(g), bool)
        peak[order[gfirst]] = True
        return pa.table({
            group_col: keys.take(pa.array(starts, pa.int64())),
            "bin": pa.array(b), "n": pa.array(n), "cents": pa.array(s),
            "is_peak": pa.array(peak)})

    return partitioned_map(partials, kernel, key=group_col,
                           sort_keys=[group_col, "bin"],
                           num_partitions=num_partitions,
                           strategy="tasks")
