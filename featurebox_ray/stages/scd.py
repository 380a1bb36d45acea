"""SCD-2 intervalization — collapse a per-key event stream into
slowly-changing-dimension validity intervals: one row per consecutive
run of equal state, carrying ``[valid_from, valid_to)`` with an open
``valid_to`` on the current state.  The standard shape for turning an
append-only changelog into a time-travel dimension table (join any
fact row to the state that was valid at its timestamp).

Shape: ONE key-keyed exchange; the kernel is a single vectorized
run-length pass over ``(key, ts, seq)``-sorted rows (state runs are
contiguous per key, ``valid_to`` = next run's ``valid_from``).  All
outputs are int64 timestamps/counts — order-independent and SQL-exact
(gaps-and-islands replay).

Reference analog: none; the feature-engineering sibling of
``stages/cdc.py`` (cdc gives the latest state, scd2 gives the full
validity history).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["scd2_intervals"]


def scd2_intervals(ds, *, key_col: str, ts_col: str, seq_col: str,
                   state_col: str, num_partitions: int = 16):
    """Returns ``(key_col, state:string, valid_from:int64,
    valid_to:int64|NULL, n_rows:int64)`` — one row per consecutive
    equal-state run in ``(ts, seq)`` order; NULL key/ts/seq/state rows
    drop (mirror the filter in SQL)."""
    from .partition import partitioned_map

    def prep(b: pa.Table) -> pa.Table:
        keep = pc.and_(pc.and_(pc.is_valid(b[key_col]),
                               pc.is_valid(b[ts_col])),
                       pc.and_(pc.is_valid(b[seq_col]),
                               pc.is_valid(b[state_col])))
        if not pc.all(keep).as_py():
            b = b.filter(keep)
        ts = b[ts_col].combine_chunks()
        if pa.types.is_timestamp(ts.type):
            ts = ts.cast(pa.int64())
        return pa.table({key_col: b[key_col], "__t": ts,
                         "__s": b[seq_col],
                         "__st": b[state_col].combine_chunks().cast(
                             pa.string())})

    key_type = ds.schema()
    key_type = getattr(key_type, "base_schema", key_type).field(
        key_col).type
    empty = pa.table({key_col: pa.array([], key_type),
                      "state": pa.array([], pa.string()),
                      "valid_from": pa.array([], pa.int64()),
                      "valid_to": pa.array([], pa.int64()),
                      "n_rows": pa.array([], pa.int64())})

    def kernel(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or key_col not in t.column_names:
            return empty
        keys = t[key_col].combine_chunks()
        ts = t["__t"].to_numpy(zero_copy_only=False)
        st = t["__st"].combine_chunks()
        kcodes = pc.dictionary_encode(keys).indices.to_numpy(
            zero_copy_only=False).astype(np.int64)
        scodes = pc.dictionary_encode(st).indices.to_numpy(
            zero_copy_only=False).astype(np.int64)
        new_key = np.concatenate([[True], kcodes[1:] != kcodes[:-1]])
        new_run = new_key | np.concatenate(
            [[True], scodes[1:] != scodes[:-1]])
        starts = np.flatnonzero(new_run)
        lens = np.diff(np.concatenate([starts, [len(kcodes)]]))
        # valid_to = next run's valid_from within the same key
        nxt = np.concatenate([starts[1:], [len(kcodes)]])
        same_key = np.zeros(len(starts), bool)
        in_rng = nxt < len(kcodes)
        same_key[in_rng] = kcodes[nxt[in_rng]] == kcodes[starts[in_rng]]
        vto = np.zeros(len(starts), np.int64)
        vto[same_key] = ts[nxt[same_key]]
        sidx = pa.array(starts, pa.int64())
        return pa.table({
            key_col: keys.take(sidx),
            "state": st.take(sidx),
            "valid_from": pa.array(ts[starts], pa.int64()),
            "valid_to": pa.array(vto, pa.int64(), mask=~same_key),
            "n_rows": pa.array(lens.astype(np.int64)),
        })

    prepped = ds.map_batches(prep, batch_format="pyarrow",
                             zero_copy_batch=True)
    return partitioned_map(prepped, kernel, key=key_col,
                           sort_keys=[key_col, "__t", "__s"],
                           num_partitions=num_partitions,
                           strategy="tasks")
