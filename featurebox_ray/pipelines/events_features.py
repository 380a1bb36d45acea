"""Flagship transcript-shaped feature pipeline applied to the driver's
``events`` table (the sandbox analog of the transcripts fact table:
``user_id`` ↔ conv_id, ``ts`` ↔ ts, ``event_id`` ↔ turn ordering,
``value`` ↔ the numeric feature source).

Every stage is the engine's generic operator with renamed columns — the
same code path the synthetic-transcript tests exercise.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions import segments as seg
from ..stages.partition import partitioned_map
from ..stages.window import WindowSpec, add_window_features

EVENT_SPEC = WindowSpec(
    key_col="user_id",
    ts_col="ts",
    value_col="value",
    lags=(1,),
    rolling_rows=(5,),
    time_windows_s=(3600.0,),
    session_gap_s=1800.0,
)


def event_features(ds, *, num_partitions: int = 32, strategy: str = "groupby"):
    """read events → user-hash partition + ts sort → window features."""
    return add_window_features(
        ds, EVENT_SPEC, order_col="event_id",
        num_partitions=num_partitions, strategy=strategy,
    )


def session_stats(ds, *, gap_s: float = 1800.0, num_partitions: int = 32):
    """One output row per (user_id, session_id): n_events, duration_s,
    mean value — computed inside the partition kernel (sessions are
    user-confined, so no second shuffle is needed)."""
    gap_us = int(gap_s * 1e6)

    def kernel(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if t.num_rows == 0:
            return pa.table({
                "user_id": pa.array([], t.schema.field("user_id").type),
                "session_id": pa.array([], pa.int64()),
                "n_events": pa.array([], pa.int64()),
                "duration_s": pa.array([], pa.float64()),
                "mean_value": pa.array([], pa.float64()),
            })
        codes = pc.dictionary_encode(t["user_id"].combine_chunks()).indices.to_numpy(
            zero_copy_only=False
        )
        ts = t["ts"].combine_chunks().cast(pa.int64()).to_numpy()
        v = t["value"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.float64)
        seg_start, row_in_seg, is_start = seg.segment_ids(codes)
        sess = seg.sessionize(ts, is_start, gap_us)
        # session key = (user run ordinal, session id) -> new segment coding
        sess_change = np.empty(len(codes), dtype=bool)
        sess_change[0] = True
        if len(codes) > 1:
            sess_change[1:] = (codes[1:] != codes[:-1]) | (sess[1:] != sess[:-1])
        sid = np.cumsum(sess_change) - 1  # global session ordinal
        starts = np.flatnonzero(sess_change)
        ends = np.append(starts[1:], len(codes))
        users = t["user_id"].combine_chunks().take(pa.array(starts))
        n_events = (ends - starts).astype(np.int64)
        # per-session sums via prefix sums
        cv = np.concatenate([[0.0], np.cumsum(v)])
        sums = cv[ends] - cv[starts]
        mean_value = sums / n_events
        duration_s = (ts[ends - 1] - ts[starts]) / 1e6
        return pa.table({
            "user_id": users,
            "session_id": pa.array(sess[starts].astype(np.int64)),
            "n_events": pa.array(n_events),
            "duration_s": pa.array(duration_s),
            "mean_value": pa.array(mean_value),
        })

    return partitioned_map(
        ds, kernel, key="user_id", sort_keys=["user_id", "ts", "event_id"],
        num_partitions=num_partitions,
    )
