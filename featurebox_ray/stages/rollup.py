"""Distributed ROLLUP aggregate — all prefix grouping levels of
``(g1, g2)`` in ONE pass over the data (ANSI ``GROUP BY ROLLUP``).

The naive plan runs one groupby per level (three passes at two columns);
this operator computes per-block partials at the FINEST level once, and
every coarser level re-aggregates those partials, never the data:

1. per-block partial ``(g1, g2, count, int-sums)`` rows;
2. ONE g1-keyed exchange: each partition holds every ``(g1, *)`` partial
   of its g1 values, so it emits COMPLETE ``(g1, g2)`` rows (lvl 0) and
   ``(g1)`` rollup rows (lvl 1), plus a single partition-local grand
   partial (lvl 3, incomplete);
3. the ≤ num_partitions grand partials meet in one tiny final combine.

``lvl`` mirrors SQL ``GROUPING(g1, g2)``: 0 = both grouped, 1 = g2
rolled up (its output value NULL), 3 = grand total (both NULL) — so a
DuckDB ``ROLLUP`` query replays the whole table including the marker.
Aggregates are restricted to order-independent-exact reducers (count +
int64 sums); see q65.

Reference analog: none (the reference aggregates one level at a time,
e.g. the GP logbook stats flow.py:202-211); this is an added-for-100-TB
reporting primitive in the relational family.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa


def rollup_counts(ds, *, g1: str, g2: str, int_sum_cols: Sequence[str],
                  num_partitions: int = 16):
    """ROLLUP(g1, g2) with ``count(*)`` and exact int64 sums of
    ``int_sum_cols`` (pass pre-scaled integer columns — money in cents —
    so results are independent of summation order).

    Returns ``(g1, g2, lvl:int64, n_rows:int64, <sum_<col>:int64 ...>)``
    with NULL group values on rolled-up levels, exactly like SQL.
    """
    from .partition import partitioned_map

    sum_names = [f"sum_{c}" for c in int_sum_cols]

    def partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            g1: b[g1].to_pandas(), g2: b[g2].to_pandas(),
            "n_rows": np.ones(b.num_rows, np.int64),
        })
        for c, nm in zip(int_sum_cols, sum_names):
            df[nm] = b[c].to_numpy(zero_copy_only=False).astype(np.int64)
        out = df.groupby([g1, g2], as_index=False, dropna=False).sum()
        return pa.Table.from_pandas(out, preserve_index=False)

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True, batch_size=None)

    metric_cols = ["n_rows"] + sum_names

    def _typed(out: pd.DataFrame, gt1, gt2) -> pa.Table:
        # explicit Arrow types: an all-None pandas column would otherwise
        # infer the null type and break the union's fixed schema
        cols = {g1: pa.Array.from_pandas(out[g1], type=gt1),
                g2: pa.Array.from_pandas(out[g2], type=gt2),
                "lvl": pa.array(out["lvl"].to_numpy(np.int64))}
        for m in metric_cols:
            cols[m] = pa.array(out[m].to_numpy(np.int64))
        return pa.table(cols)

    def combine(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        fine = df.groupby([g1, g2], as_index=False, dropna=False)[
            metric_cols].sum()
        fine["lvl"] = np.int64(0)
        mid = df.groupby([g1], as_index=False, dropna=False)[
            metric_cols].sum()
        mid[g2] = None
        mid["lvl"] = np.int64(1)
        grand = df[metric_cols].sum().to_frame().T
        grand[g1] = None
        grand[g2] = None
        grand["lvl"] = np.int64(3)  # incomplete: merged in the final pass
        cols = [g1, g2, "lvl"] + metric_cols
        out = pd.concat([fine[cols], mid[cols], grand[cols]],
                        ignore_index=True)
        return _typed(out, t.schema.field(g1).type, t.schema.field(g2).type)

    staged = partitioned_map(partials, combine, key=g1,
                             sort_keys=[g1], num_partitions=num_partitions,
                             strategy="tasks")

    # grand partials (one per partition) meet in one tiny final combine;
    # complete rows pass through untouched.  Build both branches from the
    # SAME materialized refs — a lazy Dataset consumed twice re-executes.
    import ray

    from .partition import materialized_block_refs

    refs = materialized_block_refs(staged)

    def split_done(b: pa.Table) -> pa.Table:
        lv = b["lvl"].to_numpy(zero_copy_only=False)
        return b.filter(pa.array(lv != 3))

    def split_grand(b: pa.Table) -> pa.Table:
        lv = b["lvl"].to_numpy(zero_copy_only=False)
        return b.filter(pa.array(lv == 3))

    done = ray.data.from_arrow_refs(list(refs)).map_batches(
        split_done, batch_format="pyarrow", zero_copy_batch=True)
    grands = ray.data.from_arrow_refs(list(refs)).map_batches(
        split_grand, batch_format="pyarrow", zero_copy_batch=True)

    def final(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        cols = {g1: pa.nulls(1, t.schema.field(g1).type),
                g2: pa.nulls(1, t.schema.field(g2).type),
                "lvl": pa.array([3], pa.int64())}
        for m in metric_cols:
            cols[m] = pa.array([int(df[m].sum())], pa.int64())
        return pa.table(cols)

    total = partitioned_map(grands, final, key="lvl", sort_keys=["lvl"],
                            num_partitions=1, strategy="tasks")
    return done.union(total)
