"""Exact per-group discrete quantiles — distributed order statistics.

``group_quantiles`` hash-partitions on the group key (each group lands
wholly in one partition — the engine's standard co-location contract,
``stages/partition.py``) and picks sorted elements per group inside the
partition kernel.  The returned values are EXACT data elements (no
interpolation, no float arithmetic), matching DuckDB's
``quantile_disc(v, q)`` convention: sorted index ``max(ceil(q*n)-1, 0)``
with the ``q*n`` product computed in float64 on both sides, so results
value-hash bit-exactly.

Scale note (100 TB): exact per-group quantiles need all rows of a group
in one kernel call — the same assumption every sequential operator here
rides (sessionize, as-of, windows).  For groups too large to co-locate,
switch to a mergeable sketch (the KMV module's hash-sample shape, or a
t-digest) and accept approximation; this operator is the exact path for
bounded group sizes.

Reference analog: ``PropertyStats.quantile`` (featurebox
featurizers/state/statistics.py) computes quantiles over tiny per-entry
composition vectors; this lifts the same statistic to a distributed
grouped aggregate.
"""

from __future__ import annotations

import math
from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _disc_index(q: float, n: int) -> int:
    """DuckDB quantile_disc rank: max(ceil(q*n) - 1, 0), q*n in float64."""
    return max(int(math.ceil(q * float(n))) - 1, 0)


def group_quantiles(
    ds,
    *,
    group_col: str,
    value_col: str,
    qs: Sequence[float],
    names: Sequence[str] | None = None,
    num_partitions: int = 16,
):
    """Per-group discrete quantiles of ``value_col``.

    Returns a Dataset with ``(group_col, n_vals:int64, <one float64
    column per q>)``; nulls in ``value_col`` are ignored (SQL aggregate
    semantics), groups with zero non-null values emit null quantiles.
    """
    from .partition import partitioned_map

    qs = list(qs)
    names = list(names) if names is not None else [
        f"p{int(round(q * 100))}" for q in qs]
    if len(names) != len(qs):
        raise ValueError("names and qs must have equal length")

    def kernel(t: pa.Table) -> pa.Table:
        g_arr = t[group_col].combine_chunks()
        gd = pc.dictionary_encode(g_arr)
        n_named = len(gd.dictionary)
        # SQL GROUP BY keeps a NULL group: route null-keyed rows to an
        # extra trailing slot instead of crashing on null indices
        has_null_group = g_arr.null_count > 0
        n_groups = n_named + (1 if has_null_group else 0)
        idx = gd.indices
        if idx.null_count:
            codes = pc.fill_null(idx, n_named).to_numpy(
                zero_copy_only=False).astype(np.int64)
        else:
            codes = idx.to_numpy(zero_copy_only=False).astype(np.int64)
        vals = t[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        cols = {nm: np.full(n_groups, np.nan) for nm in names}
        # sort once by (group, value); null/NaN values sort last per
        # group and the picked rank counts only the valid prefix — SQL
        # NULL semantics (true NaN values are treated as null too)
        valid = ~np.isnan(vals)
        order = np.lexsort((vals, ~valid, codes))
        c_s, v_s = codes[order], vals[order]
        starts = np.searchsorted(c_s, np.arange(n_groups), side="left")
        n_ok = np.zeros(n_groups, np.int64)
        np.add.at(n_ok, codes[valid], 1)
        nonempty = n_ok > 0
        for q, nm in zip(qs, names):
            # vectorized element pick at the quantile_disc rank (same
            # float64 ceil as _disc_index, one gather per q)
            idxq = np.maximum(
                np.ceil(q * n_ok.astype(np.float64)).astype(np.int64) - 1, 0)
            cols[nm][nonempty] = v_s[(starts + idxq)[nonempty]]
        group_out = gd.dictionary
        if has_null_group:
            group_out = pa.concat_arrays(
                [group_out, pa.nulls(1, group_out.type)])
        res = {group_col: group_out,
               "n_vals": pa.array(n_ok, pa.int64())}
        for nm in names:
            v = cols[nm]
            res[nm] = pa.array(v, pa.float64(), mask=np.isnan(v))
        return pa.table(res)

    return partitioned_map(ds, kernel, key=group_col, sort_keys=[group_col],
                           num_partitions=num_partitions, strategy="tasks")
