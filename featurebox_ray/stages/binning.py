"""Per-group quantile binning (feature discretization): assign each row
the quantile bucket of its value WITHIN its group — the classic
numeric-feature discretizer (value → {0..Q} by per-group quartile/decile
edges).

Two stages, one tiny broadcast: (1) :func:`group_quantiles` computes the
exact per-group edges (one keyed exchange over the groups); (2) the fact
stream maps with the edge matrix broadcast once (``ray.put``) — bucket =
number of edges strictly below the value (``edge < value``), i.e. SQL
``CASE WHEN value <= q1 THEN 0 WHEN value <= q2 THEN 1 ...``.  Edges are
exact data elements (quantile_disc picks, no interpolation), so the
comparisons — and therefore the buckets — replay bit-exactly in SQL.

NULL values and NULL/unknown groups produce NULL buckets.

Reference analog: the reference discretizes via magnitude scaling
(``symbol/preprocess.py``); quantile binning is the distribution-aware
variant a training pipeline uses for robust features.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def quantile_bin(ds, *, group_col: str, value_col: str,
                 qs: Sequence[float] = (0.25, 0.5, 0.75),
                 num_partitions: int = 8, out_col: str = "q_bucket"):
    """Append ``out_col`` (int64 in ``[0, len(qs)]``, null for null
    value/group) to every row of ``ds``."""
    import ray

    from .partition import materialized_block_refs
    from .quantile import group_quantiles

    qs = list(qs)
    names = [f"__e{i}" for i in range(len(qs))]
    edges_ds = group_quantiles(ds, group_col=group_col,
                               value_col=value_col, qs=qs, names=names,
                               num_partitions=num_partitions)
    blocks = [b for b in ray.get(materialized_block_refs(edges_ds))
              if b.num_rows > 0]
    if not blocks:
        def passthrough(b: pa.Table) -> pa.Table:
            return b.append_column(out_col,
                                   pa.nulls(b.num_rows, pa.int64()))

        return ds.map_batches(passthrough, batch_format="pyarrow",
                              zero_copy_batch=True)
    edges = pa.concat_tables(blocks, promote_options="default")
    # groups with zero non-null values carry null edges: mark them so
    # their rows (necessarily null-valued anyway) stay null-bucketed
    garr = edges[group_col].combine_chunks()
    emat = np.stack([edges[nm].to_numpy(zero_copy_only=False)
                     for nm in names], axis=1)  # (G, Q), NaN = null edge
    bcast = ray.put((garr, emat))

    def bin_batch(b: pa.Table) -> pa.Table:
        g_ref, e_ref = ray.get(bcast)
        pos = pc.index_in(b[group_col].combine_chunks(), value_set=g_ref)
        valid_g = pc.is_valid(pos).to_numpy(zero_copy_only=False)
        p = pos.fill_null(0).to_numpy(zero_copy_only=False).astype(np.int64)
        v = b[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        row_edges = e_ref[p]                        # (n, Q)
        # bucket = #edges strictly below value (edge < v); NaN edges or
        # NaN/null values poison the row -> null bucket
        with np.errstate(invalid="ignore"):
            bucket = (row_edges < v[:, None]).sum(axis=1).astype(np.int64)
        ok = valid_g & ~np.isnan(v) & ~np.isnan(row_edges).any(axis=1)
        return b.append_column(out_col, pa.array(bucket, mask=~ok))

    return ds.map_batches(bin_batch, batch_format="pyarrow",
                          zero_copy_batch=True)


def winsorize(ds, *, group_col: str, value_col: str,
              q_lo: float = 0.05, q_hi: float = 0.95,
              num_partitions: int = 8, out_col: str = "value_w"):
    """Per-group winsorization (outlier clipping): append ``out_col`` =
    ``value`` clipped to the group's ``[q_lo, q_hi]`` quantile_disc
    edges.  Same two-stage shape as :func:`quantile_bin`; the edges are
    EXACT data elements, so clipping is pure comparison + substitution
    of stored doubles — SQL ``least(greatest(value, lo), hi)`` replays
    it bit-exactly.  NULL value/group rows keep a NULL output; a group
    whose edges are null (no non-null values) passes values through
    un-clipped."""
    import ray

    from .partition import materialized_block_refs
    from .quantile import group_quantiles

    edges_ds = group_quantiles(ds, group_col=group_col,
                               value_col=value_col, qs=[q_lo, q_hi],
                               names=["__lo", "__hi"],
                               num_partitions=num_partitions)
    blocks = [b for b in ray.get(materialized_block_refs(edges_ds))
              if b.num_rows > 0]
    if not blocks:
        def passthrough(b: pa.Table) -> pa.Table:
            return b.append_column(out_col,
                                   pa.nulls(b.num_rows, pa.float64()))

        return ds.map_batches(passthrough, batch_format="pyarrow",
                              zero_copy_batch=True)
    edges = pa.concat_tables(blocks, promote_options="default")
    garr = edges[group_col].combine_chunks()
    lo = edges["__lo"].to_numpy(zero_copy_only=False)
    hi = edges["__hi"].to_numpy(zero_copy_only=False)
    bcast = ray.put((garr, lo, hi))

    def clip_batch(b: pa.Table) -> pa.Table:
        g_ref, lo_ref, hi_ref = ray.get(bcast)
        pos = pc.index_in(b[group_col].combine_chunks(), value_set=g_ref)
        valid_g = pc.is_valid(pos).to_numpy(zero_copy_only=False)
        p = pos.fill_null(0).to_numpy(zero_copy_only=False).astype(np.int64)
        vcol = b[value_col]
        if isinstance(vcol, pa.ChunkedArray):
            vcol = vcol.combine_chunks()
        null_v = (np.asarray(pc.is_null(vcol)) if vcol.null_count
                  else np.zeros(len(vcol), bool))
        v = vcol.to_numpy(zero_copy_only=False).astype(np.float64)
        row_lo = np.where(valid_g, lo_ref[p], np.nan)
        row_hi = np.where(valid_g, hi_ref[p], np.nan)
        with np.errstate(invalid="ignore"):
            # comparison-substitution (NOT np.clip: its NaN semantics
            # differ and it computes min(max(...)) in one pass anyway)
            out = np.where(v < row_lo, row_lo, v)
            out = np.where(out > row_hi, row_hi, out)
        # NaN edges (unknown group / all-null group) -> pass-through
        out = np.where(np.isnan(row_lo) | np.isnan(row_hi), v, out)
        return b.append_column(out_col, pa.array(out, mask=null_v))

    return ds.map_batches(clip_batch, batch_format="pyarrow",
                          zero_copy_batch=True)
