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
