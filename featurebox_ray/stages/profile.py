"""Dataset profiler — per-column row count, null count, EXACT distinct
count, and min/max in one pass over the data (the first thing anyone
runs against an unknown 100-TB table).

Values are profiled through their SQL VARCHAR cast so every column type
shares one exchange schema and min/max are plain bytewise comparisons
that DuckDB replays 1:1.  Two keyed exchanges, both tiny relative to
the data:

1. per-block partials: each column dictionary-encodes once; the block
   emits its DISTINCT ``(col, val)`` pairs with partial row counts (the
   classic exact-NDV exchange — the shuffle moves distinct pairs, not
   rows) plus a per-column null partial;
2. a ``(col, val)``-keyed exchange merges pair counts, then collapses to
   ONE partial row per (column × partition): ndv/rows/nulls partials +
   bytewise min/max over the partition's values;
3. a final column-keyed combine over ≤ columns × partitions tiny rows.

Output: ``(col, n_rows, n_nulls, n_distinct, min_val, max_val)`` —
``n_distinct`` counts distinct NON-NULL values; min/max are NULL for
all-null columns.

Reference analog: none (the reference assumes pre-known schemas); this
is an added-for-100-TB triage primitive.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["profile_columns"]


def profile_columns(ds, *, cols: Sequence[str], num_partitions: int = 8):
    from .partition import partitioned_map

    cols = list(cols)

    def partial(b: pa.Table) -> pa.Table:
        parts = []
        for c in cols:
            col = b[c].combine_chunks()
            n = len(col)
            n_null = col.null_count
            sv = pc.cast(col, pa.string())
            d = pc.dictionary_encode(sv)
            counts = np.bincount(
                pc.fill_null(d.indices, len(d.dictionary)).to_numpy(
                    zero_copy_only=False).astype(np.int64),
                minlength=len(d.dictionary) + 1)[:len(d.dictionary)]
            vdic = d.dictionary
            keep = pc.is_valid(vdic).to_numpy(zero_copy_only=False)
            idx = np.flatnonzero(keep)
            parts.append(pa.table({
                "col": pa.array([c] * (len(idx) + 1), pa.string()),
                "val": pa.concat_arrays(
                    [vdic.take(pa.array(idx, pa.int64())),
                     pa.nulls(1, pa.string())]),
                "cnt": pa.array(np.concatenate(
                    [counts[idx], [0]]).astype(np.int64)),
                # the val=NULL row carries this block's null partial
                "n_null": pa.array(
                    [0] * len(idx) + [int(n_null)], pa.int64()),
            }))
        return pa.concat_tables(parts)

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True, batch_size=None)

    def per_partition(t: pa.Table) -> pa.Table:
        """Sorted by (col, val): merge pair counts, collapse to one
        partial row per column present in this partition."""
        out_schema = pa.schema([
            ("col", pa.string()), ("n_rows", pa.int64()),
            ("n_nulls", pa.int64()), ("n_distinct", pa.int64()),
            ("min_val", pa.string()), ("max_val", pa.string())])
        if t.num_rows == 0:
            return out_schema.empty_table()
        import pandas as pd

        carr = t["col"].combine_chunks()
        ccodes = pc.dictionary_encode(carr)
        cdic = ccodes.dictionary
        cc = ccodes.indices.to_numpy(zero_copy_only=False).astype(
            np.int64)
        val = t["val"].combine_chunks()
        vnull = ~pc.is_valid(val).to_numpy(zero_copy_only=False)
        cnt = t["cnt"].to_numpy(zero_copy_only=False)
        n_null = t["n_null"].to_numpy(zero_copy_only=False)
        rows = []
        for code in np.unique(cc):
            m = cc == code
            mv = m & ~vnull
            vals = val.filter(pa.array(mv))
            uniq = vals.unique()
            nd = len(uniq)
            mm = (pc.min_max(uniq) if nd else
                  {"min": pa.scalar(None, pa.string()),
                   "max": pa.scalar(None, pa.string())})
            nn = int(n_null[m & vnull].sum())
            rows.append((cdic[int(code)].as_py(),
                         int(cnt[mv].sum()) + nn, nn, nd,
                         mm["min"].as_py(), mm["max"].as_py()))
        df = pd.DataFrame(rows, columns=["col", "n_rows", "n_nulls",
                                         "n_distinct", "min_val",
                                         "max_val"])
        return pa.Table.from_pandas(df, preserve_index=False).cast(
            out_schema)

    staged = partitioned_map(partials, per_partition, key="val",
                             sort_keys=["col", "val"],
                             num_partitions=num_partitions,
                             strategy="tasks")

    def final(t: pa.Table) -> pa.Table:
        import pandas as pd

        if t.num_rows == 0:
            return t
        df = t.to_pandas()
        rows = []
        # tiny (cols x partitions) table; skip-None min/max by hand
        # (pandas object-min raises on None)
        for c, sub in df.groupby("col"):
            mins = [x for x in sub["min_val"] if x is not None]
            maxs = [x for x in sub["max_val"] if x is not None]
            rows.append((c, int(sub["n_rows"].sum()),
                         int(sub["n_nulls"].sum()),
                         int(sub["n_distinct"].sum()),
                         min(mins) if mins else None,
                         max(maxs) if maxs else None))
        g = pd.DataFrame(rows, columns=["col", "n_rows", "n_nulls",
                                        "n_distinct", "min_val",
                                        "max_val"])
        return pa.Table.from_pandas(g, preserve_index=False
                                    ).cast(t.schema)

    return partitioned_map(staged, final, key="col",
                           sort_keys=["col"], num_partitions=1,
                           strategy="tasks")


def group_count_distinct(ds, *, group_cols: Sequence[str],
                         value_col: str, num_partitions: int = 8):
    """Exact ``count(DISTINCT value)`` per group — the windowed-distinct
    primitive (distinct users per (event_type, day)) that sketches
    (``hll_distinct``/``kmv``) approximate, as the exact path.

    Classic exact-NDV shape: each block collapses to its DISTINCT
    ``(group..., value)`` tuples (one vectorized ``pa.Table.group_by``
    — the shuffle moves distinct tuples, never rows), ONE keyed exchange
    co-locates groups by ``group_cols[0]`` (all finer group columns ride
    along, so every group is complete wherever its prefix lands — the
    documented co-location assumption; a skewed prefix bounds one
    partition, mirror of the hash-partition story), and the kernel runs
    one ``count_distinct`` aggregate per group.

    NULL values are ignored (SQL ``count(DISTINCT v)``); NULL group
    keys form one group (SQL ``GROUP BY``).  Returns ``(group_cols...,
    n_distinct:int64)``.
    """
    from .partition import partitioned_map

    cols = list(group_cols) + [value_col]

    def partial(b: pa.Table) -> pa.Table:
        return b.select(cols).group_by(cols).aggregate([])

    def kernel(t: pa.Table) -> pa.Table:
        out = (t.group_by(list(group_cols))
               .aggregate([(value_col, "count_distinct")]))
        cd = out[f"{value_col}_count_distinct"].cast(pa.int64())
        return (out.drop_columns([f"{value_col}_count_distinct"])
                .append_column("n_distinct", cd))

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True, batch_size=None)
    return partitioned_map(partials, kernel, key=group_cols[0],
                           sort_keys=list(group_cols),
                           num_partitions=num_partitions,
                           strategy="tasks")
