"""Co-partitioned hash equi-join (SURVEY.md §2.4).

Both sides are tagged, schema-harmonized and unioned, then hash-partitioned
by the join key (one shuffle); each partition kernel splits sides and joins
vectorized.  Same machinery as the as-of join — in this sandbox it
outperforms Ray's experimental ``Dataset.join`` aggregator-actor path by
>10x on mid-size inputs while scaling the same way (both sides exchange
once by key hash).

For a SMALL right side prefer :func:`broadcast_join` — no shuffle at all:
the right table rides the object store once (``ray.put``) and each batch
does a dictionary lookup.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np
import pyarrow as pa

from .partition import PART_COL, partitioned_map

SIDE = "__jside"


def hash_join(
    left_ds,
    right_ds,
    *,
    on: str,
    right_on: Optional[str] = None,
    how: str = "inner",
    num_partitions: int = 32,
    left_cols: Optional[List[str]] = None,
    right_cols: Optional[List[str]] = None,
    combine=None,
):
    """Equi-join on a single key column.  ``right_on`` defaults to ``on``
    (the right key is renamed to ``on`` in the output when different).
    Supported ``how``: inner, left.

    ``combine`` (optional, ``pa.Table -> pa.Table``): partial-aggregation
    callback applied to each partition's joined rows *before* they leave
    the join task — the join-aware aggregate pushdown that LMFAO (VLDB'20,
    "An Engine for Batches of Group-By Aggregates") formalizes: aggregate
    inside the join instead of shuffling the full join output."""
    right_on = right_on or on
    lschema = left_ds.schema()
    rschema = right_ds.schema()
    left_cols = left_cols or [n for n in lschema.names]
    right_cols = right_cols or [n for n in rschema.names if n != right_on]
    rtypes = dict(zip(rschema.names, rschema.types))
    ltypes = dict(zip(lschema.names, lschema.types))
    overlap = [c for c in right_cols if c in left_cols]
    if overlap:
        raise ValueError(f"overlapping output columns {overlap}; project first")
    key_type = ltypes[on]
    all_cols = {c: ltypes[c] for c in left_cols}
    all_cols.update({c: rtypes[c] for c in right_cols})

    def tag_left(t: pa.Table) -> pa.Table:
        cols = {c: t[c] for c in left_cols}
        for c in right_cols:
            cols[c] = pa.nulls(t.num_rows, rtypes[c])
        out = pa.table(cols)
        return out.append_column(SIDE, pa.array(np.zeros(t.num_rows, np.int8)))

    def tag_right(t: pa.Table) -> pa.Table:
        cols = {}
        for c in left_cols:
            if c == on:
                cols[c] = t[right_on].cast(key_type)
            else:
                cols[c] = pa.nulls(t.num_rows, ltypes[c])
        for c in right_cols:
            cols[c] = t[c]
        out = pa.table(cols)
        return out.append_column(SIDE, pa.array(np.ones(t.num_rows, np.int8)))

    lt = left_ds.map_batches(tag_left, batch_format="pyarrow", zero_copy_batch=True)
    rt = right_ds.map_batches(tag_right, batch_format="pyarrow", zero_copy_batch=True)
    unioned = lt.union(rt)

    def merge(table: pa.Table) -> pa.Table:
        import pandas as pd

        side = table[SIDE].to_numpy(zero_copy_only=False)
        lmask = side == 0
        left_t = table.filter(pa.array(lmask)).select(left_cols)
        right_t = table.filter(pa.array(~lmask)).select([on] + right_cols)
        ldf = left_t.to_pandas()
        rdf = right_t.to_pandas()
        out = ldf.merge(rdf, on=on, how=how)
        joined = pa.Table.from_pandas(out, preserve_index=False)
        return combine(joined) if combine is not None else joined

    return partitioned_map(
        unioned, merge, key=on, sort_keys=[on],
        num_partitions=num_partitions,
    )


def broadcast_join(left_ds, right_table: pa.Table, *, on: str,
                   right_on: Optional[str] = None,
                   batch_size: int = 65536, concurrency=(1, 8)):
    """Map-side join against a small in-memory right table (no shuffle):
    ``ray.put`` once, per-actor pandas index, vectorized ``merge`` per
    batch.  Left rows with no match get nulls (left join)."""
    import ray

    right_on = right_on or on
    ref = ray.put(right_table)

    class Joiner:
        def __init__(self):
            import pandas as pd

            rt = ray.get(ref)
            self.rdf = rt.to_pandas().rename(columns={right_on: on})

        def __call__(self, batch: pa.Table) -> pa.Table:
            import pandas as pd

            ldf = batch.to_pandas()
            out = ldf.merge(self.rdf, on=on, how="left")
            return pa.Table.from_pandas(out, preserve_index=False)

    return left_ds.map_batches(
        Joiner, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=batch_size, concurrency=concurrency,
    )
