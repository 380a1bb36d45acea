"""Connected components over a duplicate-pair table → canonical group
labels — the survivor-selection step every dedup pipeline runs after
pair finding (component label = the SMALLEST id reachable, so "keep the
lowest id per group" is ``WHERE doc_id = component``).

Physical plan: the pair table is the OUTPUT of near-dup detection —
orders of magnitude smaller than the corpus (it holds only duplicates).
Union-find over it runs in ONE Ray task on the materialized pair blocks
(path-halving + union-by-min keeps it O(E α(E)); a single task handles
~10⁹ edges in worker heap — beyond that, swap in iterative min-label
propagation over a node-keyed exchange; the API is unchanged).  The
resulting ``{id → min-id}`` map is corpus-duplicate-sized, broadcast
once via ``ray.put``, and the CORPUS pass that applies it streams —
that is the part that scales with data size.

Determinism: the component label (min reachable id) is a property of
the edge SET — independent of edge order, block structure, or the
union sequence — so any execution and a serial replay agree exactly.

Reference analog: none (beyond-reference training-data operator; the
standard follow-on to minhash/simhash/ngram pair emitters in
stages/dedup.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def union_find_min_labels(a: np.ndarray, b: np.ndarray) -> dict:
    """Serial union-find over edges (a[i], b[i]) → {node: min id in its
    component} (only nodes that appear in an edge)."""
    parent: dict = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != r:       # path compression
            parent[x], x = r, parent[x]
        return r

    nodes: set = set()
    for u, v in zip(a.tolist(), b.tolist()):
        nodes.add(u)
        nodes.add(v)
        ru, rv = find(u), find(v)
        if ru != rv:
            # union-by-min: the root IS the component label
            lo, hi = (ru, rv) if ru < rv else (rv, ru)
            parent[hi] = lo
    return {x: find(x) for x in nodes}


def connected_components(pairs_ds, corpus_ds, *, id_col: str = "doc_id",
                         pair_cols=("id_a", "id_b"), batch_size=None):
    """Label every corpus row with its duplicate-component id.

    ``pairs_ds``: Dataset with integer columns ``pair_cols`` (e.g. the
    output of ``minhash_lsh_dedup``).  ``corpus_ds``: the full table to
    label.  Output: ``(id_col, component int64)`` — one row per corpus
    row; rows in no pair get ``component = own id``."""
    import ray

    from .partition import materialized_block_refs

    ca, cb = pair_cols
    refs = materialized_block_refs(pairs_ds)

    @ray.remote
    def reduce_labels(*blocks):
        tbls = [t for t in blocks if t.num_rows]
        if not tbls:
            return (np.empty(0, np.int64), np.empty(0, np.int64))
        t = pa.concat_tables(
            [b.select([ca, cb]) for b in tbls], promote_options="default")
        lab = union_find_min_labels(
            t[ca].to_numpy(zero_copy_only=False).astype(np.int64),
            t[cb].to_numpy(zero_copy_only=False).astype(np.int64))
        keys = np.fromiter(lab.keys(), np.int64, len(lab))
        vals = np.fromiter(lab.values(), np.int64, len(lab))
        order = np.argsort(keys)
        return keys[order], vals[order]

    lab_ref = reduce_labels.remote(*refs)

    def apply(batch: pa.Table) -> pa.Table:
        keys, vals = ray.get(lab_ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        comp = ids.copy()
        if len(keys):
            idx = np.searchsorted(keys, ids)
            idx_c = np.minimum(idx, len(keys) - 1)
            hit = keys[idx_c] == ids
            comp[hit] = vals[idx_c[hit]]
        return pa.table({
            id_col: pa.array(ids),
            "component": pa.array(comp),
        })

    return corpus_ds.map_batches(apply, batch_format="pyarrow",
                                 zero_copy_batch=True,
                                 batch_size=batch_size)
