"""Connected components over a duplicate-pair table → canonical group
labels — the survivor-selection step every dedup pipeline runs after
pair finding (component label = the SMALLEST id reachable, so "keep the
lowest id per group" is ``WHERE doc_id = component``).

Physical plan, size-dispatched (the auto_join pattern): pair sets up
to ``small_threshold`` run serial union-find in ONE off-driver Ray
task (milliseconds at test scale); larger sets run fully distributed
— the pair set is then NEVER concatenated on one worker — as
iterative min-label propagation over the node-keyed task exchange.
Per super-round:

* **edge-min** (two exchanges, the ``k_core`` message shape): each
  node's current label routes onto its half-edges keyed by the
  recipient, which folds ``lab ← min(lab, incoming)`` — extends label
  knowledge by one hop;
* **pointer jump** (one exchange over the label map itself): each node
  ``u`` re-keys to ``lab(u)`` and adopts ``lab(lab(u))`` — halves
  pointer chains, so convergence is O(log diameter) super-rounds
  rather than O(diameter) (a 2^16-node path converges in ~16 rounds,
  not 32768).

Every exchange ships O(V + E) int64 rows sharded across
``num_partitions`` gather tasks; per-round state lives in the object
store and the convergence check is a distributed ``sum("changed")`` —
nothing graph-sized touches the driver.

Determinism: the component label (min reachable id) is a property of
the edge SET — independent of edge order, block structure, or the
propagation schedule — so any execution and a serial union-find replay
agree exactly (the min-label invariant all downstream oracles rely
on).

Reference analog: none (beyond-reference training-data operator; the
standard follow-on to minhash/simhash/ngram pair emitters in
stages/dedup.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def union_find_min_labels(a: np.ndarray, b: np.ndarray) -> dict:
    """Serial union-find over edges (a[i], b[i]) → {node: min id in its
    component} (only nodes that appear in an edge).  The SERIAL replay
    oracle for :func:`min_label_components` — and still the right tool
    for provably-tiny edge sets held locally (e.g. dbscan's core-core
    edges)."""
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


def min_label_components(pairs_ds, *, pair_cols=("id_a", "id_b"),
                         num_partitions: int = 16,
                         max_iters: int = 64,
                         small_threshold: int = 1_000_000):
    """Distributed connected components over an integer pair table.

    Returns a Dataset ``(node:int64, component:int64)`` with one row
    per distinct node appearing in any pair; ``component`` = min id
    reachable.  NULL ids and self-pairs are ignored.  Raises if
    ``max_iters`` super-rounds don't converge (needs ~log2(diameter)
    rounds).

    Size dispatch (the auto_join pattern): a pair set at or below
    ``small_threshold`` pairs runs serial union-find in ONE Ray task
    (milliseconds, still off-driver) — the common case after dedup
    pair-finding at test scale; anything larger takes the multi-round
    propagation, where the pair set is only ever processed
    shard-by-shard through the task exchange and no single task sees
    all pairs.  Pass ``small_threshold=0`` to force the distributed
    path (the fuzz tests do).  Both paths produce the identical
    min-label invariant."""
    import ray

    from .partition import materialized_block_refs, partitioned_map

    ca, cb = pair_cols

    def symm(b: pa.Table) -> pa.Table:
        if ca not in b.column_names:
            # Ray shuffle ops emit benign zero-column empty bundles
            return pa.table({"__k": pa.array([], pa.int64()),
                             "to": pa.array([], pa.int64())})
        keep = pc.fill_null(pc.and_(pc.is_valid(b[ca]),
                                    pc.is_valid(b[cb])), False)
        if not pc.all(keep).as_py():
            b = b.filter(keep)
        s = b[ca].combine_chunks().cast(pa.int64())
        d = b[cb].combine_chunks().cast(pa.int64())
        return pa.table({
            "__k": pa.concat_arrays([s, d]),
            "to": pa.concat_arrays([d, s])})

    half = pairs_ds.map_batches(symm, batch_format="pyarrow",
                                zero_copy_batch=True)
    edge_refs = list(materialized_block_refs(half))
    empty_out = pa.table({"node": pa.array([], pa.int64()),
                          "component": pa.array([], pa.int64())})
    n_half = (ray.data.from_arrow_refs(list(edge_refs)).count()
              if edge_refs else 0)
    if n_half == 0:
        return ray.data.from_arrow(empty_out)

    if n_half <= 2 * small_threshold:
        # small path: one off-driver task, serial union-find
        @ray.remote
        def small_labels(*blocks):
            tbls = [t for t in blocks if t.num_rows]
            t = pa.concat_tables(tbls, promote_options="default")
            lab = union_find_min_labels(
                t["__k"].to_numpy(zero_copy_only=False),
                t["to"].to_numpy(zero_copy_only=False))
            keys = np.fromiter(lab.keys(), np.int64, len(lab))
            vals = np.fromiter(lab.values(), np.int64, len(lab))
            order = np.argsort(keys)
            return pa.table({"node": pa.array(keys[order]),
                             "component": pa.array(vals[order])})

        return ray.data.from_arrow_refs(
            [small_labels.remote(*edge_refs)])

    def edges_dataset():
        return ray.data.from_arrow_refs(list(edge_refs))

    val_empty = pa.table({"__k": pa.array([], pa.int64()),
                          "lab": pa.array([], pa.int64()),
                          "changed": pa.array([], pa.int64())})

    def init_kernel(t: pa.Table) -> pa.Table:
        # sorted (__k, to): per node, lab = min(node, smallest neighbor)
        if t.num_rows == 0 or "__k" not in t.column_names:
            return val_empty
        n = t["__k"].to_numpy(zero_copy_only=False)
        to = t["to"].to_numpy(zero_copy_only=False)
        new_run = np.concatenate([[True], n[1:] != n[:-1]])
        starts = np.flatnonzero(new_run)
        lab = np.minimum(n[starts], to[starts]).astype(np.int64)
        return pa.table({"__k": pa.array(n[starts].astype(np.int64)),
                         "lab": pa.array(lab),
                         "changed": pa.array(
                             np.ones(len(starts), np.int64))})

    values = partitioned_map(edges_dataset(), init_kernel, key="__k",
                             sort_keys=["__k", "to"],
                             num_partitions=num_partitions,
                             strategy="tasks")
    value_refs = list(materialized_block_refs(values))

    # ---- phase a: edge-min (route labels over edges, fold min) ----

    def tag_vals(b: pa.Table) -> pa.Table:
        return pa.table({"__k": b["__k"],
                         "__tag": pa.array(np.zeros(b.num_rows, np.int8)),
                         "to": pa.nulls(b.num_rows, pa.int64()),
                         "lab": b["lab"]})

    def tag_edges(b: pa.Table) -> pa.Table:
        return pa.table({"__k": b["__k"],
                         "__tag": pa.array(np.ones(b.num_rows, np.int8)),
                         "to": b["to"],
                         "lab": pa.nulls(b.num_rows, pa.int64())})

    msg_empty = pa.table({"__k": pa.array([], pa.int64()),
                          "__tag": pa.array([], pa.int8()),
                          "cand": pa.array([], pa.int64()),
                          "lab": pa.array([], pa.int64())})

    def route_kernel(t: pa.Table) -> pa.Table:
        # sorted (__k, __tag): state row leads each run; emit the own
        # state row (tag 0) plus (to, lab_owner) messages (tag 1)
        if t.num_rows == 0 or "__k" not in t.column_names:
            return msg_empty
        n = t["__k"].to_numpy(zero_copy_only=False)
        tag = t["__tag"].to_numpy(zero_copy_only=False)
        new_run = np.concatenate([[True], n[1:] != n[:-1]])
        run_id = np.cumsum(new_run.astype(np.int64)) - 1
        starts = np.flatnonzero(new_run)
        if (tag[starts] != 0).any():
            raise ValueError("min_label_components: node in edge list "
                             "missing a value row")
        # fill_null BEFORE to_numpy: null-bearing int64 → float64
        lab_all = pc.fill_null(t["lab"].combine_chunks(), 0).to_numpy(
            zero_copy_only=False).astype(np.int64)
        lab_owner = lab_all[starts]
        is_edge = tag == 1
        to = pc.fill_null(t["to"].combine_chunks(), 0).to_numpy(
            zero_copy_only=False).astype(np.int64)[is_edge]
        cand = lab_owner[run_id[is_edge]]
        n_msg = int(is_edge.sum())
        own = pa.table({"__k": pa.array(n[starts].astype(np.int64)),
                        "__tag": pa.array(np.zeros(len(starts), np.int8)),
                        "cand": pa.array(np.zeros(len(starts), np.int64)),
                        "lab": pa.array(lab_owner)})
        msgs = pa.table({"__k": pa.array(to),
                         "__tag": pa.array(np.ones(n_msg, np.int8)),
                         "cand": pa.array(cand.astype(np.int64)),
                         "lab": pa.nulls(n_msg, pa.int64())})
        return pa.concat_tables([own, msgs])

    def fold_kernel(t: pa.Table) -> pa.Table:
        # sorted (__k, __tag): per run, min over {own lab} ∪ {cands}
        if t.num_rows == 0 or "__k" not in t.column_names:
            return val_empty
        n = t["__k"].to_numpy(zero_copy_only=False)
        tag = t["__tag"].to_numpy(zero_copy_only=False)
        new_run = np.concatenate([[True], n[1:] != n[:-1]])
        run_id = np.cumsum(new_run.astype(np.int64)) - 1
        starts = np.flatnonzero(new_run)
        if (tag[starts] != 0).any():
            raise ValueError("min_label_components: message run "
                             "missing its state row")
        lab_old = pc.fill_null(t["lab"].combine_chunks(), 0).to_numpy(
            zero_copy_only=False).astype(np.int64)[starts]
        cand = pc.fill_null(t["cand"].combine_chunks(), 0).to_numpy(
            zero_copy_only=False).astype(np.int64)
        lab_new = lab_old.copy()
        is_msg = tag == 1
        np.minimum.at(lab_new, run_id[is_msg], cand[is_msg])
        return pa.table({"__k": pa.array(n[starts].astype(np.int64)),
                         "lab": pa.array(lab_new),
                         "changed": pa.array(
                             (lab_new != lab_old).astype(np.int64))})

    # ---- phase b: pointer jump (lab ← lab(lab)) ----

    def tag_state(b: pa.Table) -> pa.Table:
        return pa.table({"__k": b["__k"],
                         "__tag": pa.array(np.zeros(b.num_rows, np.int8)),
                         "node": pa.nulls(b.num_rows, pa.int64()),
                         "lab": b["lab"]})

    def tag_request(b: pa.Table) -> pa.Table:
        # node u asks run lab(u) for lab(lab(u))
        return pa.table({"__k": b["lab"],
                         "__tag": pa.array(np.ones(b.num_rows, np.int8)),
                         "node": b["__k"],
                         "lab": pa.nulls(b.num_rows, pa.int64())})

    def jump_kernel(t: pa.Table) -> pa.Table:
        # sorted (__k, __tag): state row of node k leads; every request
        # (u with lab(u) = k) adopts m = lab(k).  Each node emits
        # exactly once (via its single request row).
        if t.num_rows == 0 or "__k" not in t.column_names:
            return val_empty
        n = t["__k"].to_numpy(zero_copy_only=False)
        tag = t["__tag"].to_numpy(zero_copy_only=False)
        new_run = np.concatenate([[True], n[1:] != n[:-1]])
        run_id = np.cumsum(new_run.astype(np.int64)) - 1
        starts = np.flatnonzero(new_run)
        if (tag[starts] != 0).any():
            # labels are always node ids, so every request run has an
            # owner state row
            raise ValueError("min_label_components: pointer-jump run "
                             "missing its owner state row")
        lab_all = pc.fill_null(t["lab"].combine_chunks(), 0).to_numpy(
            zero_copy_only=False).astype(np.int64)
        m_run = lab_all[starts]
        is_req = tag == 1
        node = pc.fill_null(t["node"].combine_chunks(), 0).to_numpy(
            zero_copy_only=False).astype(np.int64)[is_req]
        m = m_run[run_id[is_req]]
        old_lab = n[is_req].astype(np.int64)      # request key == lab(u)
        return pa.table({"__k": pa.array(node),
                         "lab": pa.array(m.astype(np.int64)),
                         "changed": pa.array(
                             (m != old_lab).astype(np.int64))})

    it = 0
    changed = 1
    while changed and it < max_iters:
        vals_ds = ray.data.from_arrow_refs(list(value_refs))
        unioned = (vals_ds.map_batches(tag_vals, batch_format="pyarrow",
                                       zero_copy_batch=True)
                   .union(edges_dataset().map_batches(
                       tag_edges, batch_format="pyarrow",
                       zero_copy_batch=True)))
        msgs = partitioned_map(unioned, route_kernel, key="__k",
                               sort_keys=["__k", "__tag"],
                               num_partitions=num_partitions,
                               strategy="tasks")
        folded = partitioned_map(msgs, fold_kernel, key="__k",
                                 sort_keys=["__k", "__tag"],
                                 num_partitions=num_partitions,
                                 strategy="tasks")
        fold_refs = list(materialized_block_refs(folded))
        changed_a = int(ray.data.from_arrow_refs(list(fold_refs))
                        .sum("changed") or 0)
        vals_ds = ray.data.from_arrow_refs(list(fold_refs))
        jump_in = (vals_ds.map_batches(tag_state, batch_format="pyarrow",
                                       zero_copy_batch=True)
                   .union(vals_ds.map_batches(
                       tag_request, batch_format="pyarrow",
                       zero_copy_batch=True)))
        jumped = partitioned_map(jump_in, jump_kernel, key="__k",
                                 sort_keys=["__k", "__tag"],
                                 num_partitions=num_partitions,
                                 strategy="tasks")
        value_refs = list(materialized_block_refs(jumped))
        changed_b = int(ray.data.from_arrow_refs(list(value_refs))
                        .sum("changed") or 0)
        changed = changed_a + changed_b
        it += 1
    if changed:
        raise RuntimeError(
            f"min_label_components: not converged after {max_iters} "
            "super-rounds — needs ~log2(diameter); raise max_iters")

    def finalize(b: pa.Table) -> pa.Table:
        return pa.table({"node": b["__k"], "component": b["lab"]})

    return ray.data.from_arrow_refs(list(value_refs)).map_batches(
        finalize, batch_format="pyarrow", zero_copy_batch=True)


def pack_label_map(labels_ds):
    """Materialize a ``(node, component)`` label Dataset into one
    remote task holding node-sorted arrays, returning the ObjectRef
    (pass it to tasks; ``ray.get`` inside is a broadcast read).  The
    packed map is matched-node-sized — orders of magnitude smaller
    than the pair set it came from — which is the documented bound for
    the broadcast-apply path."""
    import ray

    from .partition import materialized_block_refs

    refs = materialized_block_refs(labels_ds)

    @ray.remote
    def pack(*blocks):
        tbls = [t for t in blocks
                if t.num_rows and "node" in t.column_names]
        if not tbls:
            return (np.empty(0, np.int64), np.empty(0, np.int64))
        t = pa.concat_tables([b.select(["node", "component"])
                              for b in tbls], promote_options="default")
        keys = t["node"].to_numpy(zero_copy_only=False).astype(np.int64)
        vals = t["component"].to_numpy(
            zero_copy_only=False).astype(np.int64)
        order = np.argsort(keys)
        return keys[order], vals[order]

    return pack.remote(*refs)


def connected_components(pairs_ds, corpus_ds, *, id_col: str = "doc_id",
                         pair_cols=("id_a", "id_b"), batch_size=None,
                         num_partitions: int = 16,
                         max_iters: int = 64,
                         small_threshold: int = 1_000_000):
    """Label every corpus row with its duplicate-component id.

    ``pairs_ds``: Dataset with integer columns ``pair_cols`` (e.g. the
    output of ``minhash_lsh_dedup``).  ``corpus_ds``: the full table to
    label.  Output: ``(id_col, component int64)`` — one row per corpus
    row; rows in no pair get ``component = own id``.

    Labels come from :func:`min_label_components` (size-dispatched:
    one-task union-find up to ``small_threshold`` pairs, multi-round
    distributed propagation beyond — the pair set then never lands on
    one worker); the resulting matched-node-sized map broadcasts once
    and the corpus pass streams."""
    import ray

    labels = min_label_components(pairs_ds, pair_cols=pair_cols,
                                  num_partitions=num_partitions,
                                  max_iters=max_iters,
                                  small_threshold=small_threshold)
    lab_ref = pack_label_map(labels)

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
