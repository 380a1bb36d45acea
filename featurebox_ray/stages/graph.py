"""Distributed PageRank in exact fixed-point arithmetic — the iterative
graph-centrality primitive (content/entity importance ranking over a
link or co-occurrence graph; the classic web-corpus quality prior for
training-data curation).

Floating-point PageRank is order-dependent (float sums), so this engine
runs the iteration entirely in scaled INTEGERS: ranks are int64 in
units of ``2^-scale_bits``, each edge contributes ``rank // outdeg``
(floor division), and the update is

    r' = (3·S) // 20  +  (17 · Σ contrib) // 20        (damping 0.85)

— every operation an exact integer op, so the result is independent of
summation order, partitioning, AND replays bit-exactly in SQL.  The
quantization error vs real PageRank is ≤ outdeg·2^-scale_bits per node
per iteration — noise at ``scale_bits=40``.

Scale shape: per iteration exactly TWO keyed exchanges of
metadata-sized tables — (A) ranks route to their node's edge partition
and emit PER-PARTITION pre-aggregated ``(dst, partial_sum)`` rows (the
combiner runs inside the kernel, so the second exchange moves
O(partitions × nodes-touched), never O(edges)); (B) partials + the node
list merge into the new rank vector.  Edges are partitioned ONCE by
``src`` and re-used via materialized block refs across all iterations —
no driver-side state beyond dataset lineage.

Reference analog: none (no graph ops in the reference); added as the
iterative-algorithm representative alongside k-means
(``stages/kmeans.py``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["pagerank"]


def pagerank(edges_ds, *, src_col: str = "src", dst_col: str = "dst",
             iters: int = 3, scale_bits: int = 40,
             num_partitions: int = 16):
    """PageRank over a directed edge list (int64 node ids, pre-deduped,
    every node present as a ``src`` at least once — callers with
    dangling nodes add self-loops or filter).  Returns ``(node:int64,
    rank:int64)`` with ranks in units of ``2^-scale_bits``."""
    import ray

    from .partition import materialized_block_refs, partitioned_map

    S = 1 << scale_bits
    T = (3 * S) // 20

    def prep(b: pa.Table) -> pa.Table:
        if b[src_col].null_count or b[dst_col].null_count:
            raise ValueError("pagerank: NULL node ids in the edge list")
        return pa.table({
            "__n": b[src_col].combine_chunks().cast(pa.int64()),
            "dst": b[dst_col].combine_chunks().cast(pa.int64())})

    prepped = edges_ds.map_batches(prep, batch_format="pyarrow",
                                   zero_copy_batch=True)

    deg_empty = pa.table({"__n": pa.array([], pa.int64()),
                          "dst": pa.array([], pa.int64()),
                          "outdeg": pa.array([], pa.int64())})

    def deg_kernel(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "__n" not in t.column_names:
            return deg_empty
        n = t["__n"].to_numpy(zero_copy_only=False)
        new_run = np.concatenate([[True], n[1:] != n[:-1]])
        starts = np.flatnonzero(new_run)
        lens = np.diff(np.concatenate([starts, [len(n)]]))
        run_id = np.cumsum(new_run.astype(np.int64)) - 1
        return t.append_column("outdeg",
                               pa.array(lens[run_id], pa.int64()))

    # ONE src-keyed exchange computes out-degrees; the partitioned edge
    # blocks are materialized once and re-read every iteration
    edges = partitioned_map(prepped, deg_kernel, key="__n",
                            sort_keys=["__n", "dst"],
                            num_partitions=num_partitions,
                            strategy="tasks")
    edge_refs = list(materialized_block_refs(edges))

    def edges_dataset():
        return ray.data.from_arrow_refs(list(edge_refs))

    def init_ranks(b: pa.Table) -> pa.Table:
        n = b["__n"].to_numpy(zero_copy_only=False)
        first = np.concatenate([[True], n[1:] != n[:-1]])
        idx = np.flatnonzero(first)
        return pa.table({
            "__n": pa.array(n[idx], pa.int64()),
            "r": pa.array(np.full(len(idx), S, np.int64))})

    # blocks are whole src-partitions, so per-block first-of-run gives
    # each node exactly once globally
    ranks = edges_dataset().map_batches(init_ranks,
                                        batch_format="pyarrow",
                                        batch_size=None,
                                        zero_copy_batch=True)

    def tag_edges(b: pa.Table) -> pa.Table:
        return pa.table({
            "__n": b["__n"],
            "__tag": pa.array(np.ones(b.num_rows, np.int8)),
            "dst": b["dst"], "outdeg": b["outdeg"],
            "r": pa.nulls(b.num_rows, pa.int64())})

    def tag_ranks(b: pa.Table) -> pa.Table:
        return pa.table({
            "__n": b["__n"],
            "__tag": pa.array(np.zeros(b.num_rows, np.int8)),
            "dst": pa.nulls(b.num_rows, pa.int64()),
            "outdeg": pa.nulls(b.num_rows, pa.int64()),
            "r": b["r"]})

    part_empty = pa.table({"__n": pa.array([], pa.int64()),
                           "ps": pa.array([], pa.int64())})

    def contrib_kernel(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "__n" not in t.column_names:
            return part_empty
        n = t["__n"].to_numpy(zero_copy_only=False)
        tag = t["__tag"].to_numpy(zero_copy_only=False)
        new_run = np.concatenate([[True], n[1:] != n[:-1]])
        starts = np.flatnonzero(new_run)
        run_id = np.cumsum(new_run.astype(np.int64)) - 1
        if not (tag[starts] == 0).all():
            raise ValueError("pagerank: node with edges but no rank row"
                             " — edge list mutated between iterations")
        # exactly one rank row per node: a block split mid-partition in
        # init_ranks would silently duplicate mass — fail loudly instead
        if int(np.add.reduceat((tag == 0).astype(np.int64),
                               starts).max(initial=0)) > 1:
            raise ValueError("pagerank: duplicate rank rows for a node "
                             "(init saw a split partition block)")
        r = t["r"].to_numpy(zero_copy_only=False)
        seg_rank = r[starts][run_id]
        e = tag == 1
        if not e.any():
            return part_empty
        contrib = seg_rank[e] // t["outdeg"].to_numpy(
            zero_copy_only=False)[e]
        dst = t["dst"].to_numpy(zero_copy_only=False)[e]
        u, inv = np.unique(dst, return_inverse=True)
        ps = np.zeros(len(u), np.int64)
        np.add.at(ps, inv, contrib)
        return pa.table({"__n": pa.array(u, pa.int64()),
                         "ps": pa.array(ps)})

    def tag_parts(b: pa.Table) -> pa.Table:
        return pa.table({
            "__n": b["__n"],
            "__tag": pa.array(np.ones(b.num_rows, np.int8)),
            "ps": b["ps"]})

    def tag_nodes(b: pa.Table) -> pa.Table:
        return pa.table({
            "__n": b["__n"],
            "__tag": pa.array(np.zeros(b.num_rows, np.int8)),
            "ps": pa.nulls(b.num_rows, pa.int64())})

    rank_empty = pa.table({"__n": pa.array([], pa.int64()),
                           "r": pa.array([], pa.int64())})

    def update_kernel(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "__n" not in t.column_names:
            return rank_empty
        n = t["__n"].to_numpy(zero_copy_only=False)
        tag = t["__tag"].to_numpy(zero_copy_only=False)
        new_run = np.concatenate([[True], n[1:] != n[:-1]])
        starts = np.flatnonzero(new_run)
        keep = tag[starts] == 0  # partial without a node row: stale dst
        ps = pc.fill_null(t["ps"], 0).to_numpy(zero_copy_only=False)
        s = np.add.reduceat(ps, starts)
        if len(s) and int(np.abs(s).max()) > (1 << 62) // 17:
            raise ValueError("pagerank: contribution sum near int64 "
                             "overflow — raise num_partitions or lower "
                             "scale_bits")
        r_new = T + (17 * s) // 20
        return pa.table({
            "__n": pa.array(n[starts][keep], pa.int64()),
            "r": pa.array(r_new[keep], pa.int64())})

    for _ in range(iters):
        contribs = partitioned_map(
            edges_dataset().map_batches(tag_edges, batch_format="pyarrow",
                                        zero_copy_batch=True)
            .union(ranks.map_batches(tag_ranks, batch_format="pyarrow",
                                     zero_copy_batch=True)),
            contrib_kernel, key="__n", sort_keys=["__n", "__tag", "dst"],
            num_partitions=num_partitions, strategy="tasks")
        ranks = partitioned_map(
            ranks.map_batches(tag_nodes, batch_format="pyarrow",
                              zero_copy_batch=True)
            .union(contribs.map_batches(tag_parts, batch_format="pyarrow",
                                        zero_copy_batch=True)),
            update_kernel, key="__n", sort_keys=["__n", "__tag"],
            num_partitions=num_partitions, strategy="tasks")
        # materialize each iteration so lineage doesn't re-execute the
        # whole chain K times when the next union consumes ranks twice
        ranks = ray.data.from_arrow_refs(
            list(materialized_block_refs(ranks)))

    def rename(b: pa.Table) -> pa.Table:
        return pa.table({"node": b["__n"], "rank": b["r"]})

    return ranks.map_batches(rename, batch_format="pyarrow",
                             zero_copy_batch=True)
