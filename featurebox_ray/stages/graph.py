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


def triangle_count(edges_ds, *, src_col: str = "src",
                   dst_col: str = "dst", max_degree: int = 4096,
                   num_partitions: int = 16) -> pa.Table:
    """Exact global triangle census over an undirected edge list —
    the graph-clustering diagnostic (how cliquish is a similarity /
    co-occurrence graph) behind community pruning of near-duplicate
    clusters.  Returns ONE row ``(n_edges, n_wedges,
    n_triangles)``, all exact int64.

    Plan — the classic two-round wedge check, all keyed exchanges:

    1. edges normalize to ``(min, max)`` (self-loops and NULLs drop)
       and post BOTH directions; exchange 1 keyed on the center node
       dedups multi-edges per run and enumerates each center's
       neighbor-pair WEDGES fully vectorized (triangular index
       decode).  Nodes with degree > ``max_degree`` RAISE — the
       degree-orientation variant is the documented scale upgrade for
       power-law graphs.
    2. exchange 2 keyed on the wedge endpoints co-locates wedges with
       the (deduped) edge rows; a wedge whose endpoints are an edge
       closes a triangle.  Every triangle closes exactly 3 wedges, so
       ``n_triangles = matches // 3``.

    The driver merges one tiny partial row per partition (Python-int
    sums).  SQL replay: the ``a<b<c`` three-way self-join.
    """
    import ray

    from .partition import materialized_block_refs, partitioned_map

    def prep(b: pa.Table) -> pa.Table:
        keep = pc.fill_null(pc.and_(pc.is_valid(b[src_col]),
                                    pc.is_valid(b[dst_col])), False)
        if not pc.all(keep).as_py():
            b = b.filter(keep)
        s = b[src_col].combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        d = b[dst_col].combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        m = s != d  # drop self-loops
        s, d = s[m], d[m]
        lo, hi = np.minimum(s, d), np.maximum(s, d)
        # both directions: (center, neighbor)
        return pa.table({
            "__m": pa.array(np.concatenate([lo, hi]), pa.int64()),
            "__n": pa.array(np.concatenate([hi, lo]), pa.int64())})

    posted = edges_ds.map_batches(prep, batch_format="pyarrow",
                                  zero_copy_batch=True)

    mid_empty = pa.table({"x": pa.array([], pa.int64()),
                          "y": pa.array([], pa.int64()),
                          "cnt": pa.array([], pa.int64()),
                          "tag": pa.array([], pa.int8())})

    def wedge_kernel(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "__m" not in t.column_names:
            return mid_empty
        m = t["__m"].to_numpy(zero_copy_only=False)
        n = t["__n"].to_numpy(zero_copy_only=False)
        # dedup multi-edges: distinct (m, n) — rows sorted by (m, n)
        first = np.concatenate([[True], (m[1:] != m[:-1])
                                | (n[1:] != n[:-1])])
        m, n = m[first], n[first]
        new_run = np.concatenate([[True], m[1:] != m[:-1]])
        starts = np.flatnonzero(new_run)
        lens = np.diff(np.concatenate([starts, [len(m)]]))
        if len(lens) and int(lens.max()) > max_degree:
            raise ValueError("triangle_count: node degree "
                             f"{int(lens.max())} > max_degree — use a "
                             "degree-oriented variant for this graph")
        # edge rows (tag 0): each undirected edge once (m < n)
        e_mask = m < n
        parts_x = [m[e_mask]]
        parts_y = [n[e_mask]]
        parts_c = [np.ones(int(e_mask.sum()), np.int64)]
        parts_t = [np.zeros(int(e_mask.sum()), np.int8)]
        # wedges: per center, all sorted-neighbor pairs (x < y)
        from ..functions.segments import triangular_pairs

        i_glob, j_glob, _seg = triangular_pairs(starts, lens)
        if len(i_glob):
            # neighbors are sorted within a run, so x < y already
            wx, wy = n[i_glob], n[j_glob]
            order = np.lexsort((wy, wx))
            wx, wy = wx[order], wy[order]
            wf = np.concatenate([[True], (wx[1:] != wx[:-1])
                                 | (wy[1:] != wy[:-1])])
            st = np.flatnonzero(wf)
            wc = np.diff(np.concatenate([st, [len(wx)]]))
            parts_x.append(wx[st])
            parts_y.append(wy[st])
            parts_c.append(wc.astype(np.int64))
            parts_t.append(np.ones(len(st), np.int8))
        return pa.table({
            "x": pa.array(np.concatenate(parts_x), pa.int64()),
            "y": pa.array(np.concatenate(parts_y), pa.int64()),
            "cnt": pa.array(np.concatenate(parts_c)),
            "tag": pa.array(np.concatenate(parts_t))})

    mid = partitioned_map(posted, wedge_kernel, key="__m",
                          sort_keys=["__m", "__n"],
                          num_partitions=num_partitions,
                          strategy="tasks")

    out_empty = pa.table({"n_edges": pa.array([], pa.int64()),
                          "n_wedges": pa.array([], pa.int64()),
                          "matches": pa.array([], pa.int64())})

    def close_kernel(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "x" not in t.column_names:
            return out_empty
        x = t["x"].to_numpy(zero_copy_only=False)
        y = t["y"].to_numpy(zero_copy_only=False)
        tag = t["tag"].to_numpy(zero_copy_only=False)
        cnt = t["cnt"].to_numpy(zero_copy_only=False)
        new_run = np.concatenate([[True], (x[1:] != x[:-1])
                                  | (y[1:] != y[:-1])])
        starts = np.flatnonzero(new_run)
        run_id = np.cumsum(new_run.astype(np.int64)) - 1
        is_edge = tag == 0
        has_edge = np.zeros(len(starts), bool)
        has_edge[run_id[is_edge]] = True
        wedge_cnt = np.where(tag == 1, cnt, 0)
        per_run_w = np.add.reduceat(wedge_cnt, starts)
        n_edges = int(is_edge.sum())
        n_wedges = int(wedge_cnt.sum())
        matches = int(per_run_w[has_edge].sum())
        return pa.table({"n_edges": pa.array([n_edges], pa.int64()),
                         "n_wedges": pa.array([n_wedges], pa.int64()),
                         "matches": pa.array([matches], pa.int64())})

    partials = partitioned_map(mid, close_kernel, key="x",
                               sort_keys=["x", "y", "tag"],
                               num_partitions=num_partitions,
                               strategy="tasks")
    e = w = mt = 0
    for blk in ray.get(materialized_block_refs(partials)):
        for r in range(blk.num_rows):
            e += blk["n_edges"][r].as_py()
            w += blk["n_wedges"][r].as_py()
            mt += blk["matches"][r].as_py()
    if mt % 3:
        raise AssertionError("triangle_count: wedge-closure total not "
                             "divisible by 3 — duplicate edges "
                             "survived dedup")
    return pa.table({"n_edges": pa.array([e], pa.int64()),
                     "n_wedges": pa.array([w], pa.int64()),
                     "n_triangles": pa.array([mt // 3], pa.int64())})


def window_cooccurrence_edges(ds, *, ts_col: str, actor_col: str,
                              width_us: int = 3_600_000_000,
                              max_actors: int = 4096,
                              num_partitions: int = 16):
    """Distinct UNDIRECTED actor pairs co-occurring inside the same
    tumbling time window — the standard interaction-graph builder
    (who was active alongside whom): bucket = ``epoch_us // width``,
    pairs = per-bucket distinct-actor triangles, edges = pairs
    deduplicated across buckets.

    Shape: per-block distinct ``(bucket, actor)`` partials (Arrow
    group_by — the shuffle moves one row per distinct pair per block);
    exchange 1 (bucket-keyed) merges and emits each bucket's
    ``triangular_pairs``; buckets with more than ``max_actors``
    distinct actors are SKIPPED with a logged warning (O(n²) pair
    guard — mirror with ``HAVING count(*) <= max_actors`` in any
    oracle); exchange 2 (src-keyed) deduplicates pairs across buckets
    by sorted-run arithmetic.  Returns ``(src:int64, dst:int64)`` with
    ``src < dst``, one row per distinct edge.
    """
    from ..functions.segments import triangular_pairs
    from .partition import partitioned_map

    def prep(b: pa.Table) -> pa.Table:
        ts = b[ts_col].combine_chunks()
        if pa.types.is_timestamp(ts.type):
            ts = ts.cast(pa.int64())
        keep = pc.and_(pc.fill_null(pc.is_valid(ts), False),
                       pc.fill_null(pc.is_valid(b[actor_col]), False))
        t = pa.table({"b": pc.divide(ts, width_us),
                      "u": b[actor_col].combine_chunks().cast(
                          pa.int64())}).filter(keep)
        return t.group_by(["b", "u"]).aggregate([])

    distinct_bu = ds.map_batches(prep, batch_format="pyarrow",
                                 zero_copy_batch=True,
                                 batch_size=None)

    empty_e = pa.table({"src": pa.array([], pa.int64()),
                        "dst": pa.array([], pa.int64())})

    def pair_kernel(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "b" not in t.column_names:
            return empty_e
        b = t["b"].to_numpy(zero_copy_only=False)
        u = t["u"].to_numpy(zero_copy_only=False)
        new = np.ones(len(b), bool)
        new[1:] = (b[1:] != b[:-1]) | (u[1:] != u[:-1])
        b, u = b[new], u[new]           # merge cross-block duplicates
        g_new = np.ones(len(b), bool)
        g_new[1:] = b[1:] != b[:-1]
        starts = np.flatnonzero(g_new)
        lens = np.diff(np.append(starts, len(b)))
        keep_seg = lens <= max_actors
        n_skip = int((~keep_seg).sum())
        if n_skip:
            import logging

            logging.getLogger(__name__).warning(
                "window_cooccurrence_edges: skipped %d windows with "
                "> %d actors", n_skip, max_actors)
        sl, ss = lens[keep_seg], starts[keep_seg]
        sl, ss = sl[sl >= 2], ss[sl >= 2]
        if len(sl) == 0:
            return empty_e
        i, j, _gid = triangular_pairs(ss, sl)
        return pa.table({"src": pa.array(u[i]),
                         "dst": pa.array(u[j])})

    pairs = partitioned_map(distinct_bu, pair_kernel, key="b",
                            sort_keys=["b", "u"],
                            num_partitions=num_partitions,
                            strategy="tasks")

    def dedup_kernel(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "src" not in t.column_names:
            return empty_e
        s = t["src"].to_numpy(zero_copy_only=False)
        d = t["dst"].to_numpy(zero_copy_only=False)
        new = np.ones(len(s), bool)
        new[1:] = (s[1:] != s[:-1]) | (d[1:] != d[:-1])
        return pa.table({"src": pa.array(s[new]),
                         "dst": pa.array(d[new])})

    return partitioned_map(pairs, dedup_kernel, key="src",
                           sort_keys=["src", "dst"],
                           num_partitions=num_partitions,
                           strategy="tasks")


def degree_assortativity(edges_ds):
    """Newman degree assortativity of an undirected simple graph given
    as distinct ``(src, dst)`` edge rows — the mixing-pattern audit
    (do high-degree actors attach to high-degree actors?):

        r = [4M·Σjk − (Σ(j+k))²] / [2M·Σ(j²+k²) − (Σ(j+k))²]

    over edges with endpoint degrees (j, k) — the Pearson correlation
    of degrees across edge endpoints (both orientations), cleared of
    the 1/2M factors.

    Exactness: M and the three degree sums are exact int64 totals
    (per-block partials, Python-int driver combine, each guarded
    < 2^53 so int→double casts are exact); ``r`` is the FIXED
    correctly-rounded sequence ``(d(4M)·d(Σjk) − d(Σj+k)·d(Σj+k)) /
    (d(2M)·d(Σq) − d(Σj+k)·d(Σj+k))`` — products may exceed 2^53 but
    IEEE multiply/subtract of identical operands is deterministic, so
    SQL replays it bit-for-bit (the q228 chi2 convention).  A zero
    denominator (regular graph) yields NULL.

    Scale shape: the degree table (one row per node) reduces from
    per-block partials and broadcasts once via ``ray.put`` — nodes ≪
    edges is the documented contract; the edge scan is one streaming
    pass emitting ONE partial row per block.

    Returns one row ``(m:int64, sjk:int64, sj:int64, sq:int64,
    r:float64)``.  Reference analog: none (graph-audit extension next
    to pagerank / triangle_count).
    """
    import ray

    from .partition import materialized_block_refs

    refs = materialized_block_refs(edges_ds)
    edges = ray.data.from_arrow_refs(refs)

    def deg_partial(b: pa.Table) -> pa.Table:
        u = np.concatenate([
            b["src"].to_numpy(zero_copy_only=False),
            b["dst"].to_numpy(zero_copy_only=False)])
        uniq, cnt = np.unique(u, return_counts=True)
        return pa.table({"u": pa.array(uniq.astype(np.int64)),
                         "c": pa.array(cnt.astype(np.int64))})

    dp = edges.map_batches(deg_partial, batch_format="pyarrow",
                           zero_copy_batch=True,
                           batch_size=None).to_pandas()
    if len(dp) == 0:
        return pa.table({"m": pa.array([0], pa.int64()),
                         "sjk": pa.array([0], pa.int64()),
                         "sj": pa.array([0], pa.int64()),
                         "sq": pa.array([0], pa.int64()),
                         "r": pa.array([None], pa.float64())})
    deg = dp.groupby("u", sort=True)["c"].sum()
    deg_ref = ray.put((deg.index.to_numpy(dtype=np.int64),
                       deg.to_numpy(dtype=np.int64)))

    def sum_partial(b: pa.Table) -> pa.Table:
        uids, degs = ray.get(deg_ref)
        s = b["src"].to_numpy(zero_copy_only=False)
        d = b["dst"].to_numpy(zero_copy_only=False)
        j = degs[np.searchsorted(uids, s)]
        k = degs[np.searchsorted(uids, d)]
        return pa.table({
            "m": pa.array([len(s)], pa.int64()),
            "sjk": pa.array([int((j * k).sum())], pa.int64()),
            "sj": pa.array([int((j + k).sum())], pa.int64()),
            "sq": pa.array([int((j * j + k * k).sum())], pa.int64()),
        })

    sp = edges.map_batches(sum_partial, batch_format="pyarrow",
                           zero_copy_batch=True,
                           batch_size=None).to_pandas()
    m = int(sp["m"].sum())
    sjk, sj, sq = (int(sp[c].sum()) for c in ("sjk", "sj", "sq"))
    for name, v in (("4*m", 4 * m), ("sjk", sjk), ("sj", sj),
                    ("sq", sq)):
        if v >= 2 ** 53:
            raise ValueError(
                f"degree_assortativity: {name} >= 2^53 breaks the "
                "exact int->double contract")
    num = float(4 * m) * float(sjk) - float(sj) * float(sj)
    den = float(2 * m) * float(sq) - float(sj) * float(sj)
    r = None if den == 0.0 else num / den
    return pa.table({"m": pa.array([m], pa.int64()),
                     "sjk": pa.array([sjk], pa.int64()),
                     "sj": pa.array([sj], pa.int64()),
                     "sq": pa.array([sq], pa.int64()),
                     "r": pa.array([r], pa.float64())})


def k_core(edges_ds, *, max_iters: int = 1024,
           num_partitions: int = 16):
    """Core-number (k-core) decomposition of an undirected simple
    graph given as distinct ``(src, dst)`` edge rows with ``src <
    dst`` — per node, the largest k such that the node survives in
    the subgraph where every node has degree ≥ k.  The standard
    robustness/engagement grade a raw degree can't give (a
    1000-degree hub whose neighbors are all leaves is core 1).

    Algorithm: the h-index fixed point (Lü et al. 2016, "The H-index
    of a network node and its relation to degree and coreness"):
    ``c_v ← H({c_u : u ∈ N(v)})`` starting from ``c_v = deg_v``,
    where H is the h-index (largest h with ≥ h neighbor values ≥ h).
    The sequence is monotonically non-increasing and converges to the
    core number — an ORDER-INDEPENDENT graph invariant, so the result
    is deterministic under any partitioning, and the oracle can
    verify with a completely different serial algorithm (bucket
    peeling).

    Shape: per iteration, TWO tagged-union task exchanges (the
    pagerank shape): (1) key = value-owner routes each node's current
    c onto its outgoing half-edges, (2) key = recipient computes the
    per-node h-index over gathered neighbor values (one descending
    sort + rank compare per partition).  Each iteration ships O(2E)
    int64 rows; rounds to convergence are bounded by the longest
    strictly-decreasing h-index chain — single digits on social-shaped
    graphs, but Θ(path length) on chain-shaped peripheries (a 130-node
    path needs 65 rounds), hence the generous ``max_iters`` runaway
    cap.  Raises (naming the fix) if the cap is hit with changes
    pending.  All-int arithmetic — no float anywhere.

    Returns ``(node:int64, degree:int64, core:int64)``.
    Reference analog: none (graph suite extension alongside
    pagerank / triangle_count / degree_assortativity).
    """
    import ray

    from .partition import materialized_block_refs, partitioned_map

    def symm(b: pa.Table) -> pa.Table:
        if b["src"].null_count or b["dst"].null_count:
            raise ValueError("k_core: NULL node ids in the edge list")
        s = b["src"].combine_chunks().cast(pa.int64())
        d = b["dst"].combine_chunks().cast(pa.int64())
        return pa.table({
            "__k": pa.concat_arrays([s, d]),
            "to": pa.concat_arrays([d, s])})

    half_edges = edges_ds.map_batches(symm, batch_format="pyarrow",
                                      zero_copy_batch=True)
    edge_refs = list(materialized_block_refs(half_edges))
    if not edge_refs or ray.data.from_arrow_refs(
            list(edge_refs)).count() == 0:
        return pa.table({"node": pa.array([], pa.int64()),
                         "degree": pa.array([], pa.int64()),
                         "core": pa.array([], pa.int64())})

    def edges_dataset():
        return ray.data.from_arrow_refs(list(edge_refs))

    deg_empty = pa.table({"__k": pa.array([], pa.int64()),
                          "c": pa.array([], pa.int64()),
                          "deg": pa.array([], pa.int64()),
                          "changed": pa.array([], pa.int64())})

    def deg_kernel(t: pa.Table) -> pa.Table:
        # per __k-run length = degree; init c = degree
        if t.num_rows == 0 or "__k" not in t.column_names:
            return deg_empty
        n = t["__k"].to_numpy(zero_copy_only=False)
        new_run = np.concatenate([[True], n[1:] != n[:-1]])
        starts = np.flatnonzero(new_run)
        lens = np.diff(np.append(starts, len(n)))
        return pa.table({"__k": pa.array(n[starts]),
                         "c": pa.array(lens.astype(np.int64)),
                         "deg": pa.array(lens.astype(np.int64)),
                         "changed": pa.array(
                             np.ones(len(starts), np.int64))})

    values = partitioned_map(edges_dataset(), deg_kernel, key="__k",
                             sort_keys=["__k", "to"],
                             num_partitions=num_partitions,
                             strategy="tasks")
    value_refs = list(materialized_block_refs(values))

    def tag_vals(b: pa.Table) -> pa.Table:
        return pa.table({"__k": b["__k"],
                         "__tag": pa.array(
                             np.zeros(b.num_rows, np.int8)),
                         "to": pa.nulls(b.num_rows, pa.int64()),
                         "c": b["c"], "deg": b["deg"]})

    def tag_edges(b: pa.Table) -> pa.Table:
        return pa.table({"__k": b["__k"],
                         "__tag": pa.array(
                             np.ones(b.num_rows, np.int8)),
                         "to": b["to"],
                         "c": pa.nulls(b.num_rows, pa.int64()),
                         "deg": pa.nulls(b.num_rows, pa.int64())})

    msg_empty = pa.table({"__k": pa.array([], pa.int64()),
                          "__tag": pa.array([], pa.int8()),
                          "cn": pa.array([], pa.int64()),
                          "c": pa.array([], pa.int64()),
                          "deg": pa.array([], pa.int64())})

    def route_kernel(t: pa.Table) -> pa.Table:
        # sorted (__k, __tag): the value row leads each run; emit the
        # owner's c onto every outgoing half-edge, re-keyed by the
        # recipient, PLUS the owner's own state row (tag 0)
        if t.num_rows == 0 or "__k" not in t.column_names:
            return msg_empty
        n = t["__k"].to_numpy(zero_copy_only=False)
        tag = t["__tag"].to_numpy(zero_copy_only=False)
        new_run = np.concatenate([[True], n[1:] != n[:-1]])
        run_id = np.cumsum(new_run.astype(np.int64)) - 1
        starts = np.flatnonzero(new_run)
        if (tag[starts] != 0).any():
            raise ValueError("k_core: node in edge list missing a "
                             "value row")
        # fill_null BEFORE to_numpy: a null-containing int64 column
        # converts to float64 otherwise
        c_all = pc.fill_null(t["c"].combine_chunks(), 0).to_numpy(
            zero_copy_only=False).astype(np.int64)
        deg_all = pc.fill_null(t["deg"].combine_chunks(),
                               0).to_numpy(
            zero_copy_only=False).astype(np.int64)
        c_owner = c_all[starts]
        is_edge = tag == 1
        to = pc.fill_null(t["to"].combine_chunks(), 0).to_numpy(
            zero_copy_only=False).astype(np.int64)[is_edge]
        cn = c_owner[run_id[is_edge]]
        own = pa.table({"__k": pa.array(n[starts]),
                        "__tag": pa.array(
                            np.zeros(len(starts), np.int8)),
                        "cn": pa.array(np.zeros(len(starts),
                                               np.int64)),
                        "c": pa.array(c_all[starts]),
                        "deg": pa.array(deg_all[starts])})
        msgs = pa.table({"__k": pa.array(to.astype(np.int64)),
                         "__tag": pa.array(
                             np.ones(int(is_edge.sum()), np.int8)),
                         "cn": pa.array(cn.astype(np.int64)),
                         "c": pa.nulls(int(is_edge.sum()),
                                       pa.int64()),
                         "deg": pa.nulls(int(is_edge.sum()),
                                         pa.int64())})
        return pa.concat_tables([own, msgs])

    def hindex_kernel(t: pa.Table) -> pa.Table:
        # sorted (__k, __tag, -cn is not needed): per run, state row
        # first, then neighbor values; h-index via descending sort +
        # rank compare
        if t.num_rows == 0 or "__k" not in t.column_names:
            return deg_empty
        n = t["__k"].to_numpy(zero_copy_only=False)
        tag = t["__tag"].to_numpy(zero_copy_only=False)
        cn = pc.fill_null(t["cn"].combine_chunks(), 0).to_numpy(
            zero_copy_only=False).astype(np.int64)
        new_run = np.concatenate([[True], n[1:] != n[:-1]])
        run_id = np.cumsum(new_run.astype(np.int64)) - 1
        starts = np.flatnonzero(new_run)
        if (tag[starts] != 0).any():
            raise ValueError("k_core: message run missing its state "
                             "row")
        c_old = pc.fill_null(t["c"].combine_chunks(), 0).to_numpy(
            zero_copy_only=False).astype(np.int64)[starts]
        deg = pc.fill_null(t["deg"].combine_chunks(), 0).to_numpy(
            zero_copy_only=False).astype(np.int64)[starts]
        is_msg = tag == 1
        # descending cn within run: sort by (run, -cn)
        order = np.lexsort((-cn[is_msg], run_id[is_msg]))
        rid = run_id[is_msg][order]
        vals = cn[is_msg][order]
        # local rank within run (1-based)
        msg_new = np.concatenate([[True], rid[1:] != rid[:-1]])
        msg_starts = np.flatnonzero(msg_new)
        msg_runid = np.cumsum(msg_new.astype(np.int64)) - 1
        rank = np.arange(len(vals)) - msg_starts[msg_runid] + 1
        ok = vals >= rank
        h = np.zeros(len(starts), np.int64)
        # rid values index the outer runs directly
        np.add.at(h, rid[ok], 1)
        return pa.table({"__k": pa.array(n[starts]),
                         "c": pa.array(h),
                         "deg": pa.array(deg),
                         "changed": pa.array(
                             (h != c_old).astype(np.int64))})

    it = 0
    changed = 1
    while changed and it < max_iters:
        vals_ds = ray.data.from_arrow_refs(list(value_refs))
        unioned = (vals_ds.map_batches(tag_vals,
                                       batch_format="pyarrow",
                                       zero_copy_batch=True)
                   .union(edges_dataset().map_batches(
                       tag_edges, batch_format="pyarrow",
                       zero_copy_batch=True)))
        msgs = partitioned_map(unioned, route_kernel, key="__k",
                               sort_keys=["__k", "__tag"],
                               num_partitions=num_partitions,
                               strategy="tasks")
        nxt = partitioned_map(msgs, hindex_kernel, key="__k",
                              sort_keys=["__k", "__tag"],
                              num_partitions=num_partitions,
                              strategy="tasks")
        value_refs = list(materialized_block_refs(nxt))
        # distributed reduce over the materialized refs — per-node
        # state never lands on the driver
        changed = int(ray.data.from_arrow_refs(list(value_refs))
                      .sum("changed") or 0)
        it += 1
    if changed:
        raise RuntimeError(
            f"k_core: not converged after {max_iters} rounds — a "
            "chain-shaped graph needs ~diameter/2 rounds; raise "
            "max_iters")

    def finalize(b: pa.Table) -> pa.Table:
        return pa.table({"node": b["__k"], "degree": b["deg"],
                         "core": b["c"]})

    return ray.data.from_arrow_refs(list(value_refs)).map_batches(
        finalize, batch_format="pyarrow", zero_copy_batch=True)


def bfs_hops(edges_ds, *, seed_mod: int = 17, max_hops: int = 6,
             num_partitions: int = 16):
    """Multi-source breadth-first hop distance over an undirected
    simple graph given as distinct ``(src, dst)`` edge rows: every
    node whose id satisfies ``node % seed_mod == 0`` is a seed at
    distance 0, and each other node gets the MINIMUM hop count to any
    seed, capped at ``max_hops`` (unreached nodes emit no row) — the
    landmark-distance / influence-radius feature (how far is each
    actor from the moderated/flagged set?).

    Shape: frontier iteration on the k_core exchange skeleton — per
    round, ONLY nodes whose distance improved last round send
    ``dist+1`` to their neighbors (exchange 1, keyed by owner), and
    recipients fold ``min(old, min(incoming))`` (exchange 2, keyed by
    recipient).  Message volume is frontier-bounded (Σ over rounds =
    one relaxation per directed edge in the worst case), rounds ≤
    ``max_hops``.  All-int arithmetic; min-fold is order-independent,
    so the result is exact and partition-invariant.

    SQL replays with a recursive CTE (``UNION`` dedup on (node, d),
    ``WHERE d < max_hops``) + ``min(d)`` per node.

    Returns ``(node:int64, hops:int64)`` for reached nodes.
    Reference analog: none (graph suite extension).
    """
    import ray

    from .partition import materialized_block_refs, partitioned_map

    UNSET = np.int64(2**62)

    def symm(b: pa.Table) -> pa.Table:
        if b["src"].null_count or b["dst"].null_count:
            raise ValueError("bfs_hops: NULL node ids in the edge "
                             "list")
        s = b["src"].combine_chunks().cast(pa.int64())
        d = b["dst"].combine_chunks().cast(pa.int64())
        return pa.table({"__k": pa.concat_arrays([s, d]),
                         "to": pa.concat_arrays([d, s])})

    half_edges = edges_ds.map_batches(symm, batch_format="pyarrow",
                                      zero_copy_batch=True)
    edge_refs = list(materialized_block_refs(half_edges))
    out_empty = pa.table({"node": pa.array([], pa.int64()),
                          "hops": pa.array([], pa.int64())})
    if not edge_refs or ray.data.from_arrow_refs(
            list(edge_refs)).count() == 0:
        return out_empty

    def edges_dataset():
        return ray.data.from_arrow_refs(list(edge_refs))

    val_empty = pa.table({"__k": pa.array([], pa.int64()),
                          "d": pa.array([], pa.int64()),
                          "changed": pa.array([], pa.int64())})

    def init_kernel(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "__k" not in t.column_names:
            return val_empty
        n = t["__k"].to_numpy(zero_copy_only=False)
        new_run = np.concatenate([[True], n[1:] != n[:-1]])
        nodes = n[np.flatnonzero(new_run)]
        is_seed = (nodes % seed_mod) == 0
        d = np.where(is_seed, np.int64(0), UNSET)
        return pa.table({"__k": pa.array(nodes),
                         "d": pa.array(d),
                         "changed": pa.array(
                             is_seed.astype(np.int64))})

    values = partitioned_map(edges_dataset(), init_kernel, key="__k",
                             sort_keys=["__k", "to"],
                             num_partitions=num_partitions,
                             strategy="tasks")
    value_refs = list(materialized_block_refs(values))
    frontier = int(ray.data.from_arrow_refs(list(value_refs))
                   .sum("changed") or 0)

    def tag_vals(b: pa.Table) -> pa.Table:
        return pa.table({"__k": b["__k"],
                         "__tag": pa.array(
                             np.zeros(b.num_rows, np.int8)),
                         "to": pa.array(
                             np.zeros(b.num_rows, np.int64)),
                         "d": b["d"], "changed": b["changed"]})

    def tag_edges(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table({"__k": b["__k"],
                         "__tag": pa.array(np.ones(n, np.int8)),
                         "to": b["to"],
                         "d": pa.array(np.zeros(n, np.int64)),
                         "changed": pa.array(
                             np.zeros(n, np.int64))})

    msg_empty = pa.table({"__k": pa.array([], pa.int64()),
                          "__tag": pa.array([], pa.int8()),
                          "nd": pa.array([], pa.int64()),
                          "d": pa.array([], pa.int64()),
                          "changed": pa.array([], pa.int64())})

    def route_kernel(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "__k" not in t.column_names:
            return msg_empty
        n = t["__k"].to_numpy(zero_copy_only=False)
        tag = t["__tag"].to_numpy(zero_copy_only=False)
        new_run = np.concatenate([[True], n[1:] != n[:-1]])
        run_id = np.cumsum(new_run.astype(np.int64)) - 1
        starts = np.flatnonzero(new_run)
        if (tag[starts] != 0).any():
            raise ValueError("bfs_hops: node missing a value row")
        d_all = t["d"].to_numpy(zero_copy_only=False)
        ch_all = t["changed"].to_numpy(zero_copy_only=False)
        d_owner = d_all[starts]
        ch_owner = ch_all[starts]
        is_edge = tag == 1
        rid = run_id[is_edge]
        # frontier-only, capped expansion
        send = (ch_owner[rid] == 1) & (d_owner[rid] < max_hops)
        to = t["to"].to_numpy(zero_copy_only=False)[is_edge][send]
        nd = d_owner[rid][send] + 1
        own = pa.table({"__k": pa.array(n[starts]),
                        "__tag": pa.array(
                            np.zeros(len(starts), np.int8)),
                        "nd": pa.array(np.zeros(len(starts),
                                               np.int64)),
                        "d": pa.array(d_owner),
                        "changed": pa.array(
                            np.zeros(len(starts), np.int64))})
        msgs = pa.table({"__k": pa.array(to.astype(np.int64)),
                         "__tag": pa.array(
                             np.ones(len(to), np.int8)),
                         "nd": pa.array(nd.astype(np.int64)),
                         "d": pa.array(np.zeros(len(to), np.int64)),
                         "changed": pa.array(
                             np.zeros(len(to), np.int64))})
        return pa.concat_tables([own, msgs])

    def relax_kernel(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "__k" not in t.column_names:
            return val_empty
        n = t["__k"].to_numpy(zero_copy_only=False)
        tag = t["__tag"].to_numpy(zero_copy_only=False)
        nd = t["nd"].to_numpy(zero_copy_only=False)
        new_run = np.concatenate([[True], n[1:] != n[:-1]])
        run_id = np.cumsum(new_run.astype(np.int64)) - 1
        starts = np.flatnonzero(new_run)
        if (tag[starts] != 0).any():
            raise ValueError("bfs_hops: message run missing its "
                             "state row")
        d_old = t["d"].to_numpy(zero_copy_only=False)[starts]
        is_msg = tag == 1
        best = np.full(len(starts), UNSET)
        np.minimum.at(best, run_id[is_msg], nd[is_msg])
        d_new = np.minimum(d_old, best)
        return pa.table({"__k": pa.array(n[starts]),
                         "d": pa.array(d_new),
                         "changed": pa.array(
                             (d_new < d_old).astype(np.int64))})

    rounds = 0
    while frontier and rounds < max_hops:
        vals_ds = ray.data.from_arrow_refs(list(value_refs))
        unioned = (vals_ds.map_batches(tag_vals,
                                       batch_format="pyarrow",
                                       zero_copy_batch=True)
                   .union(edges_dataset().map_batches(
                       tag_edges, batch_format="pyarrow",
                       zero_copy_batch=True)))
        msgs = partitioned_map(unioned, route_kernel, key="__k",
                               sort_keys=["__k", "__tag"],
                               num_partitions=num_partitions,
                               strategy="tasks")
        nxt = partitioned_map(msgs, relax_kernel, key="__k",
                              sort_keys=["__k", "__tag"],
                              num_partitions=num_partitions,
                              strategy="tasks")
        value_refs = list(materialized_block_refs(nxt))
        frontier = int(ray.data.from_arrow_refs(list(value_refs))
                       .sum("changed") or 0)
        rounds += 1

    def finalize(b: pa.Table) -> pa.Table:
        d = b["d"].to_numpy(zero_copy_only=False)
        keep = d != UNSET
        return pa.table({
            "node": pa.array(
                b["__k"].to_numpy(zero_copy_only=False)[keep]
                .astype(np.int64)),
            "hops": pa.array(d[keep].astype(np.int64))})

    return ray.data.from_arrow_refs(list(value_refs)).map_batches(
        finalize, batch_format="pyarrow", zero_copy_batch=True)


def two_hop_reach(edges_ds, *, max_mid_degree: int = 1024,
                  num_partitions: int = 16):
    """Two-hop reach per node — ``n2 = |{w : dist(v, w) = 2}|``, the
    friends-of-friends audience size that separates a hub-adjacent
    node (small degree, huge reach) from an enclave node (same
    degree, reach ≈ clique): the influence/visibility feature one
    hop can't see.

    Shape: wedges enumerate at their MID node (one node-keyed
    exchange co-locates each node's neighbor run; ``triangular_pairs``
    expands it — Σdeg² bounded by SKIPPING mids with degree >
    ``max_mid_degree``, logged, mirrored by the oracle's HAVING — the
    q234 hub cap); a second node-keyed exchange dedups wedge
    endpoints per source and subtracts direct neighbors + self via a
    tagged union (direct rows lead each run).  All set algebra on
    sorted int runs — exact, partition-invariant, full SQL oracle
    (DISTINCT wedge self-join + anti-join).

    Returns ``(node:int64, n1:int64, n2:int64)`` for every node of
    the edge list (n2 counts only paths through surviving mids).
    Reference analog: none (graph suite).
    """
    import ray

    from ..functions.segments import triangular_pairs
    from .partition import materialized_block_refs, partitioned_map

    def symm(b: pa.Table) -> pa.Table:
        if b["src"].null_count or b["dst"].null_count:
            raise ValueError("two_hop_reach: NULL node ids")
        s = b["src"].combine_chunks().cast(pa.int64())
        d = b["dst"].combine_chunks().cast(pa.int64())
        return pa.table({"__k": pa.concat_arrays([s, d]),
                         "to": pa.concat_arrays([d, s])})

    half = edges_ds.map_batches(symm, batch_format="pyarrow",
                                zero_copy_batch=True)
    half_refs = list(materialized_block_refs(half))

    wedge_empty = pa.table({"__k": pa.array([], pa.int64()),
                            "w": pa.array([], pa.int64()),
                            "tag": pa.array([], pa.int8())})

    def wedge_kernel(t: pa.Table) -> pa.Table:
        # sorted (__k, to): one run per mid node
        if t.num_rows == 0 or "__k" not in t.column_names:
            return wedge_empty
        k = t["__k"].to_numpy(zero_copy_only=False)
        to = t["to"].to_numpy(zero_copy_only=False)
        # dedup (mid, neighbor) first: duplicate/pre-symmetrized
        # input edges would inflate the degree cap and skip mids the
        # DISTINCT-based oracle keeps
        uniq = np.concatenate([[True], (k[1:] != k[:-1])
                               | (to[1:] != to[:-1])])
        k, to = k[uniq], to[uniq]
        new = np.concatenate([[True], k[1:] != k[:-1]])
        starts = np.flatnonzero(new)
        lens = np.diff(np.append(starts, len(k)))
        keep = lens <= max_mid_degree
        n_skip = int((~keep).sum())
        if n_skip:
            import logging

            logging.getLogger(__name__).warning(
                "two_hop_reach: skipped %d mids with degree > %d",
                n_skip, max_mid_degree)
        ss, sl = starts[keep], lens[keep]
        ss2, sl2 = ss[sl >= 2], sl[sl >= 2]
        if len(ss2):
            i, j, _g = triangular_pairs(ss2, sl2)
            va, vb = to[i], to[j]
            wedges = pa.table({
                "__k": pa.array(np.concatenate([va, vb])),
                "w": pa.array(np.concatenate([vb, va])),
                "tag": pa.array(np.ones(2 * len(va), np.int8))})
        else:
            wedges = wedge_empty
        # direct-neighbor rows ride along (tag 0) so the dedup
        # kernel can subtract them without a broadcast
        direct = pa.table({"__k": pa.array(k),
                           "w": pa.array(to),
                           "tag": pa.array(np.zeros(len(k),
                                                    np.int8))})
        return pa.concat_tables([direct, wedges])

    wedges = partitioned_map(ray.data.from_arrow_refs(half_refs),
                             wedge_kernel, key="__k",
                             sort_keys=["__k", "to"],
                             num_partitions=num_partitions,
                             strategy="tasks")

    out_empty = pa.table({"node": pa.array([], pa.int64()),
                          "n1": pa.array([], pa.int64()),
                          "n2": pa.array([], pa.int64())})

    def count_kernel(t: pa.Table) -> pa.Table:
        # sorted (__k, tag, w): per node, direct rows first then
        # wedge rows
        if t.num_rows == 0 or "__k" not in t.column_names:
            return out_empty
        k = t["__k"].to_numpy(zero_copy_only=False)
        tag = t["tag"].to_numpy(zero_copy_only=False)
        w = t["w"].to_numpy(zero_copy_only=False)
        new = np.concatenate([[True], k[1:] != k[:-1]])
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], len(k))
        nodes, n1s, n2s = [], [], []
        for s0, s1 in zip(starts.tolist(), ends.tolist()):
            seg_tag = tag[s0:s1]
            seg_w = w[s0:s1]
            direct = np.unique(seg_w[seg_tag == 0])
            cand = np.unique(seg_w[seg_tag == 1])
            v = int(k[s0])
            if len(cand):
                mask = ~np.isin(cand, direct)
                mask &= cand != v
                n2 = int(mask.sum())
            else:
                n2 = 0
            nodes.append(v)
            n1s.append(len(direct))
            n2s.append(n2)
        return pa.table({"node": pa.array(nodes, pa.int64()),
                         "n1": pa.array(n1s, pa.int64()),
                         "n2": pa.array(n2s, pa.int64())})

    return partitioned_map(wedges, count_kernel, key="__k",
                           sort_keys=["__k", "tag", "w"],
                           num_partitions=num_partitions,
                           strategy="tasks")
