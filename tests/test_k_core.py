"""k_core (stages/graph.py) — planted clique+tail core numbers; fuzz
vs the independent serial peeling replay; partition invariance."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from featurebox_ray.stages.graph import k_core


def _run(edges: list[tuple[int, int]], parts: int = 1) -> pd.DataFrame:
    t = pa.table({"src": pa.array([a for a, _ in edges], pa.int64()),
                  "dst": pa.array([b for _, b in edges], pa.int64())})
    ds = ray.data.from_arrow(t)
    if parts > 1:
        ds = ds.repartition(parts)
    out = k_core(ds, num_partitions=4)
    return (out.to_pandas().sort_values("node")
            .reset_index(drop=True))


def _peel(edges: list[tuple[int, int]]) -> dict[int, int]:
    from collections import defaultdict

    from _oracle_replays import peel_core_numbers

    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    _deg, core = peel_core_numbers(adj)
    return core


def test_clique_with_tail():
    # K4 on 0-3 (core 3) with a path 3-10-11 (core 1)
    edges = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3),
             (3, 10), (10, 11)]
    df = _run(edges)
    got = dict(zip(df.node, df.core))
    assert got == {0: 3, 1: 3, 2: 3, 3: 3, 10: 1, 11: 1}
    degs = dict(zip(df.node, df.degree))
    assert degs[3] == 4 and degs[11] == 1


def test_fuzz_vs_peeling_partition_invariant():
    rng = np.random.default_rng(977)
    n_nodes = 120
    pairs = set()
    while len(pairs) < 420:
        a, b = rng.integers(0, n_nodes, 2)
        if a != b:
            pairs.add((min(int(a), int(b)), max(int(a), int(b))))
    edges = sorted(pairs)
    exp = _peel(edges)
    prev = None
    for parts in (1, 6):
        df = _run(edges, parts)
        got = dict(zip(df.node, df.core))
        assert got == exp
        if prev is not None:
            pd.testing.assert_frame_equal(df, prev, check_exact=True)
        prev = df


def test_chain_needs_many_rounds():
    # a path's h-index fixed point takes ~len/2 rounds (the review
    # case that used to hit max_iters=64 at 130 nodes) — prove the
    # multi-round path converges and cores are all 1
    edges = [(i, i + 1) for i in range(24)]
    df = _run(edges)
    assert set(df.core) == {1}
    assert len(df) == 25


def test_two_disjoint_triangles():
    edges = [(1, 2), (2, 3), (1, 3), (7, 8), (8, 9), (7, 9)]
    df = _run(edges)
    assert set(df.core) == {2}
    assert len(df) == 6
