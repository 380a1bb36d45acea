"""bfs_hops (stages/graph.py) — hand-checked path/star distances;
fuzz vs a serial BFS; cap behavior; partition invariance."""

from collections import deque

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from featurebox_ray.stages.graph import bfs_hops


def _run(edges, seed_mod=17, max_hops=6, parts=1) -> dict[int, int]:
    t = pa.table({"src": pa.array([a for a, _ in edges], pa.int64()),
                  "dst": pa.array([b for _, b in edges], pa.int64())})
    ds = ray.data.from_arrow(t)
    if parts > 1:
        ds = ds.repartition(parts)
    df = bfs_hops(ds, seed_mod=seed_mod, max_hops=max_hops,
                  num_partitions=4).to_pandas()
    if df.empty:
        return {}
    return dict(zip(df.node, df.hops))


def _serial(edges, seed_mod, max_hops) -> dict[int, int]:
    from collections import defaultdict

    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    dist = {u: 0 for u in adj if u % seed_mod == 0}
    q = deque(dist)
    while q:
        u = q.popleft()
        if dist[u] >= max_hops:
            continue
        for v in adj[u]:
            if v not in dist:
                dist[v] = dist[u] + 1
                q.append(v)
    return dist


def test_path_distances_and_cap():
    # path 0-1-2-3-4-5-6; seed = 0 (0 % 17 == 0)
    edges = [(i, i + 1) for i in range(6)]
    got = _run(edges, seed_mod=17, max_hops=3)
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}  # 4,5,6 beyond cap


def test_multi_seed_min():
    # seeds 0 and 34; node 35 is 1 from 34, 3 from 0
    edges = [(0, 1), (1, 2), (2, 35), (34, 35)]
    got = _run(edges)
    assert got[35] == 1 and got[2] == 2 and got[34] == 0


def test_fuzz_vs_serial_partition_invariant():
    rng = np.random.default_rng(3301)
    pairs = set()
    while len(pairs) < 300:
        a, b = rng.integers(0, 90, 2)
        if a != b:
            pairs.add((min(int(a), int(b)), max(int(a), int(b))))
    edges = sorted(pairs)
    exp = _serial(edges, 17, 4)
    for parts in (1, 5):
        got = _run(edges, seed_mod=17, max_hops=4, parts=parts)
        assert got == exp


def test_no_seeds_empty():
    edges = [(1, 2), (2, 3)]
    got = _run(edges, seed_mod=17)
    assert got == {}
