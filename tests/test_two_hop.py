"""two_hop_reach (stages/graph.py) — hand-checked star/path reach;
serial replay fuzz; mid-degree cap; partition invariance."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from featurebox_ray.stages.graph import two_hop_reach


def _run(edges, cap=1024, parts=1) -> pd.DataFrame:
    t = pa.table({"src": pa.array([a for a, _ in edges], pa.int64()),
                  "dst": pa.array([b for _, b in edges], pa.int64())})
    ds = ray.data.from_arrow(t)
    if parts > 1:
        ds = ds.repartition(parts)
    return (two_hop_reach(ds, max_mid_degree=cap,
                          num_partitions=4).to_pandas()
            .sort_values("node").reset_index(drop=True))


def _serial(edges, cap):
    from collections import defaultdict

    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    out = {}
    for v in adj:
        two = set()
        for u in adj[v]:
            if len(adj[u]) > cap:
                continue
            two |= adj[u]
        two -= adj[v]
        two.discard(v)
        out[v] = (len(adj[v]), len(two))
    return out


def test_star_and_path():
    # star center 0 with leaves 1..4: center n2=0, each leaf n2=3
    edges = [(0, i) for i in range(1, 5)]
    df = _run(edges)
    got = {r.node: (r.n1, r.n2) for r in df.itertuples()}
    assert got[0] == (4, 0)
    for leaf in range(1, 5):
        assert got[leaf] == (1, 3)
    # path 10-11-12-13: ends reach 1 two-hop, middles reach 1
    edges2 = [(10, 11), (11, 12), (12, 13)]
    got2 = {r.node: (r.n1, r.n2)
            for r in _run(edges2).itertuples()}
    assert got2[10] == (1, 1) and got2[11] == (2, 1)


def test_fuzz_vs_serial_partition_invariant_with_cap():
    rng = np.random.default_rng(70)
    pairs = set()
    while len(pairs) < 350:
        a, b = rng.integers(0, 70, 2)
        if a != b:
            pairs.add((min(int(a), int(b)), max(int(a), int(b))))
    edges = sorted(pairs)
    for cap in (1024, 8):
        exp = _serial(edges, cap)
        for parts in (1, 5):
            df = _run(edges, cap, parts)
            got = {r.node: (r.n1, r.n2) for r in df.itertuples()}
            assert got == exp
