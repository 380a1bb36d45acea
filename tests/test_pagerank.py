"""Fixed-point PageRank (stages/graph.py)."""

import numpy as np
import pyarrow as pa
import pytest
import ray

from featurebox_ray.stages.graph import pagerank

S = 1 << 40
T = (3 * S) // 20


def _serial_pagerank(edges, iters):
    """Independent pure-Python replay of the fixed-point iteration."""
    out = {}
    for s, _ in edges:
        out[s] = out.get(s, 0) + 1
    r = {n: S for n in out}
    for _ in range(iters):
        acc = {}
        for s, d in edges:
            acc[d] = acc.get(d, 0) + r[s] // out[s]
        r = {n: T + (17 * acc.get(n, 0)) // 20 for n in r}
    return r


def _ring_plus_hub(n=60):
    edges = [(i, (i + 1) % n) for i in range(n)]
    edges += [(i, 0) for i in range(1, n, 3)]  # hub in-links
    edges += [(0, i) for i in range(1, n, 5)]
    return sorted(set(edges))


@pytest.mark.parametrize("iters", [1, 3])
def test_pagerank_matches_serial_replay(iters):
    edges = _ring_plus_hub()
    t = pa.table({"src": pa.array([e[0] for e in edges], pa.int64()),
                  "dst": pa.array([e[1] for e in edges], pa.int64())})
    want = _serial_pagerank(edges, iters)
    for parts in (2, 5):
        got = (pagerank(ray.data.from_arrow(t).repartition(3),
                        iters=iters, num_partitions=parts)
               .to_pandas().sort_values("node").reset_index(drop=True))
        assert got["node"].tolist() == sorted(want)
        assert got["rank"].tolist() == [want[n] for n in sorted(want)]


def test_pagerank_hub_ranks_highest():
    edges = _ring_plus_hub()
    t = pa.table({"src": pa.array([e[0] for e in edges], pa.int64()),
                  "dst": pa.array([e[1] for e in edges], pa.int64())})
    got = pagerank(ray.data.from_arrow(t), iters=3).to_pandas()
    top = got.loc[got["rank"].idxmax(), "node"]
    assert top == 0  # the hub with the most in-links wins


def test_pagerank_null_edge_raises():
    t = pa.table({"src": pa.array([1, None], pa.int64()),
                  "dst": pa.array([2, 3], pa.int64())})
    with pytest.raises(Exception, match="NULL"):
        pagerank(ray.data.from_arrow(t), iters=1).to_pandas()
