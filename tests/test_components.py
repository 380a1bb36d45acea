"""Connected components (stages/components.py) vs brute-force BFS."""

import numpy as np
import pyarrow as pa
import ray

from featurebox_ray.stages.components import (connected_components,
                                              min_label_components,
                                              union_find_min_labels)


def _bfs_labels(edges, nodes):
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    label = {}
    for n in nodes:
        if n in label or n not in adj:
            continue
        seen, stack = {n}, [n]
        while stack:
            x = stack.pop()
            for y in adj.get(x, ()):
                if y not in seen:
                    seen.add(y)
                    stack.append(y)
        m = min(seen)
        for x in seen:
            label[x] = m
    return {n: label.get(n, n) for n in nodes}


def test_union_find_matches_bfs_random_graphs():
    rng = np.random.default_rng(3)
    for trial in range(20):
        n_edges = int(rng.integers(0, 40))
        a = rng.integers(0, 30, n_edges).astype(np.int64)
        b = rng.integers(0, 30, n_edges).astype(np.int64)
        edges = list(zip(a.tolist(), b.tolist()))
        lab = union_find_min_labels(a, b)
        nodes = sorted({x for e in edges for x in e})
        want = _bfs_labels(edges, nodes)
        assert {n: lab[n] for n in nodes} == want, trial


def test_connected_components_dataset_chain_star_isolated():
    pairs = pa.table({
        "id_a": pa.array([1, 2, 10, 10, 20], pa.int64()),
        "id_b": pa.array([2, 3, 11, 12, 21], pa.int64()),
    })
    corpus = pa.table({
        "doc_id": pa.array([1, 2, 3, 5, 10, 11, 12, 20, 21, 99], pa.int64()),
    })
    out = connected_components(
        ray.data.from_arrow(pairs), ray.data.from_arrow(corpus)
    ).to_pandas().set_index("doc_id")["component"].to_dict()
    assert out == {1: 1, 2: 1, 3: 1, 5: 5, 10: 10, 11: 10, 12: 10,
                   20: 20, 21: 20, 99: 99}


def test_connected_components_empty_pairs_identity():
    pairs = pa.table({"id_a": pa.array([], pa.int64()),
                      "id_b": pa.array([], pa.int64())})
    corpus = pa.table({"doc_id": pa.array([7, 8], pa.int64())})
    out = connected_components(
        ray.data.from_arrow(pairs), ray.data.from_arrow(corpus)
    ).to_pandas()
    assert out["component"].tolist() == [7, 8]


def test_min_label_components_sharded_fuzz_vs_union_find():
    """Partition-invariance: the pair set sharded across >= 8 blocks,
    8-way exchange — labels must equal the serial union-find replay
    (min-label invariant), with no task ever holding all pairs (the
    algorithm is structurally shard-local; this pins the distributed
    path end to end)."""
    rng = np.random.default_rng(11)
    for trial in range(4):
        n_edges = int(rng.integers(50, 220))
        a = rng.integers(0, 120, n_edges).astype(np.int64)
        b = rng.integers(0, 120, n_edges).astype(np.int64)
        pairs = pa.table({"id_a": pa.array(a), "id_b": pa.array(b)})
        ds = ray.data.from_arrow(pairs).repartition(9).materialize()
        assert ds.num_blocks() >= 8
        out = min_label_components(
            ds, num_partitions=8, small_threshold=0).to_pandas()
        got = dict(zip(out["node"], out["component"]))
        want = union_find_min_labels(a, b)
        assert got == want, trial


def test_min_label_components_long_chain_converges_fast():
    """A 300-node path has diameter 299: plain min propagation needs
    ~300 rounds, the pointer-jumping super-rounds must land well under
    the 64-round cap (O(log diameter))."""
    n = 300
    ids = np.arange(n, dtype=np.int64)
    pairs = pa.table({"id_a": pa.array(ids[:-1] + 1),
                      "id_b": pa.array(ids[1:] + 1)})
    out = min_label_components(
        ray.data.from_arrow(pairs).repartition(8),
        num_partitions=4, max_iters=64, small_threshold=0).to_pandas()
    assert sorted(out["node"]) == list(range(1, n + 1))
    assert set(out["component"]) == {1}


def test_min_label_components_nulls_and_self_pairs():
    pairs = pa.table({
        "id_a": pa.array([1, None, 7, 7, 4], pa.int64()),
        "id_b": pa.array([2, 3, None, 7, 5], pa.int64()),
    })
    for thr in (0, 10 ** 6):     # distributed AND small-path
        out = min_label_components(
            ray.data.from_arrow(pairs),
            small_threshold=thr).to_pandas()
        got = dict(zip(out["node"], out["component"]))
        assert got == {1: 1, 2: 1, 7: 7, 4: 4, 5: 4}, thr


def test_catalog_csv_roundtrip(tmp_path):
    import os

    from featurebox_ray.sources.io import Catalog, write_table

    t = pa.table({
        "k": pa.array([3, 1, 2, 5, 4], pa.int64()),
        "name": pa.array(["a", "b", "c", "d", "e"]),
        "cents": pa.array([100, -250, 0, 99, 12345], pa.int64()),
    })
    d = str(tmp_path / "csv_rt")
    os.makedirs(d)
    write_table(ray.data.from_arrow(t).repartition(2),
                os.path.join(d, "facts"), fmt="csv")
    cat = Catalog(d)
    assert "facts" in cat.tables
    back = cat.read("facts").to_pandas().sort_values("k")
    orig = t.to_pandas().sort_values("k")
    for c in t.column_names:
        assert back[c].tolist() == orig[c].tolist()
    # column projection through the sniffing reader
    proj = cat.read("facts", columns=["k"]).to_pandas()
    assert sorted(proj.columns) == ["k"] and len(proj) == 5
