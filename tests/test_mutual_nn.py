"""mutual_nn_pairs (stages/knn.py) — planted mutual pair + hub that
must NOT match; brute-force replay fuzz; partition invariance."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from featurebox_ray.stages.knn import mutual_nn_pairs


def _table(ids, vecs):
    return pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array(
            [None if v is None else list(map(float, v))
             for v in vecs], pa.list_(pa.float32()))})


def _run(t, parts=1) -> pd.DataFrame:
    ds = ray.data.from_arrow(t)
    if parts > 1:
        ds = ds.repartition(parts)
    return (mutual_nn_pairs(ds, num_partitions=4).to_pandas()
            .sort_values(["id_a", "id_b"]).reset_index(drop=True))


def _brute(ids, vecs) -> set:
    rows = [(i, np.asarray(v, np.float64))
            for i, v in zip(ids, vecs) if v is not None]
    q = {i: np.floor(v * 256 + 0.5).astype(np.int64)
         for i, v in rows}
    nn = {}
    for i in q:
        best = None
        for j in q:
            if j == i:
                continue
            d = int(q[i] @ q[j])
            if best is None or d > best[0] or (d == best[0]
                                              and j < best[1]):
                best = (d, j)
        if best:
            nn[i] = best[1]
    return {(min(i, j), max(i, j)) for i, j in nn.items()
            if nn.get(nn[i]) == i}


def test_planted_mutual_and_hub():
    # 1 and 2 are each other's NN; 99 (the "hub" near both) points to
    # 1 but 1 points to 2 -> 99 must not appear
    vecs = {1: [1.0, 0.0], 2: [0.99, 0.1], 99: [0.8, 0.05],
            7: [-1.0, 0.0], 8: [-0.99, -0.1]}
    # make 99's NN be 1, but 1's NN is 2 (closer)
    ids = sorted(vecs)
    df = _run(_table(ids, [vecs[i] for i in ids]))
    pairs = set(zip(df.id_a, df.id_b))
    assert (1, 2) in pairs and (7, 8) in pairs
    assert not any(99 in p for p in pairs)


def test_fuzz_vs_brute_partition_invariant():
    rng = np.random.default_rng(606)
    n, d = 150, 6
    ids = list(range(n))
    vecs = [None if rng.random() < 0.03
            else rng.normal(0, 0.4, d) for _ in range(n)]
    exp = _brute(ids, vecs)
    t = _table(ids, vecs)
    prev = None
    for parts in (1, 5):
        df = _run(t, parts)
        assert set(zip(df.id_a, df.id_b)) == exp
        if prev is not None:
            pd.testing.assert_frame_equal(df, prev, check_exact=True)
        prev = df
