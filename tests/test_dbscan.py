"""dbscan_embed (stages/dbscan.py) — planted two-blob + noise
geometry; fuzz vs the independent BFS replay; partition
invariance."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from _oracle_replays import replay_dbscan
from featurebox_ray.stages.dbscan import dbscan_embed


def _table(ids, vecs):
    return pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array(
            [None if v is None else list(map(float, v))
             for v in vecs], pa.list_(pa.float32()))})


def _run(t, thr, min_pts=4, parts=1) -> pd.DataFrame:
    ds = ray.data.from_arrow(t)
    if parts > 1:
        ds = ds.repartition(parts)
    return (dbscan_embed(ds, threshold_num=thr, min_pts=min_pts,
                         num_partitions=4).to_pandas()
            .sort_values("vec_id").reset_index(drop=True))


def test_two_blobs_and_noise():
    rng = np.random.default_rng(5)
    a = rng.normal([0.8, 0.0], 0.02, (20, 2))
    b = rng.normal([0.0, 0.8], 0.02, (20, 2))
    lone = np.array([[-0.8, -0.8]])
    vecs = np.vstack([a, b, lone]).astype(np.float32)
    ids = list(range(100, 100 + len(vecs)))
    # dot within a blob ~ (0.8*256)^2 ~ 42k; cross-blob ~ 0
    df = _run(_table(ids, list(vecs)), thr=30000, min_pts=3)
    ca = set(df[df.vec_id < 120].cluster)
    cb = set(df[(df.vec_id >= 120) & (df.vec_id < 140)].cluster)
    assert ca == {100} and cb == {120}
    lone_row = df[df.vec_id == 140].iloc[0]
    assert pd.isna(lone_row.cluster) and lone_row.is_core == 0


def test_fuzz_vs_replay_partition_invariant():
    rng = np.random.default_rng(404)
    n, d = 300, 8
    centers = rng.normal(0, 0.5, (5, d))
    vecs = [None if rng.random() < 0.03
            else (centers[rng.integers(5)]
                  + rng.normal(0, 0.08, d)).astype(np.float32)
            for _ in range(n)]
    ids = list(rng.permutation(10 * n)[:n].astype(np.int64))
    exp = pd.DataFrame(
        replay_dbscan(ids,
                      [None if v is None else [float(x) for x in v]
                       for v in vecs],
                      threshold_num=8000, min_pts=4),
        columns=["vec_id", "cluster", "is_core"])
    t = _table(ids, vecs)
    prev = None
    for parts in (1, 6):
        df = _run(t, 8000, 4, parts)
        pd.testing.assert_frame_equal(
            df.astype(exp.dtypes.to_dict()), exp, check_exact=True)
        if prev is not None:
            pd.testing.assert_frame_equal(df, prev,
                                          check_exact=True)
        prev = df
