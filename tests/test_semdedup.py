"""SemDeDup (stages/semdedup.py): distributed vs serial replay, planted dups."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray

from featurebox_ray.stages.semdedup import (semantic_dedup,
                                            semantic_dedup_serial)

SF = "/root/testdata/sf0.001"


def _collect(ds):
    out = ds.to_pandas().sort_values("vec_id").reset_index(drop=True)
    return out


def test_semdedup_matches_serial_replay_any_partitioning():
    tbl = pq.read_table(f"{SF}/embeddings.parquet",
                        columns=["vec_id", "embedding"])
    want = semantic_dedup_serial(tbl, k=8, iters=3, threshold=0.9
                                 ).to_pandas().sort_values("vec_id"
                                                           ).reset_index(drop=True)
    ds = ray.data.read_parquet(f"{SF}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    for parts in (2, 7):
        got = _collect(semantic_dedup(ds, k=8, iters=3, threshold=0.9,
                                      num_partitions=parts))
        assert got["cluster"].tolist() == want["cluster"].tolist()
        assert got["is_dup"].tolist() == want["is_dup"].tolist(), parts


def test_semdedup_planted_duplicates():
    rng = np.random.default_rng(11)
    base = rng.normal(size=(4, 16)).astype(np.float64)
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    rows = [base[0],                 # id 0: kept (first of its pair)
            base[0] * 0.97,          # id 1: same direction -> dup of 0
            base[1],                 # id 2: unique
            base[2],                 # id 3: kept
            base[2] + 0.001 * base[3],  # id 4: near-parallel -> dup of 3
            -base[0]]                # id 5: opposite sign -> NOT a dup
    tbl = pa.table({
        "vec_id": pa.array(range(6), pa.int64()),
        "embedding": pa.array([list(map(float, r)) for r in rows],
                              pa.list_(pa.float32())),
    })
    out = _collect(semantic_dedup(ray.data.from_arrow(tbl), k=1, iters=1,
                                  threshold=0.95, num_partitions=2))
    assert out["is_dup"].tolist() == [0, 1, 0, 0, 1, 0]
    # serial replay agrees
    rep = semantic_dedup_serial(tbl, k=1, iters=1, threshold=0.95)
    assert rep["is_dup"].to_pylist() == [0, 1, 0, 0, 1, 0]


def test_semdedup_zero_vectors_never_duplicate():
    tbl = pa.table({
        "vec_id": pa.array([0, 1, 2], pa.int64()),
        "embedding": pa.array([[0.0] * 8, [0.0] * 8, [1.0] + [0.0] * 7],
                              pa.list_(pa.float32())),
    })
    out = _collect(semantic_dedup(ray.data.from_arrow(tbl), k=1, iters=1,
                                  threshold=0.5, num_partitions=1))
    assert out["is_dup"].tolist() == [0, 0, 0]


def test_semdedup_max_group_skip_keeps_rows():
    tbl = pq.read_table(f"{SF}/embeddings.parquet",
                        columns=["vec_id", "embedding"])
    ds = ray.data.from_arrow(tbl)
    # (the skip warning fires inside the Ray worker, not this process)
    out = _collect(semantic_dedup(ds, k=1, iters=1, threshold=0.9,
                                  num_partitions=1, max_group=10))
    assert out["is_dup"].sum() == 0
    assert len(out) == tbl.num_rows
