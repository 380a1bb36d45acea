"""label_propagation (stages/labelprop.py) — planted two-blob spread
with round bookkeeping; majority tie-break; fuzz vs the independent
replay; partition invariance."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from _oracle_replays import replay_label_propagation
from featurebox_ray.stages.labelprop import label_propagation


def _table(ids, labs, vecs):
    return pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "label": pa.array(labs, pa.int64()),
        "embedding": pa.array(
            [None if v is None else list(map(float, v))
             for v in vecs], pa.list_(pa.float32()))})


def _run(t, thr, rounds=5, parts=1) -> pd.DataFrame:
    ds = ray.data.from_arrow(t)
    if parts > 1:
        ds = ds.repartition(parts)
    return (label_propagation(ds, threshold_num=thr,
                              n_rounds=rounds)
            .to_pandas().sort_values("vec_id")
            .reset_index(drop=True))


def test_chain_spread_rounds():
    # chain of similar vectors: seed at one end; labels hop one
    # neighbor per round
    base = np.array([0.9, 0.0])
    vecs = [base * (1 - 0.001 * i) for i in range(6)]
    # only immediate neighbors are above threshold: craft by spacing
    # alternating tiny orthogonal offsets so only adjacent dots clear
    vecs = []
    for i in range(6):
        v = np.array([np.cos(i * 0.35), np.sin(i * 0.35)]) * 0.9
        vecs.append(v)
    labs = [7, None, None, None, None, None]
    ids = list(range(6))
    # adjacent dot: cos(0.35)*0.81*65536 ~ 49.9k; two-step:
    # cos(0.7)*0.81*65536 ~ 40.6k -> threshold between
    df = _run(_table(ids, labs, vecs), thr=46000, rounds=5)
    assert list(df.label_out) == [7] * 6
    assert list(df.round_labeled) == [0, 1, 2, 3, 4, 5]


def test_majority_and_tie():
    # center node has two label-1 and two label-0 neighbors -> tie ->
    # min label 0; then a 2-vs-1 majority case
    v = [0.9, 0.0]
    ids = [10, 11, 12, 13, 50]
    labs = [0, 0, 1, 1, None]
    vecs = [v, v, v, v, v]
    df = _run(_table(ids, labs, vecs), thr=40000, rounds=1)
    assert df[df.vec_id == 50].label_out.iloc[0] == 0  # tie -> min
    labs2 = [1, 1, 1, 0, None]
    df2 = _run(_table(ids, labs2, vecs), thr=40000, rounds=1)
    assert df2[df2.vec_id == 50].label_out.iloc[0] == 1  # majority


def test_fuzz_vs_replay_partition_invariant():
    rng = np.random.default_rng(220)
    n, d = 250, 6
    centers = rng.normal(0, 0.5, (4, d))
    vecs, labs = [], []
    for i in range(n):
        if rng.random() < 0.03:
            vecs.append(None)
            labs.append(None)
            continue
        c = rng.integers(4)
        vecs.append((centers[c]
                     + rng.normal(0, 0.1, d)).astype(np.float32))
        labs.append(int(c) if rng.random() < 0.3 else None)
    ids = list(rng.permutation(5 * n)[:n].astype(np.int64))
    exp = pd.DataFrame(
        replay_label_propagation(
            ids, labs,
            [None if v is None else [float(x) for x in v]
             for v in vecs], threshold_num=6000, n_rounds=4),
        columns=["vec_id", "label_out", "is_seed",
                 "round_labeled"])
    t = _table(ids, labs, vecs)
    for parts in (1, 6):
        df = _run(t, 6000, 4, parts)
        pd.testing.assert_frame_equal(
            df.astype(exp.dtypes.to_dict()), exp, check_exact=True)
