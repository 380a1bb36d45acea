"""knn_classifier_eval (stages/knn.py) — hand-checked confusion on a
separable planted set; boundary-tie determinism; brute-force fuzz;
partition invariance."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from featurebox_ray.stages.knn import knn_classifier_eval


def _table(ids, labs, vecs):
    return pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "label": pa.array(labs, pa.int64()),
        "embedding": pa.array(
            [None if v is None else list(map(float, v))
             for v in vecs], pa.list_(pa.float32()))})


def _run(t, k=5, parts=1) -> pd.DataFrame:
    ds = ray.data.from_arrow(t)
    if parts > 1:
        ds = ds.repartition(parts)
    return (knn_classifier_eval(ds, k=k).to_pandas()
            .sort_values("label").reset_index(drop=True))


def _brute(ids, labs, vecs, k):
    rows = [(i, l, np.asarray(v, np.float64))
            for i, l, v in zip(ids, labs, vecs)
            if v is not None and l is not None]
    q = {i: np.floor(v * 256 + 0.5).astype(np.int64)
         for i, _, v in rows}
    lab = {i: l for i, l, _ in rows}
    agg = {}
    for i, li, _ in rows:
        cand = sorted((int(-(q[i] @ q[j])), j)
                      for j, _, _ in rows if j != i)[:k]
        votes = {}
        for _, j in cand:
            votes[lab[j]] = votes.get(lab[j], 0) + 1
        pred = min(votes, key=lambda c: (-votes[c], c))
        a = agg.setdefault(li, [0, 0, 0, 0])
        a[0] += 1
        if pred == li:
            a[1] += 1
        else:
            a[3] += 1
            b = agg.setdefault(pred, [0, 0, 0, 0])
            b[2] += 1
    return agg


def test_separable_blobs_perfect_report():
    rng = np.random.default_rng(3)
    a = rng.normal([0.8, 0.0], 0.02, (10, 2))
    b = rng.normal([-0.8, 0.0], 0.02, (10, 2))
    vecs = np.vstack([a, b]).astype(np.float32)
    labs = [0] * 10 + [1] * 10
    df = _run(_table(list(range(20)), labs, list(vecs)), k=3)
    assert list(df.precision) == [1.0, 1.0]
    assert list(df.recall) == [1.0, 1.0]
    assert list(df.f1) == [1.0, 1.0]
    assert list(df.n_true) == [10, 10]


def test_fuzz_vs_brute_partition_invariant():
    rng = np.random.default_rng(811)
    n, d = 160, 4
    # coarse grid values force many exact dot ties at the boundary
    vecs = [None if rng.random() < 0.03
            else (rng.integers(-2, 3, d) / 4.0) for _ in range(n)]
    labs = [None if rng.random() < 0.03 else int(rng.integers(3))
            for _ in range(n)]
    ids = list(range(n))
    exp = _brute(ids, labs,
                 [None if v is None else np.asarray(v, np.float32)
                  for v in vecs], 5)
    prev = None
    for parts in (1, 6):
        df = _run(_table(ids, labs,
                         [None if v is None
                          else np.asarray(v, np.float32)
                          for v in vecs]), k=5, parts=parts)
        got = {int(r.label): [int(r.n_true), int(r.tp), int(r.fp),
                              int(r.fn)] for r in df.itertuples()}
        assert got == exp
        if prev is not None:
            pd.testing.assert_frame_equal(df, prev, check_exact=True)
        prev = df
