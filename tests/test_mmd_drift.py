"""mmd_drift (stages/cohesion.py) — trace identity vs brute-force
pair sums; shifted-vs-same distribution ranking; partition
invariance."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
from fractions import Fraction

from featurebox_ray.stages.cohesion import mmd_drift


def _table(labs, vecs):
    return pa.table({
        "vec_id": pa.array(list(range(len(labs))), pa.int64()),
        "label": pa.array(labs, pa.int32()),
        "embedding": pa.array(
            [None if v is None else list(map(float, v))
             for v in vecs], pa.list_(pa.float32()))})


def _run(t, parts=1) -> pd.DataFrame:
    ds = ray.data.from_arrow(t)
    if parts > 1:
        ds = ds.repartition(parts)
    return (mmd_drift(ds).to_pandas()
            .sort_values(["g_a", "g_b"]).reset_index(drop=True))


def _brute(labs, vecs):
    """O(n²) pair sums — no trace identity — as exact Fractions,
    then the engine's float sequence."""
    rows = [(l, np.floor(np.asarray(v, np.float64) * 256
                         + 0.5).astype(np.int64))
            for l, v in zip(labs, vecs) if v is not None
            and l is not None]
    by = {}
    for l, q in rows:
        by.setdefault(l, []).append(q)
    out = {}
    gs = sorted(g for g in by if len(by[g]) >= 2)
    within = {}
    for g in gs:
        X = by[g]
        num = sum(int(X[i] @ X[j]) ** 2
                  for i in range(len(X)) for j in range(len(X))
                  if i != j)
        within[g] = np.float64(num) / np.float64(
            len(X) * (len(X) - 1))
    for i, ga in enumerate(gs):
        for gb in gs[i + 1:]:
            A, B = by[ga], by[gb]
            num = sum(int(a @ b) ** 2 for a in A for b in B)
            exy = np.float64(num) / np.float64(len(A) * len(B))
            out[(ga, gb)] = (float(exy), float(within[ga]),
                             float(within[gb]),
                             float(np.float64(2.0) * exy
                                   - within[ga] - within[gb]))
    return out


def test_brute_force_exact_and_partition_invariant():
    rng = np.random.default_rng(12)
    n, d = 90, 5
    labs = [None if rng.random() < 0.03 else int(rng.integers(3))
            for _ in range(n)]
    vecs = [None if rng.random() < 0.03
            else rng.normal(0, 0.3, d) for _ in range(n)]
    exp = _brute(labs, vecs)
    t = _table(labs, vecs)
    prev = None
    for parts in (1, 4):
        df = _run(t, parts)
        got = {(int(r.g_a), int(r.g_b)):
               (r.exy, r.exx, r.eyy, r.mmd2)
               for r in df.itertuples()}
        assert got == exp
        if prev is not None:
            pd.testing.assert_frame_equal(df, prev, check_exact=True)
        prev = df


def test_shifted_group_has_larger_mmd():
    rng = np.random.default_rng(9)
    d = 6
    a = rng.normal(0.0, 0.1, (60, d))
    b = rng.normal(0.0, 0.1, (60, d))      # same dist as a
    c = rng.normal(0.5, 0.1, (60, d))      # shifted
    labs = [0] * 60 + [1] * 60 + [2] * 60
    vecs = list(np.vstack([a, b, c]))
    df = _run(_table(labs, vecs))
    m = {(r.g_a, r.g_b): r.mmd2 for r in df.itertuples()}
    # unbiased MMD² with an unnormalized quadratic kernel can be
    # negative; the detection signal is the MAGNITUDE vs the
    # same-distribution pair's near-zero value
    assert abs(m[(0, 2)]) > 10 * abs(m[(0, 1)])
    assert abs(m[(1, 2)]) > 10 * abs(m[(0, 1)])
