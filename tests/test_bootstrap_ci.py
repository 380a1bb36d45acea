"""bootstrap_group_ci (stages/regress.py) — CI brackets the mean and
tightens with n; exact serial replay; partition invariance."""

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from featurebox_ray.stages.regress import bootstrap_group_ci
from featurebox_ray.stages.sample import knuth_hash


def _table(keys, ids, vals):
    return pa.table({"k": pa.array(keys, pa.string()),
                     "id": pa.array(ids, pa.int64()),
                     "v": pa.array(vals, pa.float64())})


def _run(t, parts=1) -> pd.DataFrame:
    ds = ray.data.from_arrow(t)
    if parts > 1:
        ds = ds.repartition(parts)
    return (bootstrap_group_ci(ds, key_col="k", id_col="id",
                               value_col="v", n_bags=32)
            .to_pandas().sort_values("k").reset_index(drop=True))


def _serial(keys, ids, vals, B=32):
    rows = [(k, i, round(v * 100)) for k, i, v
            in zip(keys, ids, vals)
            if None not in (k, i, v)]
    out = {}
    for k in sorted({r[0] for r in rows}):
        sub = [(i, c) for kk, i, c in rows if kk == k]
        n = len(sub)
        s = sum(c for _, c in sub)
        means = []
        for r in range(B):
            nb = sb = 0
            for i, c in sub:
                h = knuth_hash(np.array([i * B + r], np.int64))[0]
                if (int(h) >> 16) & 1:
                    nb += 1
                    sb += c
            if nb:
                means.append(float(sb) / float(nb))
        means.sort()
        m = len(means)
        lo = means[max(math.ceil(m / 16) - 1, 0)] if m else None
        hi = means[max(math.ceil(15 * m / 16) - 1, 0)] if m else None
        out[k] = (n, float(s) / float(n) if n else None, m, lo, hi)
    return out


def test_ci_brackets_and_tightens():
    rng = np.random.default_rng(8)
    keys, ids, vals = [], [], []
    for i in range(4000):
        keys.append("big")
        ids.append(i)
        vals.append(float(np.round(rng.normal(10, 2), 2)))
    for i in range(40):
        keys.append("small")
        ids.append(100_000 + i)
        vals.append(float(np.round(rng.normal(10, 2), 2)))
    df = _run(_table(keys, ids, vals))
    big = df[df.k == "big"].iloc[0]
    small = df[df.k == "small"].iloc[0]
    assert big.ci_lo < big["mean"] < big.ci_hi
    assert (big.ci_hi - big.ci_lo) < (small.ci_hi - small.ci_lo)


def test_exact_vs_serial_partition_invariant():
    rng = np.random.default_rng(33)
    n = 500
    keys = [None if rng.random() < 0.02 else f"t{rng.integers(3)}"
            for _ in range(n)]
    ids = list(range(n))
    vals = [None if rng.random() < 0.02
            else float(np.round(rng.normal(0, 5), 2))
            for _ in range(n)]
    exp = _serial(keys, ids, vals)
    t = _table(keys, ids, vals)
    for parts in (1, 6):
        df = _run(t, parts)
        got = {r.k: (int(r.n), r["mean"], int(r.n_bags_hit),
                     r.ci_lo, r.ci_hi)
               for _, r in df.iterrows()}
        assert got == exp
