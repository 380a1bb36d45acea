"""randomization_test (stages/regress.py) — planted effect vs null;
exact serial replay; partition invariance."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from featurebox_ray.stages.regress import randomization_test
from featurebox_ray.stages.sample import knuth_hash


def _table(keys, ids, sides, vals):
    return pa.table({"k": pa.array(keys, pa.string()),
                     "id": pa.array(ids, pa.int64()),
                     "side": pa.array(sides, pa.int64()),
                     "v": pa.array(vals, pa.float64())})


def _run(t, parts=1) -> pd.DataFrame:
    ds = ray.data.from_arrow(t)
    if parts > 1:
        ds = ds.repartition(parts)
    out = randomization_test(ds, key_col="k", id_col="id",
                             side_col="side", value_col="v",
                             n_perms=64)
    return (out.to_pandas().sort_values("k")
            .reset_index(drop=True))


def _serial(keys, ids, sides, vals, R=64):
    rows = [(k, i, s, v) for k, i, s, v
            in zip(keys, ids, sides, vals)
            if None not in (k, i, s, v)]
    out = {}
    for k in sorted({r[0] for r in rows}):
        sub = [r for r in rows if r[0] == k]
        c = [round(v * 100) for _, _, _, v in sub]
        s_obs = [s for _, _, s, _ in sub]
        n, S = len(sub), sum(c)
        n1 = sum(s_obs)
        s1 = sum(cc for cc, ss in zip(c, s_obs) if ss)
        n0, s0 = n - n1, S - s1
        obs_num = abs(s0 * n1 - s1 * n0)
        obs_den = n0 * n1
        n_ge = 0
        eids = np.asarray([i for _, i, _, _ in sub], np.int64)
        for r in range(R):
            h = knuth_hash(eids * R + r)
            pb = ((h >> np.uint64(16)) & np.uint64(1)).astype(int)
            n1r = int(pb.sum())
            s1r = int(sum(cc for cc, b in zip(c, pb) if b))
            n0r, s0r = n - n1r, S - s1r
            if n0r * n1r == 0:
                n_ge += 1
            elif abs(s0r * n1r - s1r * n0r) * obs_den \
                    >= obs_num * (n0r * n1r):
                n_ge += 1
        out[k] = (n, n1, float(obs_num), n_ge,
                  float(n_ge + 1) / float(R + 1) if obs_den else None)
    return out


def test_planted_effect_and_null():
    rng = np.random.default_rng(88)
    n = 800
    keys = ["effect"] * n + ["null"] * n
    ids = list(range(2 * n))
    sides = list(rng.integers(0, 2, 2 * n))
    vals = []
    for i in range(n):          # big mean shift on side 1
        vals.append(float(rng.normal(10 if sides[i] else 0, 1)))
    for i in range(n, 2 * n):   # no effect
        vals.append(float(rng.normal(5, 1)))
    df = _run(_table(keys, ids, sides, vals))
    p = dict(zip(df.k, df.p_value))
    assert p["effect"] == 1.0 / 65.0   # smallest achievable p
    assert p["null"] > 0.2


def test_exact_vs_serial_partition_invariant():
    rng = np.random.default_rng(31)
    n = 600
    keys = [None if rng.random() < 0.02 else f"t{rng.integers(3)}"
            for _ in range(n)]
    ids = list(range(n))
    sides = [None if rng.random() < 0.02
             else int(rng.integers(0, 2)) for _ in range(n)]
    vals = [None if rng.random() < 0.02
            else float(np.round(rng.normal(0, 3), 2))
            for _ in range(n)]
    exp = _serial(keys, ids, sides, vals)
    t = _table(keys, ids, sides, vals)
    for parts in (1, 7):
        df = _run(t, parts)
        got = {r.k: (r.n, r.n1_obs, r.obs_num, r.n_ge,
                     None if pd.isna(r.p_value) else r.p_value)
               for r in df.itertuples()}
        assert got == exp
