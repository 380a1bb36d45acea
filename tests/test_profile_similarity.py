"""profile_similarity (stages/seasonal.py) — in-phase vs off-phase
planted users; exact serial replay; partition invariance."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from featurebox_ray.stages.seasonal import profile_similarity

US_H = 3_600_000_000


def _table(users, hours):
    ts = [None if h is None else h * US_H + 17 for h in hours]
    return pa.table({"u": pa.array(users, pa.int64()),
                     "ts": pa.array(ts, pa.int64())})


def _run(t, parts=1) -> pd.DataFrame:
    ds = ray.data.from_arrow(t)
    if parts > 1:
        ds = ds.repartition(parts)
    return (profile_similarity(ds, key_col="u", ts_col="ts",
                               num_partitions=4)
            .to_pandas().sort_values("u").reset_index(drop=True))


def test_phase_conformity_ranks():
    rng = np.random.default_rng(2)
    users, hours = [], []
    # 20 users active at business hours 9-17
    for u in range(20):
        for _ in range(150):
            users.append(u)
            hours.append(int(rng.integers(9, 18)))
    # one bot active only at 3am
    for _ in range(30):
        users.append(99)
        hours.append(3)
    df = _run(_table(users, hours))
    bot = df[df.u == 99].cos2.iloc[0]
    human = df[df.u == 5].cos2.iloc[0]
    assert human > 0.85 and bot < 0.15 and human > 4 * bot


def test_exact_vs_serial_partition_invariant():
    rng = np.random.default_rng(77)
    n = 4000
    users = [None if rng.random() < 0.02
             else int(rng.integers(12)) for _ in range(n)]
    hours = [None if rng.random() < 0.02
             else int(rng.integers(24)) for _ in range(n)]
    rows = [(u, h) for u, h in zip(users, hours)
            if u is not None and h is not None]
    G = np.zeros(24, int)
    for _, h in rows:
        G[h] += 1
    v2 = int((G * G).sum())
    exp = {}
    for u in sorted({r[0] for r in rows}):
        hs = np.zeros(24, int)
        for uu, h in rows:
            if uu == u:
                hs[h] += 1
        dot = int((hs * G).sum())
        u2 = int((hs * hs).sum())
        cos2 = (np.float64(dot) * np.float64(dot)) \
            / (np.float64(u2) * np.float64(v2))
        exp[u] = (int(hs.sum()), dot, u2, float(cos2))
    t = _table(users, hours)
    for parts in (1, 7):
        df = _run(t, parts)
        got = {int(r.u): (int(r.n), int(r.dot), int(r.u2),
                          float(r.cos2)) for r in df.itertuples()}
        assert got == exp
