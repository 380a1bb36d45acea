"""session_coactivity (stages/transitions.py) — planted raid cohort;
serial replay fuzz incl. cross-bucket windows; partition
invariance."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from featurebox_ray.stages.transitions import session_coactivity

MIN = 60_000_000


def _run(rows, parts=1, window_s=300.0) -> pd.DataFrame:
    t = pa.table({
        "u": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.int64())})
    ds = ray.data.from_arrow(t)
    if parts > 1:
        ds = ds.repartition(parts)
    return (session_coactivity(ds, key_col="u", ts_col="ts",
                               gap_s=1800.0, window_s=window_s,
                               min_others=3, num_partitions=4)
            .to_pandas().sort_values("u").reset_index(drop=True))


def _serial(rows, gap=1800_000_000, W=300_000_000, m=3):
    from collections import defaultdict

    per = defaultdict(list)
    for u, t in rows:
        per[u].append(t)
    starts = []
    for u, ts in per.items():
        ts.sort()
        prev = None
        for t in ts:
            if prev is None or t - prev > gap:
                starts.append((u, t))
            prev = t
    out = {}
    for u, t in starts:
        co = sum(1 for (u2, t2) in starts
                 if u2 != u and abs(t2 - t) <= W)
        cur = out.setdefault(u, [0, 0, 0])
        cur[0] += 1
        cur[1] = max(cur[1], co)
        cur[2] += 1 if co >= m else 0
    return {u: tuple(v) for u, v in out.items()}


def test_raid_cohort_detected():
    rows = []
    # 5 bots start within one minute of each other, twice
    for b in range(5):
        rows.append((100 + b, 1000 * MIN + b * MIN))
        rows.append((100 + b, 2000 * MIN + b * MIN))
    # one organic user far away
    rows.append((7, 5000 * MIN))
    df = _run(rows)
    bots = df[df.u >= 100]
    assert (bots.max_coactive == 4).all()
    assert (bots.n_coordinated == 2).all()
    org = df[df.u == 7].iloc[0]
    assert (org.max_coactive, org.n_coordinated) == (0, 0)


def test_fuzz_vs_serial_partition_invariant():
    rng = np.random.default_rng(51)
    rows = []
    for _ in range(1500):
        rows.append((int(rng.integers(12)),
                     int(rng.integers(0, 3_000) * MIN
                         + rng.integers(0, MIN))))
    exp = _serial(rows)
    prev = None
    for parts in (1, 6):
        df = _run(rows, parts)
        got = {int(r.u): (int(r.n_sessions), int(r.max_coactive),
                          int(r.n_coordinated))
               for r in df.itertuples()}
        assert got == exp
        if prev is not None:
            pd.testing.assert_frame_equal(df, prev, check_exact=True)
        prev = df
