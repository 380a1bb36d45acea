"""haar_energy (stages/wavelet.py) — hand-checked decomposition vs a
serial pywt-free replay; Parseval sanity; partition invariance;
incomplete-bucket drop; guard."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from featurebox_ray.stages.wavelet import haar_energy


def _run(t: pa.Table, parts: int = 1, max_level: int = 3):
    ds = ray.data.from_arrow(t)
    if parts > 1:
        ds = ds.repartition(parts)
    out = haar_energy(ds, key_col="u", ts_col="ts", order_col="i",
                      value_col="v", max_level=max_level,
                      num_partitions=4)
    return (out.to_pandas().sort_values(["u", "level"])
            .reset_index(drop=True))


def _serial(cents: list[int], max_level: int):
    """independent replay: explicit bucket walk with Python ints."""
    rows = {}
    for j in range(1, max_level + 1):
        full = 1 << j
        half = full >> 1
        nb = len(cents) // full
        if nb == 0:
            continue
        num = 0
        for k in range(nb):
            blk = cents[k * full:(k + 1) * full]
            d = sum(blk[:half]) - sum(blk[half:])
            num += d * d
        rows[j] = (nb, float(num), float(num) / float(full))
    return rows


def test_hand_case():
    # u=a series (cents): 100,300,300,100 →
    # L1: D=(100-300)=-200, (300-100)=200; num=80000, e=40000
    # L2: D=(400-400)=0; num=0
    t = pa.table({"u": pa.array(["a"] * 4),
                  "ts": pa.array([1, 2, 3, 4], pa.int64()),
                  "i": pa.array([1, 2, 3, 4], pa.int64()),
                  "v": pa.array([1.0, 3.0, 3.0, 1.0])})
    df = _run(t, max_level=2)
    l1 = df[df.level == 1].iloc[0]
    l2 = df[df.level == 2].iloc[0]
    assert l1.n_buckets == 2 and l1.energy_num == 80000.0
    assert l1.energy_c2 == 40000.0
    assert l2.n_buckets == 1 and l2.energy_num == 0.0


def test_fuzz_vs_serial_partition_invariant():
    rng = np.random.default_rng(5321)
    n = 3000
    us = [None if rng.random() < 0.02 else f"u{rng.integers(0, 12)}"
          for _ in range(n)]
    ts = rng.permutation(n).astype(np.int64)
    vs = np.round(rng.normal(0, 40, n), 2)
    vs[rng.random(n) < 0.03] = np.nan  # NULL -> 0 cents
    t = pa.table({"u": pa.array(us, pa.string()),
                  "ts": pa.array(ts),
                  "i": pa.array(np.arange(n, dtype=np.int64)),
                  "v": pa.array([None if np.isnan(x) else float(x)
                                 for x in vs], pa.float64())})
    seqs: dict[str, list] = {}
    order = sorted(range(n), key=lambda r: (ts[r], r))
    for r in order:
        if us[r] is None:
            continue
        c = 0 if np.isnan(vs[r]) else int(round(vs[r] * 100))
        seqs.setdefault(us[r], []).append(c)
    prev = None
    for parts in (1, 8):
        df = _run(t, parts)
        for u, cents in seqs.items():
            exp = _serial(cents, 3)
            got = df[df.u == u]
            assert set(got.level) == set(exp)
            for _, r in got.iterrows():
                nb, num, e = exp[int(r.level)]
                assert (r.n_buckets, r.energy_num,
                        r.energy_c2) == (nb, num, e)
        if prev is not None:
            pd.testing.assert_frame_equal(df, prev, check_exact=True)
        prev = df


def test_short_series_levels_absent():
    t = pa.table({"u": pa.array(["a", "a", "a"]),
                  "ts": pa.array([1, 2, 3], pa.int64()),
                  "i": pa.array([1, 2, 3], pa.int64()),
                  "v": pa.array([1.0, 2.0, 5.0])})
    df = _run(t, max_level=3)
    # 3 rows: level 1 has one complete bucket, levels 2/3 none
    assert list(df.level) == [1]
    assert df.iloc[0].n_buckets == 1
