"""seasonal_anomaly (stages/seasonal.py) — planted off-phase spike
caught, in-phase surge NOT flagged; exact serial replay; partition
invariance."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from featurebox_ray.stages.seasonal import seasonal_anomaly

US_H = 3_600_000_000


def _table(ids, hours, vals):
    return pa.table({
        "id": pa.array(ids, pa.int64()),
        "ts": pa.array([None if h is None else h * US_H + 5
                        for h in hours], pa.int64()),
        "v": pa.array(vals, pa.float64())})


def _run(t, parts=1) -> pd.DataFrame:
    ds = ray.data.from_arrow(t)
    if parts > 1:
        ds = ds.repartition(parts)
    return (seasonal_anomaly(ds, ts_col="ts", id_col="id",
                             value_col="v", k=3, num_partitions=4)
            .to_pandas().sort_values("id").reset_index(drop=True))


def test_phase_aware_flagging():
    rng = np.random.default_rng(6)
    ids, hours, vals = [], [], []
    i = 0
    # hour 3 is quiet (~1.0), hour 12 is busy (~100.0)
    for _ in range(300):
        ids.append(i); hours.append(3)
        vals.append(float(np.round(rng.normal(1.0, 0.1), 2))); i += 1
    for _ in range(300):
        ids.append(i); hours.append(12)
        vals.append(float(np.round(rng.normal(100.0, 5.0), 2)))
        i += 1
    # a 3am spike of 50 (tiny vs the GLOBAL spread, huge for 3am)
    ids.append(9000); hours.append(3); vals.append(50.0)
    # a lunchtime 100 (normal for its bin)
    ids.append(9001); hours.append(12); vals.append(101.0)
    df = _run(_table(ids, hours, vals))
    f = dict(zip(df.id, df.is_anomaly))
    assert f[9000] is True or f[9000] == True    # noqa: E712
    assert not f[9001]


def test_exact_vs_serial_partition_invariant():
    import math

    rng = np.random.default_rng(44)
    n = 2000
    ids = list(range(n))
    hours = [None if rng.random() < 0.02 else int(rng.integers(24))
             for _ in range(n)]
    vals = [None if rng.random() < 0.02
            else float(np.round(rng.normal(0, 7), 2))
            for _ in range(n)]
    rows = [(i, h, round(v * 100)) for i, h, v
            in zip(ids, hours, vals)
            if h is not None and v is not None]

    def qdisc(xs):
        xs = sorted(xs)
        return xs[max(math.ceil(0.5 * len(xs)) - 1, 0)]

    med = {}
    for h in {r[1] for r in rows}:
        med[h] = qdisc([c for _, hh, c in rows if hh == h])
    mad = {}
    for h in med:
        mad[h] = qdisc([abs(c - med[h])
                        for _, hh, c in rows if hh == h])
    exp = {i: (h, c, med[h], mad[h], abs(c - med[h]) > 3 * mad[h])
           for i, h, c in rows}
    t = _table(ids, hours, vals)
    for parts in (1, 6):
        df = _run(t, parts)
        got = {int(r.id): (int(r.bin), int(r.cents), int(r.med),
                           int(r.mad), bool(r.is_anomaly))
               for r in df.itertuples()}
        assert got == exp
