"""linear_attribution(time_decay=True) — hand-checked dyadic split,
cent reconciliation, serial replay fuzz, partition invariance."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from featurebox_ray.stages.attribution import linear_attribution

DAY = 86_400_000_000
H = 7 * DAY


def _table(rows):
    return pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.int64()),
        "event_id": pa.array(list(range(len(rows))), pa.int64()),
        "event_type": pa.array([r[2] for r in rows], pa.string()),
        "value": pa.array([r[3] for r in rows], pa.float64())})


def _run(t, parts=1) -> dict:
    ds = ray.data.from_arrow(t)
    if parts > 1:
        ds = ds.repartition(parts)
    df = linear_attribution(
        ds, key_col="user_id", ts_col="ts", seq_col="event_id",
        type_col="event_type", value_col="value",
        conv_type="buy", horizon=H, time_decay=True,
        num_partitions=4).to_pandas()
    return {r.event_type: (int(r.credit_cents), int(r.n_touches))
            for r in df.itertuples()}


def _serial(rows):
    out = {}
    evs = sorted([(u, t, i, ty, v) for i, (u, t, ty, v)
                  in enumerate(rows)], key=lambda r: (r[0], r[1],
                                                      r[2]))
    for u, tc, ic, ty, v in evs:
        if ty != "buy" or v is None:
            continue
        c = round(v * 100)
        if c <= 0:
            continue
        touches = [(t, i, ty2) for (u2, t, i, ty2, _v) in evs
                   if u2 == u and ty2 != "buy"
                   and tc - H <= t < tc]
        touches.sort()
        if not touches:
            continue
        ws = [1 << max(7 - (tc - t) // DAY, 0)
              for (t, _i, _ty) in touches]
        W = sum(ws)
        base = [c * w // W for w in ws]
        rem = [c * w % W for w in ws]
        leftover = c - sum(base)
        order = sorted(range(len(ws)),
                       key=lambda j: (-rem[j], j))
        for pos, j in enumerate(order):
            credit = base[j] + (1 if pos < leftover else 0)
            t2 = touches[j][2]
            c0, n0 = out.get(t2, (0, 0))
            out[t2] = (c0 + credit, n0 + 1)
    return out


def test_hand_case_dyadic_weights():
    # one buy of $1.00 with two touches: 0 days back (w=128) and
    # 6 days back (w=2): base = [100*128//130, 100*2//130] = [98, 1]
    # leftover 1 -> larger remainder gets it
    rows = [(1, 10 * DAY, "click", 0.0),
            (1, 16 * DAY - 1, "view", 0.0),
            (1, 16 * DAY, "buy", 1.0)]
    # click at 10d: delta = 6d - eps -> dd = 5 (floor((6d-1)/d)) w=4
    got = _run(_table(rows))
    total = sum(c for c, _ in got.values())
    assert total == 100                       # reconciles to cent
    assert got["view"][0] > got["click"][0]   # recency wins


def test_fuzz_vs_serial_partition_invariant():
    rng = np.random.default_rng(37)
    rows = []
    for _ in range(900):
        u = int(rng.integers(8))
        t = int(rng.integers(0, 30 * DAY))
        ty = ["click", "view", "buy"][int(rng.integers(3))]
        v = float(np.round(rng.uniform(0, 50), 2)) \
            if ty == "buy" else 0.0
        rows.append((u, t, ty, v))
    exp = _serial(rows)
    t = _table(rows)
    for parts in (1, 6):
        assert _run(t, parts) == exp


def test_horizon_guard():
    import pytest

    rows = [(1, 0, "click", 0.0), (1, DAY, "buy", 1.0)]
    t = _table(rows)
    ds = ray.data.from_arrow(t)
    with pytest.raises(Exception, match="62"):
        linear_attribution(
            ds, key_col="user_id", ts_col="ts",
            seq_col="event_id", type_col="event_type",
            value_col="value", conv_type="buy",
            horizon=70 * DAY, time_decay=True,
            num_partitions=2).to_pandas()
