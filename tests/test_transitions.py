"""Event-type transition counts (stages/transitions.py) vs serial replay."""

import numpy as np
import pyarrow as pa
import ray

from featurebox_ray.stages.transitions import event_transition_counts


def _serial(keys, tss, orders, types):
    rows = sorted(zip(keys, tss, orders, types),
                  key=lambda r: (r[0], r[1], r[2]))
    cnt = {}
    for a, b in zip(rows, rows[1:]):
        if a[0] == b[0] and a[3] is not None and b[3] is not None:
            cnt[(a[3], b[3])] = cnt.get((a[3], b[3]), 0) + 1
    tot = {}
    for (f, _), c in cnt.items():
        tot[f] = tot.get(f, 0) + c
    return {k: (c, float(c) / float(tot[k[0]])) for k, c in cnt.items()}


def test_transitions_match_serial_and_partition_invariant():
    rng = np.random.default_rng(31)
    n = 800
    keys = rng.integers(0, 12, n).tolist()
    tss = rng.integers(0, 4000, n).tolist()
    orders = list(range(n))
    types = [None if rng.random() < 0.05
             else str(rng.choice(list("abcd"))) for _ in range(n)]
    t = pa.table({"k": pa.array(keys, pa.int64()),
                  "ts": pa.array(tss, pa.int64()),
                  "o": pa.array(orders, pa.int64()),
                  "et": pa.array(types, pa.string())})
    expect = _serial(keys, tss, orders, types)

    prev = None
    for parts in (1, 6):
        ds = ray.data.from_arrow(t)
        if parts > 1:
            ds = ds.repartition(parts)
        got = (event_transition_counts(ds, key_col="k", ts_col="ts",
                                       order_col="o", type_col="et",
                                       num_partitions=4)
               .to_pandas().sort_values(["from_type", "to_type"])
               .reset_index(drop=True))
        assert len(got) == len(expect)
        for _, r in got.iterrows():
            c, p = expect[(r["from_type"], r["to_type"])]
            assert r["cnt"] == c
            assert r["p"] == p  # bit-exact
        if prev is not None:
            assert got.equals(prev)
        prev = got


def test_transitions_single_events_and_empty():
    # every key has one event -> no pairs -> empty result
    t = pa.table({"k": pa.array([1, 2, 3], pa.int64()),
                  "ts": pa.array([1, 1, 1], pa.int64()),
                  "o": pa.array([0, 1, 2], pa.int64()),
                  "et": pa.array(["a", "b", "c"])})
    got = event_transition_counts(
        ray.data.from_arrow(t), key_col="k", ts_col="ts",
        order_col="o", type_col="et", num_partitions=2).to_pandas()
    assert len(got) == 0
