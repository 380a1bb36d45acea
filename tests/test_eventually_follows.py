"""eventually_follows (stages/transitions.py) — hand-checked
ordering semantics; serial replay fuzz; partition invariance."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from featurebox_ray.stages.transitions import eventually_follows


def _run(rows, parts=1) -> dict:
    t = pa.table({
        "u": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.int64()),
        "ty": pa.array([r[2] for r in rows], pa.string())})
    ds = ray.data.from_arrow(t)
    if parts > 1:
        ds = ds.repartition(parts)
    df = eventually_follows(ds, key_col="u", ts_col="ts",
                            type_col="ty",
                            num_partitions=4).to_pandas()
    return {(r.type_a, r.type_b): (r.n_keys, r.n_both)
            for r in df.itertuples()}


def _serial(rows):
    mt = {}
    for u, t, ty in rows:
        cur = mt.setdefault((u, ty), [t, t])
        cur[0] = min(cur[0], t)
        cur[1] = max(cur[1], t)
    out = {}
    users = {u for u, _, _ in rows}
    types = {ty for _, _, ty in rows}
    for a in types:
        for b in types:
            if a == b:
                continue
            sup = both = 0
            for u in users:
                if (u, a) in mt and (u, b) in mt:
                    both += 1
                    if mt[(u, a)][0] < mt[(u, b)][1]:
                        sup += 1
            if both:
                out[(a, b)] = (sup, both)
    return out


def test_hand_semantics():
    rows = [
        (1, 10, "a"), (1, 20, "b"),          # a -> b yes, b -> a no
        (2, 10, "b"), (2, 20, "a"), (2, 30, "b"),
        # user 2: a<b (a@20 < b@30) AND b<a (b@10 < a@20)
        (3, 10, "a"),                         # only a
    ]
    got = _run(rows)
    assert got[("a", "b")] == (2, 2)
    assert got[("b", "a")] == (1, 2)


def test_fuzz_vs_serial_partition_invariant():
    rng = np.random.default_rng(17)
    rows = []
    for _ in range(1200):
        rows.append((int(rng.integers(15)),
                     int(rng.integers(0, 1000)),
                     f"t{rng.integers(5)}"))
    exp = _serial(rows)
    for parts in (1, 6):
        assert _run(rows, parts) == exp


def test_transition_predictability():
    from featurebox_ray.stages.transitions import (
        transition_predictability)

    rows = [(1, t, ty) for t, ty in
            [(1, "a"), (2, "b"), (3, "a"), (4, "b"), (5, "a")]] \
        + [(2, 1, "a"), (2, 2, "a"), (2, 3, "a")] \
        + [(3, 1, "a")]
    t = pa.table({
        "u": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.int64()),
        "eid": pa.array(list(range(len(rows))), pa.int64()),
        "ty": pa.array([r[2] for r in rows], pa.string())})
    prev = None
    for parts in (1, 3):
        ds = ray.data.from_arrow(t)
        if parts > 1:
            ds = ds.repartition(parts)
        df = (transition_predictability(
            ds, key_col="u", ts_col="ts", seq_col="eid",
            type_col="ty", num_partitions=4)
            .to_pandas().sort_values("u").reset_index(drop=True))
        # user 1: transitions ab, ba, ab, ba -> counts {ab:2, ba:2}
        # pred = (4+4)/16 = 0.5
        r1 = df.iloc[0]
        assert (r1.n_trans, r1.sum_sq,
                r1.predictability) == (4, 8, 0.5)
        # user 2: aa, aa -> pred = 4/4 = 1.0
        r2 = df.iloc[1]
        assert (r2.n_trans, r2.predictability) == (2, 1.0)
        # user 3: single event -> NULL
        r3 = df.iloc[2]
        assert r3.n_trans == 0 and pd.isna(r3.predictability)
        if prev is not None:
            pd.testing.assert_frame_equal(df, prev, check_exact=True)
        prev = df


def test_oscillation_audit():
    from featurebox_ray.stages.transitions import oscillation_audit

    rows = [(1, t, ty) for t, ty in enumerate(
        ["a", "b", "a", "b", "a", "c", "c", "d", "c"])] \
        + [(2, 0, "x"), (2, 1, "x"), (2, 2, "x")] \
        + [(3, 0, "q"), (3, 1, "r")]
    t = pa.table({
        "u": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.int64()),
        "eid": pa.array(list(range(len(rows))), pa.int64()),
        "ty": pa.array([r[2] for r in rows], pa.string())})
    prev = None
    for parts in (1, 3):
        ds = ray.data.from_arrow(t)
        if parts > 1:
            ds = ds.repartition(parts)
        df = (oscillation_audit(ds, key_col="u", ts_col="ts",
                                seq_col="eid", type_col="ty",
                                num_partitions=4)
              .to_pandas().sort_values("u").reset_index(drop=True))
        # user 1: a b a b a -> run len 5; later c d c -> 3;
        # ok positions: idx 2,3,4 (ababa) and idx 8 (cdc) -> 4 total
        r1 = df.iloc[0]
        assert (r1.n, r1.longest_osc, r1.n_osc_events) == (9, 5, 4)
        # user 2: x x x -> never alternates (ty == t1)
        r2 = df.iloc[1]
        assert (r2.longest_osc, r2.n_osc_events) == (0, 0)
        # user 3: too short
        r3 = df.iloc[2]
        assert (r3.n, r3.longest_osc) == (2, 0)
        if prev is not None:
            pd.testing.assert_frame_equal(df, prev, check_exact=True)
        prev = df
