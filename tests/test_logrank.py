"""logrank_test (stages/retention.py) — planted fast-churn vs
slow-churn cohorts; exact replay parity; partition invariance."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from _oracle_replays import replay_logrank
from featurebox_ray.stages.retention import logrank_test

DAY = 86_400_000_000


def _table(rows):
    return pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.int64()),
        "event_id": pa.array(list(range(len(rows))), pa.int64()),
        "event_type": pa.array([r[2] for r in rows], pa.string())})


def _run(t, parts=1) -> pd.DataFrame:
    ds = ray.data.from_arrow(t)
    if parts > 1:
        ds = ds.repartition(parts)
    return (logrank_test(ds, censor_window_us=DAY // 2,
                         num_partitions=4).to_pandas()
            .sort_values(["cohort_a", "cohort_b"])
            .reset_index(drop=True))


def test_fast_vs_slow_churn_significant():
    rng = np.random.default_rng(21)
    rows = []
    uid = 0
    # cohort 'fast': lifetimes ~2 days; 'slow': ~20 days
    for cohort, mean in (("fast", 2), ("slow", 20)):
        for _ in range(120):
            uid += 1
            life = max(1, int(rng.poisson(mean)))
            rows.append((uid, 0, cohort))
            rows.append((uid, life * DAY, cohort))
    # anchor the corpus max far beyond everyone (uncensored)
    rows.append((9999, 200 * DAY, "anchor"))
    df = _run(_table(rows))
    r = df[(df.cohort_a == "fast") & (df.cohort_b == "slow")]
    assert len(r) == 1
    assert abs(r.z.iloc[0]) > 5          # wildly different hazards


def test_exact_vs_replay_partition_invariant():
    rng = np.random.default_rng(63)
    rows = []
    for uid in range(150):
        cohort = ["a", "b", "c"][int(rng.integers(3))]
        n_ev = int(rng.integers(1, 5))
        base = int(rng.integers(0, 5)) * DAY
        for j in range(n_ev):
            rows.append((uid, base + int(rng.integers(0, 30))
                         * DAY, cohort))
    exp = pd.DataFrame(
        replay_logrank([r[0] for r in rows],
                       [r[1] for r in rows],
                       list(range(len(rows))),
                       [r[2] for r in rows],
                       censor_window_us=DAY // 2),
        columns=["cohort_a", "cohort_b", "n_a", "n_b", "u", "v",
                 "z"])
    t = _table(rows)
    prev = None
    for parts in (1, 6):
        df = _run(t, parts)
        pd.testing.assert_frame_equal(
            df.astype(exp.dtypes.to_dict()), exp, check_exact=True)
        if prev is not None:
            pd.testing.assert_frame_equal(df, prev, check_exact=True)
        prev = df
