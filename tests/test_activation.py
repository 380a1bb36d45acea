"""activation_latency (stages/retention.py) — hand-checked k-th
pick, short-series NULL, partition invariance."""

import pandas as pd
import pyarrow as pa
import ray

from featurebox_ray.stages.retention import activation_latency


def test_activation_cases():
    rows = [(1, t) for t in (10, 20, 30, 40, 50, 60)] \
        + [(2, t) for t in (5, 15, 25)]
    t = pa.table({
        "u": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.int64()),
        "eid": pa.array(list(range(len(rows))), pa.int64())})
    prev = None
    for parts in (1, 3):
        ds = ray.data.from_arrow(t)
        if parts > 1:
            ds = ds.repartition(parts)
        df = (activation_latency(ds, key_col="u", ts_col="ts",
                                 seq_col="eid", k=5,
                                 num_partitions=4)
              .to_pandas().sort_values("u").reset_index(drop=True))
        r1 = df.iloc[0]
        assert (r1.n, r1.first_ts, r1.kth_ts,
                r1.activation_us) == (6, 10, 50, 40)
        r2 = df.iloc[1]
        assert (r2.n, r2.first_ts) == (3, 5)
        assert pd.isna(r2.kth_ts) and pd.isna(r2.activation_us)
        if prev is not None:
            pd.testing.assert_frame_equal(df, prev, check_exact=True)
        prev = df
