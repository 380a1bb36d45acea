"""ts_collision_audit (stages/profile.py) — planted burst; clean
user; partition invariance."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from featurebox_ray.stages.profile import ts_collision_audit


def _run(users, ts, parts=1) -> pd.DataFrame:
    t = pa.table({"u": pa.array(users, pa.int64()),
                  "ts": pa.array(ts, pa.int64())})
    ds = ray.data.from_arrow(t)
    if parts > 1:
        ds = ds.repartition(parts)
    return (ts_collision_audit(ds, key_col="u", ts_col="ts",
                               num_partitions=4).to_pandas()
            .sort_values("u").reset_index(drop=True))


def test_burst_and_clean():
    users = [1] * 6 + [2] * 3
    ts = [100, 100, 100, 200, 300, 300,   # burst of 3 + pair
          10, 20, 30]                     # clean
    prev = None
    for parts in (1, 4):
        df = _run(users, ts, parts)
        r1 = df[df.u == 1].iloc[0]
        assert (r1.n, r1.n_collided, r1.n_instants,
                r1.max_burst) == (6, 5, 2, 3)
        r2 = df[df.u == 2].iloc[0]
        assert (r2.n, r2.n_collided, r2.n_instants,
                r2.max_burst) == (3, 0, 0, 1)
        if prev is not None:
            pd.testing.assert_frame_equal(df, prev, check_exact=True)
        prev = df


def test_suggest_num_partitions(tmp_path):
    import pyarrow.parquet as pq

    from featurebox_ray.stages.partition import suggest_num_partitions

    t = pa.table({"x": pa.array(np.arange(200_000, dtype=np.int64)),
                  "s": pa.array(["pad" * 10] * 200_000)})
    p = tmp_path / "d"
    p.mkdir()
    pq.write_table(t, str(p / "a.parquet"))
    pq.write_table(t, str(p / "b.parquet"))
    # tiny target -> scales with bytes; floor respected
    small = suggest_num_partitions(str(p), target_bytes=1 << 20)
    assert small >= 8
    one = suggest_num_partitions(str(p / "a.parquet"),
                                 target_bytes=1 << 20)
    assert small > one or small == 8
    cap = suggest_num_partitions(str(p), target_bytes=1,
                                 max_partitions=64)
    assert cap == 64
    floor = suggest_num_partitions(str(p),
                                   target_bytes=1 << 40)
    assert floor == 8
