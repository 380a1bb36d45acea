"""Large-large bucketed interval join (stages/interval.py)."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest
import ray

from featurebox_ray.stages.interval import bucketed_interval_join


def _mk(rng, n_facts=300, n_iv=80, with_nulls=True):
    ts = rng.integers(0, 100_000, n_facts).astype("int64")
    f = pa.table({
        "fact_id": pa.array(np.arange(n_facts), pa.int64()),
        "ts": pa.array([None if with_nulls and i % 37 == 0 else int(v)
                        for i, v in enumerate(ts)], pa.int64()),
    })
    lo = rng.integers(-5_000, 95_000, n_iv).astype("int64")
    width = rng.integers(-200, 8_000, n_iv).astype("int64")  # some hi<=lo
    iv = pa.table({
        "iv_id": pa.array(np.arange(n_iv) + 1000, pa.int64()),
        "lo": pa.array([None if with_nulls and i % 23 == 0 else int(v)
                        for i, v in enumerate(lo)], pa.int64()),
        "hi": pa.array([None if with_nulls and i % 29 == 0
                        else int(lo[i] + width[i])
                        for i in range(n_iv)], pa.int64()),
    })
    return f, iv


def _want(f, iv):
    con = duckdb.connect()
    con.register("f", f)
    con.register("iv", iv)
    return con.execute("""
        SELECT fact_id, iv_id FROM f JOIN iv
        ON f.ts >= iv.lo AND f.ts < iv.hi
        ORDER BY fact_id, iv_id
    """).fetch_arrow_table()


def _got(f, iv, parts, bucket_width, n_parts_data=4):
    ds_f = ray.data.from_arrow(f).repartition(n_parts_data)
    ds_i = ray.data.from_arrow(iv).repartition(3)
    out = bucketed_interval_join(
        ds_f, ds_i, ts_col="ts", fact_cols=["fact_id"],
        interval_cols=["iv_id"], bucket_width_s=bucket_width,
        num_partitions=parts, max_replication=4096)
    t = pa.concat_tables(
        [b for b in ray.get(
            __import__("featurebox_ray.stages.partition",
                       fromlist=["materialized_block_refs"])
            .materialized_block_refs(out)) if b.num_rows],
        promote_options="default") if out.count() else None
    if t is None:
        return pa.table({"fact_id": pa.array([], pa.int64()),
                         "iv_id": pa.array([], pa.int64())})
    return t.sort_by([("fact_id", "ascending"), ("iv_id", "ascending")])


def test_bucketed_interval_duckdb_fuzz():
    rng = np.random.default_rng(5)
    f, iv = _mk(rng)
    want = _want(f, iv)
    for parts, width in ((1, 1_000), (5, 1_000), (5, 7_777), (9, 50_000)):
        got = _got(f, iv, parts, width)
        assert got.equals(want), (parts, width, got.num_rows,
                                  want.num_rows)


def test_bucketed_interval_wide_and_narrow_buckets():
    # bucket narrower than every interval -> heavy replication, and
    # bucket wider than the whole domain -> single bucket; same answer
    rng = np.random.default_rng(8)
    f, iv = _mk(rng, n_facts=120, n_iv=30, with_nulls=False)
    want = _want(f, iv)
    assert _got(f, iv, 4, 100).equals(want)        # ~80 buckets/interval
    assert _got(f, iv, 4, 10_000_000).equals(want)  # one bucket total


def test_bucketed_interval_replication_guard():
    f = pa.table({"fact_id": pa.array([1], pa.int64()),
                  "ts": pa.array([5], pa.int64())})
    iv = pa.table({"iv_id": pa.array([1], pa.int64()),
                   "lo": pa.array([0], pa.int64()),
                   "hi": pa.array([10_000_000], pa.int64())})
    # the task exchange materializes eagerly, so the guard fires at
    # plan-construction time
    with pytest.raises(Exception, match="max_replication"):
        bucketed_interval_join(
            ray.data.from_arrow(f), ray.data.from_arrow(iv),
            ts_col="ts", fact_cols=["fact_id"], interval_cols=["iv_id"],
            bucket_width_s=10, num_partitions=2,
            max_replication=8).count()


def test_bucketed_interval_timestamp_units_and_overlap_error():
    # timestamp columns: bucket_width_s in seconds, bounds in us
    base = 1_700_000_000_000_000
    f = pa.table({
        "fact_id": pa.array([1, 2, 3], pa.int64()),
        "ts": pa.array([base + 30_000_000, base + 90_000_000,
                        base + 200_000_000], pa.timestamp("us")),
    })
    iv = pa.table({
        "iv_id": pa.array([7], pa.int64()),
        "lo": pa.array([base], pa.timestamp("us")),
        "hi": pa.array([base + 100_000_000], pa.timestamp("us")),
    })
    got = _got_ts = bucketed_interval_join(
        ray.data.from_arrow(f), ray.data.from_arrow(iv), ts_col="ts",
        fact_cols=["fact_id"], interval_cols=["iv_id"],
        bucket_width_s=60, num_partitions=2).to_pandas()
    assert sorted(got["fact_id"]) == [1, 2]
    with pytest.raises(ValueError, match="overlap"):
        bucketed_interval_join(
            ray.data.from_arrow(f), ray.data.from_arrow(iv), ts_col="ts",
            fact_cols=["fact_id"], interval_cols=["fact_id"],
            num_partitions=2)


def test_bucketed_interval_ns_unit_scaling_and_mismatch():
    # review fix: bucket width scales by the ts column's native unit;
    # mismatched bound units raise instead of silently misaligning
    base = 1_700_000_000_000_000_000  # ns
    f = pa.table({
        "fact_id": pa.array([1, 2], pa.int64()),
        "ts": pa.array([base + 60_000_000_000,        # +1 min
                        base + 600_000_000_000],      # +10 min
                       pa.timestamp("ns")),
    })
    iv = pa.table({
        "iv_id": pa.array([7], pa.int64()),
        "lo": pa.array([base], pa.timestamp("ns")),
        "hi": pa.array([base + 240_000_000_000], pa.timestamp("ns")),
    })
    got = bucketed_interval_join(
        ray.data.from_arrow(f), ray.data.from_arrow(iv), ts_col="ts",
        fact_cols=["fact_id"], interval_cols=["iv_id"],
        bucket_width_s=900, num_partitions=2,
        max_replication=4).to_pandas()  # 4-min interval, 15-min buckets
    assert got["fact_id"].tolist() == [1]
    iv_us = pa.table({
        "iv_id": pa.array([7], pa.int64()),
        "lo": pa.array([base // 1000], pa.timestamp("us")),
        "hi": pa.array([(base + 240_000_000_000) // 1000],
                       pa.timestamp("us")),
    })
    with pytest.raises(ValueError, match="unit"):
        bucketed_interval_join(
            ray.data.from_arrow(f), ray.data.from_arrow(iv_us),
            ts_col="ts", fact_cols=["fact_id"], interval_cols=["iv_id"],
            num_partitions=2)
