"""CDC changelog compaction (stages/cdc.py)."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest
import ray

from featurebox_ray.stages.cdc import cdc_compact


def _fixture(rng, n_base=120, n_log=400):
    base = pa.table({
        "key": pa.array(np.arange(n_base), pa.int64()),
        "name": pa.array([f"name-{i}" if i % 11 else None
                          for i in range(n_base)], pa.string()),
        "cents": pa.array(rng.integers(0, 10_000, n_base), pa.int64()),
    })
    # log keys cover updates (< n_base), inserts (>= n_base), repeats
    keys = rng.integers(0, n_base + 40, n_log)
    log = pa.table({
        "key": pa.array(keys, pa.int64()),
        "t": pa.array(rng.integers(0, 50, n_log), pa.int64()),
        "seq": pa.array(np.arange(n_log), pa.int64()),
        "cents": pa.array(rng.integers(0, 10_000, n_log), pa.int64()),
        "is_del": pa.array(rng.random(n_log) < 0.25),
    })
    return base, log


def _oracle(base, log):
    con = duckdb.connect()
    con.register("b", base)
    con.register("l", log)
    return con.execute("""
        WITH last AS (
          SELECT key, cents, is_del FROM (
            SELECT *, row_number() OVER (
              PARTITION BY key ORDER BY t DESC, seq DESC) AS rn
            FROM l) WHERE rn = 1)
        SELECT coalesce(b.key, last.key) AS key, b.name AS name,
               CASE WHEN last.key IS NOT NULL THEN last.cents
                    ELSE b.cents END AS cents,
               CASE WHEN last.key IS NULL THEN 'keep'
                    WHEN b.key IS NULL THEN 'insert'
                    ELSE 'update' END AS op
        FROM b FULL JOIN last ON b.key = last.key
        WHERE NOT (last.key IS NOT NULL AND last.is_del)
        ORDER BY key
    """).fetch_arrow_table()


def test_cdc_compact_duckdb_fuzz():
    rng = np.random.default_rng(7)
    base, log = _fixture(rng)
    want = _oracle(base, log).to_pandas()
    for pb, pl, parts in ((1, 1, 2), (3, 5, 7), (6, 2, 4)):
        got = (cdc_compact(
            ray.data.from_arrow(base).repartition(pb),
            ray.data.from_arrow(log).repartition(pl),
            key_col="key", order_cols=["t", "seq"], value_col="cents",
            delete_col="is_del", payload_cols=["name"],
            num_partitions=parts)
            .to_pandas().sort_values("key").reset_index(drop=True))
        assert list(got.columns) == ["key", "name", "cents", "op"]
        assert got["key"].tolist() == want["key"].tolist()
        assert got["cents"].tolist() == want["cents"].tolist()
        assert got["op"].tolist() == want["op"].tolist()
        assert (got["name"].isna() == want["name"].isna()).all()
        assert (got["name"].dropna() ==
                want["name"].dropna()).all()


def test_cdc_semantics_small():
    base = pa.table({"key": pa.array([1, 2, 3], pa.int64()),
                     "cents": pa.array([10, 20, 30], pa.int64())})
    log = pa.table({
        # key 1: upsert then delete -> dropped
        # key 2: delete then upsert -> survives with 99
        # key 4: insert; key 5: insert then delete -> dropped
        "key": pa.array([1, 1, 2, 2, 4, 5, 5], pa.int64()),
        "t": pa.array([0, 1, 0, 1, 0, 0, 1], pa.int64()),
        "seq": pa.array([0, 1, 2, 3, 4, 5, 6], pa.int64()),
        "cents": pa.array([77, 0, 0, 99, 44, 55, 0], pa.int64()),
        "is_del": pa.array([False, True, True, False, False,
                            False, True]),
    })
    got = (cdc_compact(ray.data.from_arrow(base),
                       ray.data.from_arrow(log),
                       key_col="key", order_cols=["t", "seq"],
                       value_col="cents", delete_col="is_del",
                       num_partitions=3)
           .to_pandas().sort_values("key").reset_index(drop=True))
    assert got["key"].tolist() == [2, 3, 4]
    assert got["cents"].tolist() == [99, 30, 44]
    assert got["op"].tolist() == ["update", "keep", "insert"]


def test_cdc_empty_log_and_dup_base():
    base = pa.table({"key": pa.array([1, 2], pa.int64()),
                     "cents": pa.array([10, 20], pa.int64())})
    empty_log = pa.table({"key": pa.array([], pa.int64()),
                          "t": pa.array([], pa.int64()),
                          "seq": pa.array([], pa.int64()),
                          "cents": pa.array([], pa.int64()),
                          "is_del": pa.array([], pa.bool_())})
    got = (cdc_compact(ray.data.from_arrow(base),
                       ray.data.from_arrow(empty_log),
                       key_col="key", order_cols=["t", "seq"],
                       value_col="cents", delete_col="is_del",
                       num_partitions=2)
           .to_pandas().sort_values("key").reset_index(drop=True))
    assert got["op"].tolist() == ["keep", "keep"]
    assert got["cents"].tolist() == [10, 20]

    dup = pa.table({"key": pa.array([1, 1], pa.int64()),
                    "cents": pa.array([10, 11], pa.int64())})
    with pytest.raises(Exception, match="unique"):
        cdc_compact(ray.data.from_arrow(dup),
                    ray.data.from_arrow(empty_log),
                    key_col="key", order_cols=["t", "seq"],
                    value_col="cents", delete_col="is_del",
                    num_partitions=2).to_pandas()


def test_cdc_compact_duplicate_base_raises():
    base = pa.table({"key": pa.array([1, 1], pa.int64()),
                     "cents": pa.array([1, 2], pa.int64())})
    log = pa.table({"key": pa.array([1], pa.int64()),
                    "t": pa.array([1], pa.int64()),
                    "seq": pa.array([1], pa.int64()),
                    "cents": pa.array([9], pa.int64()),
                    "is_delete": pa.array([False])})
    with pytest.raises(Exception, match="duplicate key"):
        (cdc_compact(ray.data.from_arrow(base),
                     ray.data.from_arrow(log), key_col="key",
                     order_cols=["t", "seq"], value_col="cents",
                     delete_col="is_delete").to_pandas())
