"""cdc_compact (stages/cdc.py — CDC changelog compaction).  This file
exists partly as a clobber guard: q184 was the only consumer, so an
accidental module overwrite (it happened — a content-defined-chunking
module briefly replaced this one) passed the whole unit suite."""

import numpy as np
import pyarrow as pa
import pytest
import ray

from featurebox_ray.stages.cdc import cdc_compact


def test_cdc_compact_semantics():
    base = pa.table({
        "k": pa.array([1, 2, 3], pa.int64()),
        "name": pa.array(["a", "b", "c"]),
        "v": pa.array([10, 20, 30], pa.int64()),
    })
    log = pa.table({
        "k": pa.array([2, 2, 4, 3, 5, 5], pa.int64()),
        "seq": pa.array([1, 2, 1, 1, 1, 2], pa.int64()),
        "v": pa.array([21, 22, 40, 0, 50, 0], pa.int64()),
        "is_del": pa.array([False, False, False, True, False, True]),
    })
    out = (cdc_compact(ray.data.from_arrow(base),
                       ray.data.from_arrow(log), key_col="k",
                       order_cols=["seq"], value_col="v",
                       delete_col="is_del", payload_cols=["name"],
                       num_partitions=3)
           .to_pandas().sort_values("k").reset_index(drop=True))
    # k=1 keep, k=2 last upsert 22, k=3 deleted, k=4 insert,
    # k=5 upsert-then-delete drops
    assert out["k"].tolist() == [1, 2, 4]
    assert out["v"].tolist() == [10, 22, 40]
    assert out["op"].tolist() == ["keep", "update", "insert"]
    assert out["name"].tolist() == ["a", "b", None]


def test_cdc_compact_duplicate_base_raises():
    base = pa.table({"k": pa.array([1, 1], pa.int64()),
                     "v": pa.array([1, 2], pa.int64())})
    log = pa.table({"k": pa.array([1], pa.int64()),
                    "seq": pa.array([1], pa.int64()),
                    "v": pa.array([9], pa.int64()),
                    "is_del": pa.array([False])})
    with pytest.raises(Exception, match="duplicate k"):
        (cdc_compact(ray.data.from_arrow(base),
                     ray.data.from_arrow(log), key_col="k",
                     order_cols=["seq"], value_col="v",
                     delete_col="is_del").to_pandas())
