"""Skew report surface (stages/partition.py:key_histogram) — hot-key
ordering, tie-break, top-k boundary."""

import numpy as np
import pyarrow as pa
import ray

from featurebox_ray.stages.partition import key_histogram


def test_key_histogram_orders_and_breaks_ties():
    # key 7 planted hot; keys 1 and 2 tie -> lower key first
    ks = [7] * 50 + [1] * 10 + [2] * 10 + [3] * 5
    t = pa.table({"k": pa.array(ks, pa.int64())})
    got = key_histogram(ray.data.from_arrow(t).repartition(4),
                        "k", top=3)
    assert got["k"].tolist() == [7, 1, 2]
    assert got["count()"].tolist() == [50, 10, 10]


def test_key_histogram_top_larger_than_keys():
    t = pa.table({"k": pa.array([1, 1, 2], pa.int64())})
    got = key_histogram(ray.data.from_arrow(t), "k", top=10)
    assert len(got) == 2
