"""Schema-evolution reader (sources/io.py:read_evolved) — null-fill,
safe promotion, extra-column drop, unsafe-cast strict/skip modes."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray

from featurebox_ray.sources.io import read_evolved

TARGET = pa.schema([
    ("id", pa.int64()), ("x", pa.int64()), ("s", pa.string()),
    ("v", pa.float64())])


def _write_generations(d):
    os.makedirs(d)
    # gen 1: x stored int32, no v, extra column 'junk'
    pq.write_table(pa.table({
        "id": pa.array([1, 2], pa.int64()),
        "x": pa.array([10, 20], pa.int32()),
        "s": pa.array(["a", "b"]),
        "junk": pa.array([9, 9], pa.int64()),
    }), f"{d}/g1.parquet")
    # gen 2: full schema
    pq.write_table(pa.table({
        "id": pa.array([3], pa.int64()),
        "x": pa.array([30], pa.int64()),
        "s": pa.array(["c"]),
        "v": pa.array([1.5], pa.float64()),
    }), f"{d}/g2.parquet")


def test_union_by_name_promote_and_fill(tmp_path):
    d = str(tmp_path / "t")
    _write_generations(d)
    got = (read_evolved(d, schema=TARGET).to_pandas()
           .sort_values("id").reset_index(drop=True))
    exp = pd.DataFrame({
        "id": [1, 2, 3], "x": [10, 20, 30], "s": ["a", "b", "c"],
        "v": [np.nan, np.nan, 1.5]})
    pd.testing.assert_frame_equal(got, exp.astype(got.dtypes.to_dict()))
    assert "junk" not in got.columns
    # fixed single schema across the union
    assert got.x.dtype == np.int64


def test_unsafe_cast_strict_raises_lenient_skips(tmp_path):
    d = str(tmp_path / "t2")
    os.makedirs(d)
    pq.write_table(pa.table({
        "id": pa.array([1], pa.int64()),
        "x": pa.array(["not-an-int"]),   # string -> int64 unsafe
        "s": pa.array(["a"]), "v": pa.array([0.5], pa.float64()),
    }), f"{d}/bad.parquet")
    pq.write_table(pa.table({
        "id": pa.array([2], pa.int64()),
        "x": pa.array([5], pa.int64()),
        "s": pa.array(["b"]), "v": pa.array([2.5], pa.float64()),
    }), f"{d}/good.parquet")
    with pytest.raises(ValueError, match="unsafe cast"):
        read_evolved(d, schema=TARGET)
    got = read_evolved(d, schema=TARGET, strict=False).to_pandas()
    assert got.id.tolist() == [2]


def test_uint64_to_int64_is_unsafe(tmp_path):
    d = str(tmp_path / "t3")
    os.makedirs(d)
    pq.write_table(pa.table({
        "id": pa.array([1], pa.int64()),
        "x": pa.array([np.uint64(2**63 + 5)], pa.uint64()),
        "s": pa.array(["a"]), "v": pa.array([0.5], pa.float64()),
    }), f"{d}/u.parquet")
    with pytest.raises(ValueError, match="unsafe cast"):
        read_evolved(d, schema=TARGET)
