"""Range-partitioned layout (stages/bucketed.py:
write_range_partitioned / read_range) — pruning correctness, boundary
semantics, out-of-range refusal."""

import os

import numpy as np
import pyarrow as pa
import pytest
import ray

from featurebox_ray.stages.bucketed import (read_range,
                                            write_range_partitioned)


def _layout(tmp_path, vals):
    t = pa.table({"k": pa.array(vals, pa.int64()),
                  "v": pa.array(range(len(vals)), pa.int64())})
    p = str(tmp_path / "lay")
    write_range_partitioned(ray.data.from_arrow(t).repartition(3),
                            p, key="k", cuts=[0, 10, 20, 30, 40])
    return p, t


def test_range_read_matches_filter_and_prunes(tmp_path):
    rng = np.random.default_rng(291)
    vals = rng.integers(0, 40, 500).tolist() + [None] * 5
    p, t = _layout(tmp_path, vals)
    got = (read_range(p, lo=12, hi=33, columns=["k", "v"])
           .to_pandas().sort_values(["k", "v"])
           .reset_index(drop=True))
    pdf = t.to_pandas().dropna()
    exp = (pdf[(pdf.k >= 12) & (pdf.k < 33)]
           .sort_values(["k", "v"]).reset_index(drop=True)
           .astype({"k": "int64", "v": "int64"}))
    assert got.equals(exp)
    # partition dirs exist for every non-empty range
    assert sorted(d for d in os.listdir(p) if d.startswith("part=")) \
        == ["part=0", "part=1", "part=2", "part=3"]
    # an empty intersection returns an empty dataset, not an error
    assert read_range(p, lo=40, hi=50).count() == 0
    # boundary: lo inclusive, hi exclusive
    one = read_range(p, lo=10, hi=11, columns=["k"]).to_pandas()
    assert (one.k == 10).all()


def test_range_write_refuses_out_of_range(tmp_path):
    t = pa.table({"k": pa.array([99], pa.int64())})
    with pytest.raises(Exception):
        write_range_partitioned(ray.data.from_arrow(t),
                                str(tmp_path / "bad"), key="k",
                                cuts=[0, 10])


def test_range_write_refuses_bad_cuts(tmp_path):
    t = pa.table({"k": pa.array([1], pa.int64())})
    with pytest.raises(ValueError, match="ascending"):
        write_range_partitioned(ray.data.from_arrow(t),
                                str(tmp_path / "bad2"), key="k",
                                cuts=[10, 0])
