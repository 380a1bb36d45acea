"""salted_join (stages/join.py) — skew-adaptive routing must never
change the answer: DuckDB plain-join parity under heavy skew, both
routing regimes, key-type cast, and the broadcast cap guard."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray

from featurebox_ray.stages.join import salted_join

def _data():
    rng = np.random.default_rng(7)
    n = 20000
    keys = rng.integers(0, 200, n).astype(np.int64)
    keys[: n * 2 // 5] = 5                 # one mega-key: 40% of rows
    kw = keys.astype(object)
    kw[::977] = None
    left = pa.table({"k": pa.array(list(kw), pa.int64()),
                     "v": pa.array(rng.integers(0, 1000, n))})
    rk = np.arange(0, 180, dtype=np.int64)
    right = pa.table({"rk": pa.array(rk),
                      "name": pa.array([f"n{p}" for p in rk])})
    con = duckdb.connect()
    con.register("l", left.to_pandas())
    con.register("r", right.to_pandas())
    exp = (con.sql("SELECT l.k, l.v, r.name FROM l JOIN r "
                   "ON l.k = r.rk").df()
           .sort_values(["k", "v", "name"]).reset_index(drop=True))
    return left, right, exp


def _norm(df):
    return (df.sort_values(["k", "v", "name"])
            .reset_index(drop=True)[["k", "v", "name"]]
            .astype({"k": "int64", "v": "int64"}))


def test_salted_join_matches_duckdb_hot_and_cold():
    left, right, exp = _data()
    got = salted_join(ray.data.from_arrow(left).repartition(8),
                      ray.data.from_arrow(right).repartition(3),
                      on="k", right_on="rk", hot_threshold=500,
                      num_partitions=6).to_pandas()
    pd.testing.assert_frame_equal(_norm(got), _norm(exp))


def test_salted_join_cold_only_path_identical():
    left, right, exp = _data()
    got = salted_join(ray.data.from_arrow(left).repartition(8),
                      ray.data.from_arrow(right),
                      on="k", right_on="rk", hot_threshold=10 ** 9,
                      num_partitions=6).to_pandas()
    pd.testing.assert_frame_equal(_norm(got), _norm(exp))


def test_salted_join_hot_right_cap_guard():
    left, right, _ = _data()
    with pytest.raises(ValueError, match="max_hot_right_rows"):
        salted_join(ray.data.from_arrow(left),
                    ray.data.from_arrow(right),
                    on="k", right_on="rk", hot_threshold=10,
                    max_hot_right_rows=3).to_pandas()


def test_salted_join_narrow_right_key_type():
    """Right key of a narrower int type must join on the hot path too
    (the cast hash_join's tag_right always did)."""
    left = pa.table({"k": pa.array([1, 1, 1, 1, 2], pa.int64()),
                     "v": pa.array([10, 11, 12, 13, 20], pa.int64())})
    right = pa.table({"rk": pa.array([1, 2], pa.int32()),
                      "name": pa.array(["a", "b"])})
    got = salted_join(ray.data.from_arrow(left),
                      ray.data.from_arrow(right),
                      on="k", right_on="rk", hot_threshold=3,
                      num_partitions=2).to_pandas()
    assert sorted(got["v"].tolist()) == [10, 11, 12, 13, 20]
    assert set(got[got["k"] == 1]["name"]) == {"a"}


