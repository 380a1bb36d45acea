"""Bucketed layout + shuffle-free join (stages/bucketed.py) vs a
DuckDB join; layout invariants; incompatible-spec rejection."""

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray

from featurebox_ray.stages.bucketed import (bucketed_join,
                                            write_bucketed)


def _mk(tmp_path):
    rng = np.random.default_rng(279)
    n = 1500
    left = pd.DataFrame({
        "k": rng.integers(0, 300, n),
        "v": rng.integers(-50, 50, n),
    })
    left.loc[rng.choice(n, 10, replace=False), "k"] = pd.NA
    left["k"] = left.k.astype("Int64")
    right = pd.DataFrame({
        "rk": np.arange(0, 280, dtype=np.int64),  # some keys missing
        "w": rng.integers(0, 9, 280),
    })
    lds = ray.data.from_arrow(
        pa.Table.from_pandas(left, preserve_index=False))
    rds = ray.data.from_arrow(
        pa.Table.from_pandas(right, preserve_index=False))
    lp, rp = str(tmp_path / "left"), str(tmp_path / "right")
    write_bucketed(lds.repartition(5), lp, key="k", num_buckets=6)
    write_bucketed(rds, rp, key="rk", num_buckets=6)
    return left, right, lp, rp


def test_bucketed_join_matches_duckdb(tmp_path):
    left, right, lp, rp = _mk(tmp_path)
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    exp = con.sql("""
        SELECT k, v, w FROM l JOIN r ON l.k = r.rk
        ORDER BY k, v, w
    """).df().reset_index(drop=True)
    got = (bucketed_join(lp, rp, left_cols=["k", "v"],
                         right_cols=["w"])
           .to_pandas().sort_values(["k", "v", "w"])
           .reset_index(drop=True))
    pd.testing.assert_frame_equal(got.astype(exp.dtypes.to_dict()),
                                  exp)
    # every bucket dir holds only rows whose key hashes there
    from featurebox_ray.stages.sample import knuth_hash
    import pyarrow.parquet as pq

    for b in range(6):
        d = f"{lp}/bucket={b}"
        if not os.path.isdir(d):
            continue
        for fn in os.listdir(d):
            ks = pq.read_table(f"{d}/{fn}")["k"].to_numpy(
                zero_copy_only=False)
            assert (knuth_hash(ks.astype(np.int64)) % 6 == b).all()


def test_bucketed_join_rejects_mismatched_layouts(tmp_path):
    left, right, lp, rp = _mk(tmp_path)
    rp2 = str(tmp_path / "right2")
    rds = ray.data.read_parquet(f"{rp}/bucket=0")
    write_bucketed(rds, rp2, key="rk", num_buckets=7)
    with pytest.raises(ValueError, match="incompatible"):
        bucketed_join(lp, rp2, left_cols=["k", "v"],
                      right_cols=["w"])


def test_bucketed_join_rejects_clashing_nonkey_columns(tmp_path):
    left, right, lp, rp = _mk(tmp_path)
    # right's payload renamed to collide with left's non-key column
    rp3 = str(tmp_path / "right3")
    rds = ray.data.read_parquet(f"{rp}/bucket=0") \
        .map_batches(lambda b: b.rename_columns(
            ["v" if c == "w" else c for c in b.column_names]),
            batch_format="pyarrow")
    write_bucketed(rds, rp3, key="rk", num_buckets=6)
    with pytest.raises(ValueError, match="both sides"):
        bucketed_join(lp, rp3, left_cols=["k", "v"],
                      right_cols=["v"])
