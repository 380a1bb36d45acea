"""add_split_column (stages/sample.py) + pattern_redact (stages/redact.py)."""

import re

import numpy as np
import pyarrow as pa
import ray

from featurebox_ray.stages.redact import pattern_redact
from featurebox_ray.stages.sample import (MOD, add_split_column, knuth_hash,
                                          sample_threshold)

SF = "/root/testdata/sf0.001"


def test_split_column_matches_python_and_is_key_consistent():
    ds = ray.data.read_parquet(f"{SF}/events.parquet",
                               columns=["event_id", "user_id"])
    out = add_split_column(ds, key_col="user_id",
                           splits=[("train", 0.8), ("val", 0.1),
                                   ("test", None)]).to_pandas()
    t1 = sample_threshold(0.8)
    t2 = sample_threshold(0.8 + 0.1)
    h = knuth_hash(out["user_id"].to_numpy().astype(np.int64))
    want = np.where(h < t1, "train", np.where(h < t2, "val", "test"))
    assert (out["split"].to_numpy() == want).all()
    # leakage safety: one split per user
    per_user = out.groupby("user_id")["split"].nunique()
    assert (per_user == 1).all()
    # every split non-empty at this scale
    assert set(out["split"].unique()) == {"train", "val", "test"}


def test_split_column_null_keys_and_bad_fractions():
    tbl = pa.table({"k": pa.array([1, None, 2], pa.int64())})
    out = add_split_column(ray.data.from_arrow(tbl), key_col="k",
                           splits=[("a", 0.5), ("b", None)]).to_pandas()
    assert out["split"].isna().tolist() == [False, True, False]
    import pytest
    with pytest.raises(ValueError, match="sum"):
        add_split_column(ray.data.from_arrow(tbl), key_col="k",
                         splits=[("a", 0.5), ("b", 0.1)])


def test_split_column_null_batch_does_not_corrupt_large_ids():
    # regression: a null in the batch used to route keys through float64,
    # rounding ids > 2^53 and flipping their split
    big = (1 << 60) + 1
    with_null = pa.table({"k": pa.array([big, None, 7], pa.int64())})
    without = pa.table({"k": pa.array([big, 7], pa.int64())})
    kw = dict(key_col="k", splits=[("a", 0.5), ("b", None)])
    # collect as rows, NOT to_pandas: int64-with-null pandas round-trip
    # would itself corrupt the big id (the known Dataset.to_pandas trap)
    rows_n = add_split_column(ray.data.from_arrow(with_null),
                              **kw).take_all()
    rows = add_split_column(ray.data.from_arrow(without), **kw).take_all()
    by_k_n = {r["k"]: r["split"] for r in rows_n if r["k"] is not None}
    by_k = {r["k"]: r["split"] for r in rows}
    assert by_k_n == by_k
    h = knuth_hash(np.array([big], np.int64))[0]
    assert by_k[big] == ("a" if h < sample_threshold(0.5) else "b")


def test_split_column_rejects_oversum_and_misplaced_none():
    import pytest
    tbl = pa.table({"k": pa.array([1], pa.int64())})
    with pytest.raises(ValueError, match="!= 1"):
        add_split_column(ray.data.from_arrow(tbl), key_col="k",
                         splits=[("a", 0.8), ("b", 0.4)])
    with pytest.raises(ValueError, match="LAST"):
        add_split_column(ray.data.from_arrow(tbl), key_col="k",
                         splits=[("a", None), ("b", 0.4)])


def test_pattern_redact_matches_re():
    pat = r"\b(spark|hash)\b"
    tbl = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["spark and hash and sparkle",
                          "no matches here", "hash hash hash"]),
    })
    out = pattern_redact(ray.data.from_arrow(tbl), pattern=pat,
                         replacement="[X]").to_pandas()
    for _, row in out.iterrows():
        src = tbl.filter(
            pa.array(np.array(tbl["doc_id"]) == row.doc_id)
        )["text"][0].as_py()
        assert row.text == re.sub(pat, "[X]", src)
        assert row.n_redactions == len(re.findall(pat, src))
    assert out["n_redactions"].tolist() == [2, 0, 3]
    assert out.loc[0, "text"] == "[X] and [X] and sparkle"


def test_hash_join_full_outer_both_null_sides():
    from featurebox_ray.stages.join import hash_join
    left = pa.table({"k": pa.array([1, 2], pa.int64()),
                     "lv": pa.array([10, 20], pa.int64())})
    right = pa.table({"rk": pa.array([2, 3], pa.int64()),
                      "rv": pa.array(["b", "c"])})
    out = hash_join(ray.data.from_arrow(left), ray.data.from_arrow(right),
                    on="k", right_on="rk", how="full",
                    num_partitions=2).to_pandas()
    rows = {int(r.k): (None if r.lv != r.lv else int(r.lv), r.rv)
            for r in out.itertuples()}
    assert rows == {1: (10, None), 2: (20, "b"), 3: (None, "c")}
