"""Consecutive edit-distance churn profile
(stages/editdist.py:consecutive_editdist) vs a DuckDB levenshtein
replay; hand-checked pairs; flag threshold; partition invariance."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from featurebox_ray.stages.editdist import consecutive_editdist

ORACLE = """
    WITH d AS (
      SELECT k, rid, txt, CAST(strlen(txt) AS BIGINT) AS bl
      FROM docs
      WHERE k IS NOT NULL AND txt IS NOT NULL AND rid IS NOT NULL
        AND strlen(txt) = length(txt) AND strlen(txt) <= {ml}),
    p AS (SELECT k, rid AS id_a, lead(rid) OVER w AS id_b,
                 txt AS ta, lead(txt) OVER w AS tb,
                 bl AS len_a, lead(bl) OVER w AS len_b
          FROM d WINDOW w AS (PARTITION BY k ORDER BY rid))
    SELECT k, id_a, id_b,
           CAST(levenshtein(ta, tb) AS BIGINT) AS lev, len_a, len_b
    FROM p WHERE id_b IS NOT NULL
    ORDER BY k, id_a
"""


def _rand_text(rng) -> str:
    words = ["key", "agg", "row", "scan", "slow", "fast", "tbl", "v"]
    n = int(rng.integers(0, 12))
    return " ".join(rng.choice(words) for _ in range(n))


def test_consecutive_editdist_duckdb_fuzz_partition_invariant():
    rng = np.random.default_rng(431)
    n = 600
    ks = [None if rng.random() < 0.03 else int(rng.integers(0, 10))
          for _ in range(n)]
    txts = []
    for i in range(n):
        r = rng.random()
        if r < 0.03:
            txts.append(None)
        elif r < 0.06:
            txts.append("café " + _rand_text(rng))  # non-ASCII
        elif r < 0.09:
            txts.append("")
        elif r < 0.2 and txts and txts[-1]:
            txts.append(txts[-1] + " x")  # near-dup of predecessor
        else:
            txts.append(_rand_text(rng))
    pdf = pd.DataFrame({"k": pd.array(ks, dtype="Int64"),
                        "rid": np.arange(n), "txt": txts})
    con = duckdb.connect()
    con.register("docs", pdf)
    exp = con.sql(ORACLE.format(ml=4096)).df().reset_index(drop=True)
    t = pa.table({"k": pa.array(ks, pa.int64()),
                  "rid": pa.array(np.arange(n), pa.int64()),
                  "txt": pa.array(txts, pa.string())})
    prev = None
    for parts in (1, 7):
        ds = ray.data.from_arrow(t)
        if parts > 1:
            ds = ds.repartition(parts)
        got = (consecutive_editdist(ds, key_col="k", order_col="rid",
                                    text_col="txt", num_partitions=4)
               .to_pandas().sort_values(["k", "id_a"])
               .reset_index(drop=True))
        pd.testing.assert_frame_equal(
            got.astype(exp.dtypes.to_dict()), exp, check_exact=True)
        if prev is not None:
            assert got.equals(prev)
        prev = got


def test_consecutive_editdist_hand_checked():
    t = pa.table({
        "k": pa.array(["a", "a", "a", "b", "b"], pa.string()),
        "rid": pa.array([1, 2, 3, 1, 2], pa.int64()),
        "txt": pa.array(["kitten", "sitting", "sitting!",
                         "abc", "xyz"], pa.string()),
    })
    got = (consecutive_editdist(ray.data.from_arrow(t), key_col="k",
                                order_col="rid", text_col="txt")
           .to_pandas().sort_values(["k", "id_a"])
           .reset_index(drop=True))
    assert got["lev"].tolist() == [3, 1, 3]
    assert got["id_a"].tolist() == [1, 2, 1]
    assert got["len_a"].tolist() == [6, 7, 3]


def test_consecutive_editdist_flag_threshold():
    # ratio_den=4: flag pairs with 4*lev <= max(len); "sitting" vs
    # "sitting!" (lev 1, max len 8) passes; "abc" vs "xyz" (lev 3) no
    t = pa.table({
        "k": pa.array(["a", "a", "b", "b"], pa.string()),
        "rid": pa.array([1, 2, 1, 2], pa.int64()),
        "txt": pa.array(["sitting", "sitting!", "abc", "xyz"],
                        pa.string()),
    })
    got = (consecutive_editdist(ray.data.from_arrow(t), key_col="k",
                                order_col="rid", text_col="txt",
                                ratio_den=4)
           .to_pandas())
    assert got["k"].tolist() == ["a"]
    assert got["lev"].tolist() == [1]


def test_consecutive_editdist_excludes_long_and_non_ascii():
    # the long row is removed BEFORE pairing: 1-3 become consecutive
    t = pa.table({
        "k": pa.array(["a", "a", "a"], pa.string()),
        "rid": pa.array([1, 2, 3], pa.int64()),
        "txt": pa.array(["short", "x" * 50, "shore"], pa.string()),
    })
    got = (consecutive_editdist(ray.data.from_arrow(t), key_col="k",
                                order_col="rid", text_col="txt",
                                max_len=20)
           .to_pandas())
    assert got["id_a"].tolist() == [1]
    assert got["id_b"].tolist() == [3]
    assert got["lev"].tolist() == [1]
