"""Bloom semi/anti join (stages/bloom.py) and window-rank family
(stages/rank.py) vs pandas/numpy serial oracles."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray

from featurebox_ray.stages.bloom import (bloom_anti_join, bloom_maybe_mask,
                                         bloom_semi_join, build_bloom)
from featurebox_ray.stages.rank import rank_in_group

# ---------------------------------------------------------------- bloom ---


def _tables(seed=3, n_left=800, with_null=True):
    rng = np.random.default_rng(seed)
    lk = rng.integers(0, 300, size=n_left).astype(np.int64)
    left = pd.DataFrame({
        "k": lk,
        "payload": rng.normal(size=n_left),
        "tag": rng.choice(["x", "y", "z"], size=n_left),
    })
    if with_null:
        left.loc[left.index[:5], "k"] = None
        left["k"] = left["k"].astype("Int64")
    right = pd.DataFrame({"rk": np.unique(
        rng.integers(0, 300, size=120)).astype(np.int64)})
    return left, right


def _ds(df, nparts=5):
    return ray.data.from_arrow(
        pa.Table.from_pandas(df, preserve_index=False)).repartition(nparts)


@pytest.mark.parametrize("num_bits", [64, 1 << 14])
def test_semi_and_anti_match_pandas(num_bits):
    # num_bits=64 forces heavy false positives: the verify exchange must
    # remove every one of them (result identical to the roomy filter)
    left, right = _tables()
    keys = set(right["rk"].tolist())
    in_r = left["k"].map(lambda v: v in keys if pd.notna(v) else False)
    want_semi = left[in_r]
    want_anti = left[~in_r]  # NULL keys never match => kept by anti

    got_semi = bloom_semi_join(_ds(left), _ds(right, 3), on="k",
                               right_on="rk", num_bits=num_bits,
                               num_partitions=4).to_pandas()
    got_anti = bloom_anti_join(_ds(left), _ds(right, 3), on="k",
                               right_on="rk", num_bits=num_bits,
                               num_partitions=4).to_pandas()

    def norm(df):
        df = df.copy()
        df["k"] = df["k"].astype("float64")  # nulls -> NaN for sorting
        return (df.sort_values(["k", "payload"], na_position="last")
                .reset_index(drop=True))

    pd.testing.assert_frame_equal(norm(got_semi), norm(want_semi),
                                  check_dtype=False)
    pd.testing.assert_frame_equal(norm(got_anti), norm(want_anti),
                                  check_dtype=False)
    assert len(got_semi) + len(got_anti) == len(left)


def test_bloom_no_false_negatives_and_partition_invariance():
    left, right = _tables(seed=11, with_null=False)
    ref = build_bloom(_ds(right, 4), key_col="rk", num_bits=1 << 12)
    bitmap = ray.get(ref)
    mask = bloom_maybe_mask(bitmap, right["rk"].to_numpy(),
                            num_bits=1 << 12, num_hashes=4)
    assert mask.all()  # every inserted key must probe positive

    a = bloom_semi_join(_ds(left, 2), _ds(right, 2), on="k", right_on="rk",
                        num_partitions=2).to_pandas()
    b = bloom_semi_join(_ds(left, 7), _ds(right, 5), on="k", right_on="rk",
                        num_partitions=9).to_pandas()
    key = ["k", "payload", "tag"]
    pd.testing.assert_frame_equal(
        a.sort_values(key).reset_index(drop=True),
        b.sort_values(key).reset_index(drop=True))


def test_empty_right_side():
    left, right = _tables(seed=5, with_null=False)
    empty = right.iloc[:0]
    semi = bloom_semi_join(_ds(left), _ds(empty, 1), on="k",
                           right_on="rk").to_pandas()
    anti = bloom_anti_join(_ds(left), _ds(empty, 1), on="k",
                           right_on="rk").to_pandas()
    assert len(semi) == 0
    assert len(anti) == len(left)


def test_negative_keys_raise():
    left = pd.DataFrame({"k": np.array([-1, 2], np.int64)})
    right = pd.DataFrame({"k": np.array([2], np.int64)})
    with pytest.raises(Exception, match="non-negative"):
        bloom_semi_join(_ds(left, 1), _ds(right, 1), on="k").to_pandas()


# ----------------------------------------------------------------- rank ---


def _rank_oracle(df, g, v):
    out = df.sort_values([g, v, "id"]).reset_index(drop=True)
    grp = out.groupby(g, sort=False)
    out["row_number"] = grp.cumcount() + 1
    out["rank"] = grp[v].rank(method="min").astype(np.int64)
    out["dense_rank"] = grp[v].rank(method="dense").astype(np.int64)
    n = grp[v].transform("size").to_numpy()
    mx = grp[v].rank(method="max").to_numpy()
    out["cume_dist"] = mx / n
    out["percent_rank"] = np.where(
        n > 1, (out["rank"].to_numpy() - 1) / np.maximum(n - 1, 1), 0.0)
    return out


def test_rank_family_matches_pandas():
    rng = np.random.default_rng(9)
    df = pd.DataFrame({
        "g": rng.integers(0, 12, size=400).astype(np.int64),
        "v": rng.integers(0, 8, size=400).astype(np.float64),  # many ties
        "id": np.arange(400, dtype=np.int64),
    })
    got = rank_in_group(_ds(df, 6), group_col="g", value_col="v",
                        tie_col="id", num_partitions=5).to_pandas()
    want = _rank_oracle(df, "g", "v")
    got = got.sort_values(["g", "v", "id"]).reset_index(drop=True)
    for c in ["row_number", "rank", "dense_rank"]:
        np.testing.assert_array_equal(got[c].to_numpy(), want[c].to_numpy(),
                                      err_msg=c)
    for c in ["percent_rank", "cume_dist"]:
        np.testing.assert_array_equal(got[c].to_numpy(), want[c].to_numpy(),
                                      err_msg=c)  # bit-exact: one division


def test_rank_single_row_groups_and_nan():
    df = pd.DataFrame({
        "g": np.array([1, 2, 2, 2], np.int64),
        "v": np.array([7.0, np.nan, np.nan, 1.0]),
        "id": np.arange(4, dtype=np.int64),
    })
    got = (rank_in_group(_ds(df, 2), group_col="g", value_col="v",
                         tie_col="id", num_partitions=2)
           .to_pandas().sort_values(["g", "id"]).reset_index(drop=True))
    one = got[got.g == 1].iloc[0]
    assert one["row_number"] == 1 and one["rank"] == 1
    assert one["percent_rank"] == 0.0 and one["cume_dist"] == 1.0
    # NaNs sort last and are peers of each other
    two = got[got.g == 2].sort_values("v", na_position="last")
    nan_rows = got[(got.g == 2) & got.v.isna()]
    assert set(nan_rows["rank"]) == {2}
    assert set(nan_rows["dense_rank"]) == {2}
    assert got[(got.g == 2) & (got.v == 1.0)]["rank"].iloc[0] == 1
    assert len(two) == 3


def test_ntile_matches_duckdb():
    import duckdb

    rng = np.random.default_rng(31)
    df = pd.DataFrame({
        "g": rng.integers(0, 9, size=300).astype(np.int64),
        "v": rng.normal(size=300),
        "id": np.arange(300, dtype=np.int64),
    })
    got = (rank_in_group(_ds(df, 4), group_col="g", value_col="v",
                         tie_col="id", num_partitions=3, ntile=4)
           .to_pandas().sort_values("id").reset_index(drop=True))
    con = duckdb.connect()
    con.register("t", df)
    want = con.execute("""
        SELECT id, ntile(4) OVER (PARTITION BY g ORDER BY v, id) AS nt
        FROM t ORDER BY id
    """).df()
    np.testing.assert_array_equal(got["ntile"].to_numpy(),
                                  want["nt"].to_numpy())
    # tiny groups (n < tiles): each row its own bucket, in order
    small = pd.DataFrame({"g": np.zeros(2, np.int64),
                          "v": np.array([3.0, 1.0]),
                          "id": np.arange(2, dtype=np.int64)})
    got2 = (rank_in_group(_ds(small, 1), group_col="g", value_col="v",
                          tie_col="id", num_partitions=1, ntile=5)
            .to_pandas().sort_values("v").reset_index(drop=True))
    assert list(got2["ntile"]) == [1, 2]


def test_first_last_value_matches_duckdb():
    import duckdb

    rng = np.random.default_rng(37)
    df = pd.DataFrame({
        "g": rng.integers(0, 6, size=200).astype(np.int64),
        "v": rng.integers(0, 5, size=200).astype(np.float64),  # ties
        "id": np.arange(200, dtype=np.int64),
        "pay": rng.normal(size=200),
    })
    got = (rank_in_group(_ds(df, 3), group_col="g", value_col="v",
                         tie_col="id", num_partitions=3,
                         payload_cols=("pay",))
           .to_pandas().sort_values("id").reset_index(drop=True))
    con = duckdb.connect()
    con.register("t", df)
    want = con.execute("""
        SELECT id,
               first_value(pay) OVER w AS f,
               last_value(pay) OVER w AS l
        FROM t WINDOW w AS (PARTITION BY g ORDER BY v) ORDER BY id
    """).df()
    np.testing.assert_array_equal(got["first_pay"].to_numpy(),
                                  want["f"].to_numpy())
    np.testing.assert_array_equal(got["last_pay"].to_numpy(),
                                  want["l"].to_numpy())


def test_pivot_agg_matches_pandas():
    from featurebox_ray.stages.pivot import distinct_categories, pivot_agg

    rng = np.random.default_rng(43)
    df = pd.DataFrame({
        "g": rng.integers(0, 20, size=600).astype(np.int64),
        "c": rng.choice(["a", "b", "c", "d"], size=600),
        "w": rng.integers(1, 9, size=600).astype(np.int64),
    })
    ds = _ds(df, 5)
    cats = distinct_categories(ds, cat_col="c")
    assert cats == ["a", "b", "c", "d"]
    got = pivot_agg(ds, group_col="g", cat_col="c", categories=cats,
                    value_col="w", num_partitions=4).to_pandas()
    want = df.pivot_table(index="g", columns="c", values="w",
                          aggfunc="sum", fill_value=0)
    got = got.sort_values("g").reset_index(drop=True)
    for cat in cats:
        np.testing.assert_array_equal(
            got[f"n_{cat}"].to_numpy(),
            want[cat].reindex(got["g"]).to_numpy(), err_msg=cat)
    np.testing.assert_array_equal(
        got["n_total"].to_numpy(),
        df.groupby("g")["w"].sum().reindex(got["g"]).to_numpy())
    # unknown category rows count toward n_total only
    got2 = pivot_agg(ds, group_col="g", cat_col="c",
                     categories=["a", "b"], num_partitions=2).to_pandas()
    assert (got2["n_total"].sum() == 600
            and got2["n_a"].sum() == (df.c == "a").sum())


def test_rank_null_and_nan_are_distinct_peers():
    import duckdb

    df = pd.DataFrame({
        "g": np.ones(5, np.int64),
        "v": [1.0, np.nan, None, np.nan, None],
        "id": np.arange(5, dtype=np.int64),
    })
    got = (rank_in_group(_ds(df, 2), group_col="g", value_col="v",
                         tie_col="id", num_partitions=1)
           .to_pandas().sort_values("id").reset_index(drop=True))
    con = duckdb.connect()
    con.register("t", df)
    want = con.execute("""
        SELECT id, rank() OVER (PARTITION BY g ORDER BY v) AS r,
               dense_rank() OVER (PARTITION BY g ORDER BY v) AS d
        FROM t ORDER BY id
    """).df()
    np.testing.assert_array_equal(got["rank"].to_numpy(),
                                  want["r"].to_numpy())
    np.testing.assert_array_equal(got["dense_rank"].to_numpy(),
                                  want["d"].to_numpy())


def _collect_arrow(ds) -> pa.Table:
    """Collect a Dataset as ONE Arrow table — Dataset.to_pandas would
    coerce int64-with-null columns to float64 and corrupt ids > 2^53
    (the exact hazard these tests assert the ENGINE avoids)."""
    from featurebox_ray.stages.partition import materialized_block_refs

    blocks = [b for b in ray.get(materialized_block_refs(ds))
              if b.num_rows > 0]
    return pa.concat_tables(blocks, promote_options="default")


def test_pivot_large_int_keys_null_group_and_guards():
    from featurebox_ray.stages.pivot import pivot_agg

    big = (1 << 53) + 1
    df = pd.DataFrame({
        "g": pd.array([big, big + 2, None, big], dtype="Int64"),
        "c": ["a", "a", "b", "b"],
        "w": pd.array([5, 7, 11, None], dtype="Int64"),
    })
    t = _collect_arrow(pivot_agg(_ds(df, 2), group_col="g", cat_col="c",
                                 categories=["a", "b"], value_col="w",
                                 num_partitions=2))
    rows = {(r["g"]): r for r in t.to_pylist()}
    # ids above 2^53 survive exactly (no pandas float64 round-trip)
    assert set(k for k in rows if k is not None) == {big, big + 2}
    r = rows[big]
    assert r["n_a"] == 5 and r["n_b"] == 0 and r["n_total"] == 5  # NULL w -> 0
    assert rows[None]["n_b"] == 11
    with pytest.raises(ValueError, match="collide"):
        pivot_agg(_ds(df, 1), group_col="g", cat_col="c",
                  categories=["a", "total"])


def test_rollup_null_and_large_int_keys():
    from featurebox_ray.stages.rollup import rollup_counts

    big = (1 << 53) + 1
    df = pd.DataFrame({
        "a": pd.array([big, big, None, big + 2], dtype="Int64"),
        "b": ["x", "y", "x", None],
        "m": np.array([1, 2, 4, 8], np.int64),
    })
    t = _collect_arrow(rollup_counts(_ds(df, 2), g1="a", g2="b",
                                     int_sum_cols=["m"],
                                     num_partitions=2))
    rows = t.to_pylist()
    grand = [r for r in rows if r["lvl"] == 3]
    assert len(grand) == 1 and grand[0]["sum_m"] == 15
    mid_big = [r for r in rows if r["lvl"] == 1 and r["a"] == big]
    assert mid_big[0]["sum_m"] == 3 and mid_big[0]["n_rows"] == 2
    mid_null = [r for r in rows if r["lvl"] == 1 and r["a"] is None]
    assert mid_null[0]["sum_m"] == 4
    fine_nb = [r for r in rows if r["lvl"] == 0 and r["a"] == big + 2]
    assert fine_nb[0]["b"] is None and fine_nb[0]["sum_m"] == 8
    assert set(r["a"] for r in rows if r["a"] is not None) == {big, big + 2}


def test_rank_family_duckdb_fuzz():
    """Random groups/values with heavy ties, NaNs AND NULLs mixed, across
    several partition counts — every rank column must match DuckDB
    bit-for-bit (percent_rank/cume_dist included: one division each)."""
    import duckdb

    rng = np.random.default_rng(61)
    con = duckdb.connect()
    for trial in range(3):
        n = int(rng.integers(50, 400))
        v = rng.integers(0, 6, size=n).astype(np.float64)
        v[rng.random(n) < 0.1] = np.nan          # REAL NaN values
        null_mask = rng.random(n) < 0.1          # distinct NULLs
        # Arrow on BOTH sides: a pandas Float64 column would coerce NaN
        # to NA and silently void the NaN coverage
        t = pa.table({
            "g": pa.array(rng.integers(0, 7, size=n).astype(np.int64)),
            "v": pa.array(v, pa.float64(), mask=null_mask),
            "id": pa.array(np.arange(n, dtype=np.int64)),
        })
        assert pa.compute.sum(pa.compute.is_nan(
            t["v"].drop_null())).as_py() > 0  # NaNs actually present
        ds = ray.data.from_arrow(t).repartition(int(rng.integers(1, 6)))
        got = (rank_in_group(ds, group_col="g", value_col="v",
                             tie_col="id",
                             num_partitions=int(rng.integers(1, 8)))
               .to_pandas().sort_values("id").reset_index(drop=True))
        con.execute("drop view if exists t")
        con.register("t", t)
        want = con.execute("""
            SELECT id,
                   row_number() OVER (PARTITION BY g
                                      ORDER BY v, id) AS rn,
                   rank() OVER w AS r, dense_rank() OVER w AS d,
                   percent_rank() OVER w AS pr, cume_dist() OVER w AS cd
            FROM t WINDOW w AS (PARTITION BY g ORDER BY v) ORDER BY id
        """).df()
        for eng, sql in [("row_number", "rn"), ("rank", "r"),
                         ("dense_rank", "d"), ("percent_rank", "pr"),
                         ("cume_dist", "cd")]:
            np.testing.assert_array_equal(
                got[eng].to_numpy(), want[sql].to_numpy(),
                err_msg=f"trial {trial} col {eng}")


def test_group_mode_matches_duckdb_fuzz():
    import duckdb

    from featurebox_ray.stages.pivot import group_mode

    rng = np.random.default_rng(113)
    n = 3000
    pdf = pd.DataFrame({
        "g": pd.array(rng.choice([1, 2, 3, 7, None], size=n),
                      dtype="Int64"),
        "v": rng.choice(["a", "bb", "c", "dd", None], size=n),
    })
    # a group whose values are all NULL must still emit one row
    pdf = pd.concat([pdf, pd.DataFrame(
        {"g": pd.array([99, 99], dtype="Int64"), "v": [None, None]})],
        ignore_index=True)
    got = (group_mode(_ds(pdf, 5), group_col="g", value_col="v",
                      num_partitions=3).to_pandas()
           .sort_values("g", na_position="last").reset_index(drop=True))
    con = duckdb.connect()
    want = con.execute("""
        WITH gset AS (SELECT DISTINCT g FROM pdf),
        c AS (
          SELECT g, v, count(*) AS cnt FROM pdf
          WHERE v IS NOT NULL GROUP BY g, v
        ), r AS (
          SELECT g, v, cnt,
                 row_number() OVER (PARTITION BY g
                                    ORDER BY cnt DESC, v) AS rn
          FROM c
        ), w AS (SELECT g, v, cnt FROM r WHERE rn = 1)
        SELECT gset.g, w.v AS mode_value, coalesce(w.cnt, 0) AS mode_cnt
        FROM gset LEFT JOIN w ON gset.g IS NOT DISTINCT FROM w.g
        ORDER BY gset.g NULLS LAST
    """).df()
    con.close()
    assert len(got) == len(want)
    assert (got["mode_value"].fillna("~").tolist()
            == want["mode_value"].fillna("~").tolist())
    assert (got["mode_cnt"].to_numpy(np.int64)
            == want["mode_cnt"].to_numpy(np.int64)).all()
    assert (got["g"].fillna(-1).to_numpy(np.int64)
            == want["g"].fillna(-1).to_numpy(np.int64)).all()
    # partition invariance
    again = (group_mode(_ds(pdf, 11), group_col="g", value_col="v",
                        num_partitions=7).to_pandas()
             .sort_values("g", na_position="last")
             .reset_index(drop=True))
    assert got.equals(again)


def test_group_topk_values_matches_duckdb():
    import duckdb

    from featurebox_ray.stages.pivot import group_topk_values

    rng = np.random.default_rng(149)
    n = 2500
    pdf = pd.DataFrame({
        "g": pd.array(rng.choice([1, 2, 3, None], size=n), dtype="Int64"),
        "v": rng.choice(["a", "bb", "c", "dd", "e", None], size=n),
    })
    for parts, nparts in ((4, 3), (9, 7)):
        got = (group_topk_values(_ds(pdf, parts), group_col="g",
                                 value_col="v", k=3,
                                 num_partitions=nparts)
               .to_pandas()
               .sort_values(["g", "rn"], na_position="last")
               .reset_index(drop=True))
        con = duckdb.connect()
        want = con.execute("""
            WITH c AS (SELECT g, v, count(*) AS cnt FROM pdf
                       WHERE v IS NOT NULL GROUP BY g, v)
            SELECT g, v, cnt,
                   row_number() OVER (PARTITION BY g
                                      ORDER BY cnt DESC, v) AS rn
            FROM c QUALIFY rn <= 3
            ORDER BY g NULLS LAST, rn
        """).df()
        con.close()
        assert len(got) == len(want)
        assert got["v"].tolist() == want["v"].tolist()
        for c in ("cnt", "rn"):
            assert (got[c].to_numpy(np.int64)
                    == want[c].to_numpy(np.int64)).all()

    import pytest

    with pytest.raises(ValueError, match="positive"):
        group_topk_values(_ds(pdf, 2), group_col="g", value_col="v",
                          k=0)


def test_group_concat_matches_duckdb():
    import duckdb

    from featurebox_ray.stages.pivot import group_concat

    rng = np.random.default_rng(151)
    n = 800
    pdf = pd.DataFrame({
        "id": np.arange(n, dtype=np.int64),
        "g": pd.array(rng.choice([1, 2, None], size=n), dtype="Int64"),
        "v": rng.choice(["a", "b", "c", None], size=n),
        "o": rng.permutation(n).astype(np.int64),
    })
    # one all-null-value group
    pdf = pd.concat([pdf, pd.DataFrame(
        {"id": [n, n + 1], "g": pd.array([9, 9], dtype="Int64"),
         "v": [None, None], "o": [0, 1]})], ignore_index=True)
    got = (group_concat(_ds(pdf, 5), group_col="g", value_col="v",
                        order_cols=["o", "id"], sep="|",
                        num_partitions=3)
           .to_pandas().sort_values("g", na_position="last")
           .reset_index(drop=True))
    con = duckdb.connect()
    want = con.execute("""
        SELECT g, string_agg(v, '|' ORDER BY o, id) AS concat
        FROM pdf GROUP BY g ORDER BY g NULLS LAST
    """).df()
    con.close()
    assert len(got) == len(want)
    assert (got["concat"].fillna("~").tolist()
            == want["concat"].fillna("~").tolist())
    assert got.set_index("g").loc[9, "concat"] is None \
        or pd.isna(got.set_index("g").loc[9, "concat"])


# -------------------------------------------------------------- unpivot ----

def test_unpivot_matches_pandas_melt():
    import pandas as pd

    from featurebox_ray.stages.pivot import unpivot
    t = pa.table({
        "id": pa.array([1, 2, 3], pa.int64()),
        "a": pa.array([1.5, None, 3.0]),
        "b": pa.array([10, 20, 30], pa.int64()),
    })
    got = (unpivot(ray.data.from_arrow(t).repartition(2),
                   id_cols=["id"], value_cols=["a", "b"])
           .to_pandas().sort_values(["id", "variable"])
           .reset_index(drop=True))
    want = (t.to_pandas().melt(id_vars=["id"], value_vars=["a", "b"])
            .astype({"value": "float64"})
            .sort_values(["id", "variable"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want)


def test_unpivot_empty_value_cols_raises():
    from featurebox_ray.stages.pivot import unpivot
    ds = ray.data.from_arrow(pa.table({"id": [1]}))
    with pytest.raises(ValueError):
        unpivot(ds, id_cols=["id"], value_cols=[])
