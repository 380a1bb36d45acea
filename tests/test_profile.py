"""Dataset profiler (stages/profile.py)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from featurebox_ray.stages.profile import profile_columns


def _ds(df, parts):
    return ray.data.from_arrow(pa.Table.from_pandas(
        df, preserve_index=False)).repartition(parts)


def test_profile_matches_duckdb_fuzz():
    import duckdb

    rng = np.random.default_rng(131)
    n = 2500
    df = pd.DataFrame({
        "i": pd.array(rng.choice([1, 2, 3, 500, None], size=n),
                      dtype="Int64"),
        "s": rng.choice(["aa", "b", "cc", "zz"], size=n),
        "f": rng.choice([1.5, -2.25, 7.0, 0.125], size=n),
    })
    for parts, nparts in ((2, 3), (9, 5)):
        got = (profile_columns(_ds(df, parts), cols=["i", "s", "f"],
                               num_partitions=nparts)
               .to_pandas().sort_values("col").reset_index(drop=True))
        con = duckdb.connect()
        want = con.execute(r"""
            SELECT 'f' AS col, count(*) AS n_rows,
                   count(*) - count(f) AS n_nulls,
                   count(DISTINCT f) AS n_distinct,
                   min(regexp_replace(CAST(f AS VARCHAR), '\.0$', ''))
                       AS min_val,
                   max(regexp_replace(CAST(f AS VARCHAR), '\.0$', ''))
                       AS max_val
            FROM df
            UNION ALL
            SELECT 'i', count(*), count(*) - count(i),
                   count(DISTINCT i), min(CAST(i AS VARCHAR)),
                   max(CAST(i AS VARCHAR))
            FROM df
            UNION ALL
            SELECT 's', count(*), count(*) - count(s),
                   count(DISTINCT s), min(s), max(s)
            FROM df
            ORDER BY col
        """).df()
        con.close()
        for c in ["col", "min_val", "max_val"]:
            assert got[c].tolist() == want[c].tolist(), (c, parts)
        for c in ["n_rows", "n_nulls", "n_distinct"]:
            assert (got[c].to_numpy(np.int64)
                    == want[c].to_numpy(np.int64)).all(), (c, parts)


def test_profile_all_null_column():
    df = pd.DataFrame({"x": pd.array([None, None], dtype="Int64"),
                       "y": [1.0, 2.0]})
    got = (profile_columns(_ds(df, 2), cols=["x"], num_partitions=2)
           .to_pandas().iloc[0])
    assert (got["n_rows"], got["n_nulls"], got["n_distinct"]) == (2, 2, 0)
    assert got["min_val"] is None and got["max_val"] is None


def test_group_norm_features_matches_duckdb():
    import duckdb

    from featurebox_ray.stages.normalize import add_group_norm_features

    rng = np.random.default_rng(139)
    n = 1200
    df = pd.DataFrame({
        "id": np.arange(n, dtype=np.int64),
        "k": pd.array(rng.choice([1, 2, 3, None], size=n),
                      dtype="Int64"),
        "v": pd.array(rng.integers(-100, 5000, size=n), dtype="Int64"),
    })
    # null values and a single-row group
    df.loc[:4, "v"] = None
    df = pd.concat([df, pd.DataFrame(
        {"id": [n], "k": pd.array([77], dtype="Int64"),
         "v": pd.array([42], dtype="Int64")})], ignore_index=True)
    got = (add_group_norm_features(_ds(df, 5), key_col="k",
                                   int_value_col="v",
                                   num_partitions=3)
           .to_pandas().sort_values("id").reset_index(drop=True))
    con = duckdb.connect()
    want = con.execute("""
        WITH g AS (
          SELECT k, CAST(count(v) AS BIGINT) n,
                 CAST(sum(v) AS BIGINT) s,
                 CAST(sum(v*v) AS BIGINT) s2
          FROM df GROUP BY k
        )
        SELECT df.id,
               CAST(df.v AS DOUBLE) / CAST(g.s AS DOUBLE) AS share,
               CASE WHEN g.n > 1 THEN
                 (CAST(df.v AS DOUBLE)
                    - CAST(g.s AS DOUBLE) / CAST(g.n AS DOUBLE))
                 / sqrt((CAST(g.s2 AS DOUBLE)
                           - CAST(g.s AS DOUBLE) * CAST(g.s AS DOUBLE)
                             / CAST(g.n AS DOUBLE))
                        / (CAST(g.n AS DOUBLE) - 1.0))
               END AS zscore
        FROM df JOIN g ON df.k IS NOT DISTINCT FROM g.k
        ORDER BY df.id
    """).df()
    con.close()
    for c in ("share", "zscore"):
        a = got[c].to_numpy(np.float64)
        b = want[c].to_numpy(np.float64)
        assert ((a == b) | (np.isnan(a) & np.isnan(b))).all(), c
    # single-row group: share 1.0, z NULL
    last = got.iloc[-1]
    assert last["share"] == 1.0 and pd.isna(last["zscore"])


def test_robust_zscore_matches_duckdb():
    import duckdb

    from featurebox_ray.stages.normalize import add_robust_zscore

    rng = np.random.default_rng(13)
    n = 500
    t = pa.table({
        "k": pa.array([None if rng.random() < 0.05
                       else int(rng.integers(0, 8))
                       for _ in range(n)], pa.int64()),
        "id": pa.array(np.arange(n), pa.int64()),
        "v": pa.array([None if rng.random() < 0.1
                       else float(rng.normal() * 10)
                       for _ in range(n)], pa.float64()),
    })
    want = duckdb.sql("""
        WITH g AS (
          SELECT k, quantile_disc(v, CAST(0.5 AS DOUBLE)) AS med
          FROM t GROUP BY k
        ), d AS (
          SELECT t.id, t.k, t.v, g.med, abs(t.v - g.med) AS adev
          FROM t JOIN g ON t.k IS NOT DISTINCT FROM g.k
        ), g2 AS (
          SELECT k, quantile_disc(adev, CAST(0.5 AS DOUBLE)) AS mad
          FROM d GROUP BY k
        )
        SELECT d.id, CASE WHEN d.v IS NULL OR g2.mad IS NULL
                               OR g2.mad = 0 THEN NULL
                          ELSE (d.v - d.med) / g2.mad END AS z
        FROM d JOIN g2 ON d.k IS NOT DISTINCT FROM g2.k
        ORDER BY d.id
    """).fetchdf()

    for parts in (1, 4):
        ds = ray.data.from_arrow(t)
        if parts > 1:
            ds = ds.repartition(parts)
        got = (add_robust_zscore(ds, key_col="k", value_col="v",
                                 out_col="z", num_partitions=3)
               .to_pandas().sort_values("id").reset_index(drop=True))
        assert np.array_equal(got["z"].to_numpy(np.float64),
                              want["z"].to_numpy(np.float64),
                              equal_nan=True)


def test_robust_zscore_mad_zero_group():
    from featurebox_ray.stages.normalize import add_robust_zscore
    # >half identical values -> MAD 0 -> NULL scores
    t = pa.table({"k": pa.array(["a"] * 5),
                  "id": pa.array(range(5), pa.int64()),
                  "v": pa.array([3.0, 3.0, 3.0, 5.0, 9.0])})
    got = add_robust_zscore(ray.data.from_arrow(t), key_col="k",
                            value_col="v", out_col="z",
                            num_partitions=2).to_pandas()
    assert got["z"].isna().all()


def test_group_count_distinct_duckdb_fuzz():
    import duckdb

    from featurebox_ray.stages.profile import group_count_distinct

    rng = np.random.default_rng(23)
    n = 600
    t = pa.table({
        "g1": pa.array([None if i % 37 == 0 else f"t{v}" for i, v in
                        enumerate(rng.integers(0, 4, n))], pa.string()),
        "g2": pa.array([None if i % 41 == 0 else int(v) for i, v in
                        enumerate(rng.integers(0, 5, n))], pa.int64()),
        "v": pa.array([None if i % 13 == 0 else int(x) for i, x in
                       enumerate(rng.integers(0, 30, n))], pa.int64()),
    })
    con = duckdb.connect()
    con.register("t", t)
    want = con.execute("""
        SELECT g1, g2, count(DISTINCT v) AS n_distinct
        FROM t GROUP BY g1, g2 ORDER BY g1 NULLS FIRST, g2 NULLS FIRST
    """).fetch_arrow_table()
    for parts, np_ in ((1, 2), (5, 3), (9, 7)):
        got = (group_count_distinct(
            ray.data.from_arrow(t).repartition(parts),
            group_cols=["g1", "g2"], value_col="v",
            num_partitions=np_).to_pandas()
            .sort_values(["g1", "g2"], na_position="first")
            .reset_index(drop=True))
        assert len(got) == want.num_rows
        assert got["n_distinct"].tolist() == (
            want["n_distinct"].to_pylist()), (parts, np_)
