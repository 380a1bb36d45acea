"""salted_join (stages/join.py) — skew-adaptive routing must never
change the answer: DuckDB plain-join parity under heavy skew, at two
thresholds (hot+cold mixed vs cold-only), with NULL keys, plus the
hot-right broadcast cap guard."""

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


def test_rolling_extrema_duckdb_fuzz_partitions():
    """rolling_extrema vs the DuckDB ROWS window at 2 partitionings,
    with NULL keys/values and a NaN planted (all must drop)."""
    from featurebox_ray.stages.window import rolling_extrema

    rng = np.random.default_rng(305)
    n = 3000
    t = pa.table({
        "k": pa.array([int(x) if x % 11 else None
                       for x in rng.integers(0, 40, n)], pa.int64()),
        "ts": pa.array(rng.integers(0, 10 ** 6, n), pa.int64()),
        "sq": pa.array(np.arange(n, dtype=np.int64)),
        "v": pa.array([None if x % 13 == 0 else
                       (float("nan") if x % 17 == 0 else float(x))
                       for x in rng.integers(0, 500, n)],
                      pa.float64()),
    })
    con = duckdb.connect()
    con.register("t", t.to_pandas())
    exp = con.sql("""
        SELECT k, sq, CAST(count(*) OVER w AS BIGINT) AS w,
               min(v) OVER w AS vmin, max(v) OVER w AS vmax
        FROM t
        WHERE k IS NOT NULL AND ts IS NOT NULL AND sq IS NOT NULL
          AND v IS NOT NULL AND isfinite(v)
        WINDOW w AS (PARTITION BY k ORDER BY ts, sq
                     ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
    """).df().sort_values(["k", "sq"]).reset_index(drop=True)
    prev = None
    for parts in (1, 6):
        ds = ray.data.from_arrow(t)
        if parts > 1:
            ds = ds.repartition(parts)
        got = (rolling_extrema(ds, key_col="k", ts_col="ts",
                               seq_col="sq", value_col="v", k=4,
                               num_partitions=parts)
               .to_pandas().sort_values(["k", "sq"])
               .reset_index(drop=True))
        pd.testing.assert_frame_equal(
            got.astype(exp.dtypes.to_dict()), exp)
        if prev is not None:
            assert got.equals(prev)
        prev = got


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


def test_read_with_provenance_multifile_rowgroups(tmp_path):
    """Multi-file, multi-row-group layout vs DuckDB's
    filename/file_row_number — the stamps must agree exactly, and
    column pruning must still return the provenance columns."""
    import os

    import pyarrow.parquet as pq

    from featurebox_ray.sources.io import read_with_provenance

    d = str(tmp_path / "frags")
    os.makedirs(d)
    rng = np.random.default_rng(306)
    n = 0
    for i in range(3):
        rows = int(rng.integers(50, 120))
        t = pa.table({
            "id": pa.array(np.arange(n, n + rows, dtype=np.int64)),
            "x": pa.array(rng.integers(0, 9, rows)),
        })
        # small row groups -> several tasks per file
        pq.write_table(t, f"{d}/part-{i}.parquet", row_group_size=37)
        n += rows
    got = (read_with_provenance(d, columns=["id"])
           .to_pandas().sort_values("id").reset_index(drop=True))
    con = duckdb.connect()
    exp = con.sql(f"""
        SELECT id, regexp_extract(filename, '[^/]+$') AS _file,
               CAST(file_row_number AS BIGINT) AS _row
        FROM read_parquet('{d}/*.parquet', filename=true,
                          file_row_number=true)
        ORDER BY id
    """).df().reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["id", "_file", "_row"]].astype({"id": "int64",
                                             "_row": "int64"}), exp)


def test_impute_group_median_duckdb_fuzz():
    """impute_group_median vs DuckDB at 2 partitionings: NULL group
    keys, all-NULL groups, NaN passthrough (excluded from the median,
    never filled)."""
    from featurebox_ray.stages.quantile import impute_group_median

    rng = np.random.default_rng(307)
    n = 2000
    g = [None if x % 19 == 0 else f"g{x % 7}"
         for x in rng.integers(0, 400, n)]
    v = [None if x % 5 == 0 else
         (float("nan") if x % 11 == 0 else float(x))
         for x in rng.integers(0, 300, n)]
    # group g6: force all-NULL so it has no median
    v = [None if (gg == "g6") else vv for gg, vv in zip(g, v)]
    t = pa.table({"id": pa.array(np.arange(n, dtype=np.int64)),
                  "g": pa.array(g, pa.string()),
                  "v": pa.array(v, pa.float64())})
    con = duckdb.connect()
    # register the ARROW table: a pandas round-trip collapses NULL and
    # NaN into one value and the oracle would fill planted NaNs
    con.register("t", t)
    exp = con.sql("""
        WITH m AS (
          SELECT g, quantile_disc(v, CAST(0.5 AS DOUBLE)) AS med
          FROM t WHERE g IS NOT NULL AND v IS NOT NULL
            AND isfinite(v)
          GROUP BY g)
        SELECT t.id, t.g,
               CASE WHEN t.v IS NULL THEN m.med ELSE t.v END
                 AS value_filled,
               CAST(t.v IS NULL AND m.med IS NOT NULL AS BIGINT)
                 AS was_imputed
        FROM t LEFT JOIN m ON t.g = m.g
        ORDER BY id
    """).df().reset_index(drop=True)
    prev = None
    for parts in (1, 6):
        ds = ray.data.from_arrow(t)
        if parts > 1:
            ds = ds.repartition(parts)
        got = (impute_group_median(ds, group_col="g", value_col="v",
                                   id_col="id", num_partitions=parts)
               .to_pandas().sort_values("id").reset_index(drop=True))
        pd.testing.assert_frame_equal(
            got.astype(exp.dtypes.to_dict()), exp)
        if prev is not None:
            assert got.equals(prev)
        prev = got


def test_dialogue_profile_duckdb_fuzz():
    """dialogue_profile vs the SQL islands replay at 2 partitionings,
    with NULLs in every column and single-event keys."""
    from featurebox_ray.stages.transitions import dialogue_profile

    rng = np.random.default_rng(308)
    n = 2500
    t = pa.table({
        "k": pa.array([None if x % 23 == 0 else int(x % 60)
                       for x in rng.integers(0, 10 ** 6, n)],
                      pa.int64()),
        "ts": pa.array(rng.integers(0, 10 ** 5, n), pa.int64()),
        "o": pa.array(np.arange(n, dtype=np.int64)),
        "ty": pa.array([None if x % 29 == 0 else f"t{x % 5}"
                        for x in rng.integers(0, 10 ** 6, n)],
                       pa.string()),
    })
    con = duckdb.connect()
    con.register("t", t)
    exp = con.sql("""
        WITH e AS (
          SELECT k, ty, ts, o FROM t
          WHERE k IS NOT NULL AND ty IS NOT NULL
            AND ts IS NOT NULL AND o IS NOT NULL),
        r AS (
          SELECT k, ty,
                 row_number() OVER (PARTITION BY k ORDER BY ts, o)
               - row_number() OVER (PARTITION BY k, ty
                                    ORDER BY ts, o) AS isl
          FROM e),
        runs AS (SELECT k, count(*) AS run_len
                 FROM r GROUP BY k, ty, isl),
        a1 AS (SELECT k, CAST(count(*) AS BIGINT) AS n_runs,
                      CAST(max(run_len) AS BIGINT) AS max_run
               FROM runs GROUP BY k),
        a2 AS (SELECT k, CAST(count(*) AS BIGINT) AS n_turns,
                      CAST(count(DISTINCT ty) AS BIGINT) AS n_types
               FROM e GROUP BY k)
        SELECT a2.k, n_turns, n_runs, max_run, n_types
        FROM a2 JOIN a1 USING (k) ORDER BY k
    """).df().reset_index(drop=True)
    prev = None
    for parts in (1, 6):
        ds = ray.data.from_arrow(t)
        if parts > 1:
            ds = ds.repartition(parts)
        got = (dialogue_profile(ds, key_col="k", ts_col="ts",
                                order_col="o", type_col="ty",
                                num_partitions=parts)
               .to_pandas().sort_values("k").reset_index(drop=True))
        pd.testing.assert_frame_equal(
            got.astype(exp.dtypes.to_dict()), exp)
        if prev is not None:
            assert got.equals(prev)
        prev = got


def test_delta_contributors_duckdb_fuzz():
    """delta_contributors vs the SQL midpoint-cut replay at 2
    partitionings, with NULL ts/dim/value rows; also the
    zero-total-delta edge (all shares NULL)."""
    from featurebox_ray.stages.diff import delta_contributors

    rng = np.random.default_rng(309)
    n = 3000
    t = pa.table({
        "ts": pa.array([None if x % 31 == 0 else int(x)
                        for x in rng.integers(1, 10 ** 6, n)],
                       pa.int64()),
        "d": pa.array([None if x % 17 == 0 else f"d{x % 6}"
                       for x in rng.integers(0, 10 ** 6, n)],
                      pa.string()),
        "v": pa.array([None if x % 13 == 0 else float(x) / 4
                       for x in rng.integers(-200, 200, n)],
                      pa.float64()),
    })
    con = duckdb.connect()
    con.register("t", t)
    exp = con.sql("""
        WITH e AS (
          SELECT ts AS t, d,
                 CAST(round(coalesce(v, 0) * 100) AS BIGINT) AS c
          FROM t WHERE ts IS NOT NULL AND d IS NOT NULL),
        s AS (SELECT min(t) + (max(t) - min(t)) * 1 // 2 AS cut
              FROM e),
        g AS (SELECT d,
                     CAST(coalesce(sum(CASE WHEN t <= s.cut THEN c
                                        END), 0) AS BIGINT)
                       AS cents_before,
                     CAST(coalesce(sum(CASE WHEN t > s.cut THEN c
                                        END), 0) AS BIGINT)
                       AS cents_after
              FROM e, s GROUP BY d),
        tot AS (SELECT sum(cents_after - cents_before) AS td FROM g)
        SELECT d, cents_before, cents_after,
               cents_after - cents_before AS delta,
               CASE WHEN tot.td = 0 THEN NULL
                    ELSE CAST(cents_after - cents_before AS DOUBLE)
                         / CAST(tot.td AS DOUBLE) END AS share
        FROM g, tot ORDER BY d
    """).df().reset_index(drop=True)
    prev = None
    for parts in (1, 6):
        ds = ray.data.from_arrow(t)
        if parts > 1:
            ds = ds.repartition(parts)
        got = (delta_contributors(ds, ts_col="ts", dim_col="d",
                                  value_col="v")
               .to_pandas().sort_values("d").reset_index(drop=True))
        pd.testing.assert_frame_equal(
            got.astype(exp.dtypes.to_dict()), exp)
        if prev is not None:
            assert got.equals(prev)
        prev = got
    # zero-total-delta edge: symmetric values cancel
    t2 = pa.table({"ts": pa.array([0, 10], pa.int64()),
                   "d": pa.array(["a", "a"]),
                   "v": pa.array([2.0, 2.0])})
    got2 = delta_contributors(ray.data.from_arrow(t2), ts_col="ts",
                              dim_col="d", value_col="v").to_pandas()
    assert got2["delta"].tolist() == [0]
    assert got2["share"].isna().all()


def test_salted_running_total_mega_key_duckdb():
    """salted_running_total vs the plain SQL window under a 60%
    mega-key, NULL keys, negative values, at two bucket counts —
    the salting must never change the answer; n_buckets=1 is the
    degenerate single-bucket identity."""
    from featurebox_ray.stages.window import salted_running_total

    rng = np.random.default_rng(310)
    n = 5000
    k = rng.integers(0, 20, n).astype(object)
    k[: n * 3 // 5] = 7
    k[::701] = None
    t = pa.table({
        "k": pa.array(list(k), pa.int64()),
        "ts": pa.array(rng.integers(0, 10 ** 6, n), pa.int64()),
        "o": pa.array(np.arange(n, dtype=np.int64)),
        "v": pa.array(rng.integers(-500, 500, n), pa.int64()),
    })
    con = duckdb.connect()
    con.register("t", t)
    exp = con.sql("""
        SELECT k, ts, o,
               CAST(sum(coalesce(v, 0)) OVER (PARTITION BY k
                    ORDER BY ts, o ROWS UNBOUNDED PRECEDING)
                    AS BIGINT) AS running_sum
        FROM t ORDER BY o
    """).df().reset_index(drop=True)
    prev = None
    for nb in (8, 1):
        got = (salted_running_total(
            ray.data.from_arrow(t).repartition(6), key_col="k",
            ts_col="ts", order_col="o", int_value_col="v",
            n_buckets=nb, num_partitions=8)
            .to_pandas().sort_values("o").reset_index(drop=True))
        pd.testing.assert_frame_equal(
            got.astype(exp.dtypes.to_dict()), exp)
        if prev is not None:
            assert got.equals(prev)
        prev = got


def test_salted_time_window_sum_mega_key_duckdb():
    """salted_time_window_sum vs the plain RANGE window: 60% mega-key,
    NULL keys/ts, ts TIES (RANGE includes all peers), a window WIDER
    than one bucket (reach > 1 halo replication), and the
    single-bucket identity."""
    from featurebox_ray.stages.window import salted_time_window_sum

    rng = np.random.default_rng(311)
    n = 4000
    k = rng.integers(0, 12, n).astype(object)
    k[: n * 3 // 5] = 3
    k[::613] = None
    ts = rng.integers(0, 5000, n).astype(object)   # heavy ts ties
    ts[::499] = None
    t = pa.table({
        "k": pa.array(list(k), pa.int64()),
        "ts": pa.array(list(ts), pa.int64()),
        "o": pa.array(np.arange(n, dtype=np.int64)),
        "v": pa.array(rng.integers(-300, 300, n), pa.int64()),
    })
    con = duckdb.connect()
    con.register("t", t)
    for W, nb in ((200, 8), (1400, 4), (200, 1)):
        exp = con.sql(f"""
            SELECT k, ts, o,
                   CAST(sum(coalesce(v, 0)) OVER (PARTITION BY k
                        ORDER BY ts RANGE BETWEEN {W} PRECEDING
                        AND CURRENT ROW) AS BIGINT) AS w_sum
            FROM t WHERE ts IS NOT NULL ORDER BY o
        """).df().reset_index(drop=True)
        got = (salted_time_window_sum(
            ray.data.from_arrow(t).repartition(6), key_col="k",
            ts_col="ts", order_col="o", int_value_col="v",
            window=W, n_buckets=nb, max_replication=4,
            num_partitions=8)
            .to_pandas().sort_values("o").reset_index(drop=True))
        pd.testing.assert_frame_equal(
            got.astype(exp.dtypes.to_dict()), exp), (W, nb)


def test_finalized_tumbling_holds_back_open_windows():
    """finalized_tumbling == tumbling filtered to closed windows; the
    newest window is always held back (its inputs can still change),
    and watermark_s=0 closes everything except windows overlapping
    max_ts."""
    from featurebox_ray.stages.window import (finalized_tumbling,
                                              tumbling_window_stats)

    rng = np.random.default_rng(312)
    n = 1500
    t = pa.table({
        "k": pa.array(rng.integers(0, 5, n), pa.int64()),
        "ts": pa.array(rng.integers(0, 10 ** 9, n), pa.int64()),
        "id": pa.array(np.arange(n, dtype=np.int64)),
        "v": pa.array(rng.normal(size=n)),
    })
    ds = ray.data.from_arrow(t).repartition(4)
    width_s, wm_s = 50.0, 100.0
    allw = (tumbling_window_stats(ray.data.from_arrow(t), key_col="k",
                                  ts_col="ts", value_col="v",
                                  id_col="id", width_s=width_s)
            .to_pandas())
    fin = (finalized_tumbling(ds, key_col="k", ts_col="ts",
                              value_col="v", id_col="id",
                              width_s=width_s, watermark_s=wm_s)
           .to_pandas())
    close = int(t["ts"].to_pandas().max()) - int(wm_s * 1e6)
    keep = allw[allw["w_start"] + int(width_s * 1e6) <= close]
    a = keep.sort_values(["k", "w_start"]).reset_index(drop=True)
    b = fin.sort_values(["k", "w_start"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    assert len(fin) < len(allw)            # something held back
    # max window never closed even at watermark 0
    fin0 = (finalized_tumbling(ds, key_col="k", ts_col="ts",
                               value_col="v", id_col="id",
                               width_s=width_s, watermark_s=0.0)
            .to_pandas())
    assert fin0["w_start"].max() + int(width_s * 1e6) <= \
        int(t["ts"].to_pandas().max())
