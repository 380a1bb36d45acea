"""Rolling regression slope (stages/window.py:rolling_slope) vs a
DuckDB window replay; exact-trend hand case."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from featurebox_ray.stages.window import rolling_slope

ORACLE = """
    WITH r AS (
      SELECT id, k, y,
             row_number() OVER (PARTITION BY k ORDER BY t, id) - 1
               AS j
      FROM ev WHERE k IS NOT NULL AND t IS NOT NULL
                AND y IS NOT NULL),
    s AS (
      SELECT id, count(*) OVER wk AS m, sum(y) OVER wk AS sy,
             sum(j * y) OVER wk AS sjy, min(j) OVER wk AS j0
      FROM r
      WINDOW wk AS (PARTITION BY k ORDER BY j
                    ROWS BETWEEN {km1} PRECEDING AND CURRENT ROW)),
    f AS (SELECT id, m, sy, sjy - j0 * sy AS sxy,
                 m * (m - 1) // 2 AS sx,
                 (m - 1) * m * (2 * m - 1) // 6 AS sxx
          FROM s)
    SELECT id, CASE WHEN m * sxx - sx * sx = 0 THEN NULL
               ELSE CAST(m * sxy - sx * sy AS DOUBLE)
                    / CAST(m * sxx - sx * sx AS DOUBLE) END
             AS roll_slope
    FROM f ORDER BY id
"""


def test_rolling_slope_duckdb_fuzz_partition_invariant():
    rng = np.random.default_rng(131)
    n, k = 900, 6
    pdf = pd.DataFrame({
        "id": np.arange(n),
        "k": rng.integers(0, 20, n),
        "t": rng.integers(0, 10000, n),
        "y": rng.integers(-500, 500, n),
    })
    con = duckdb.connect()
    con.register("ev", pdf)
    exp = con.sql(ORACLE.format(km1=k - 1)).df().reset_index(drop=True)
    t = pa.table({c: pa.array(pdf[c], pa.int64()) for c in pdf})
    prev = None
    for parts in (1, 6):
        ds = ray.data.from_arrow(t)
        if parts > 1:
            ds = ds.repartition(parts)
        got = (rolling_slope(ds, key_col="k", ts_col="t", id_col="id",
                             value_col="y", k=k, num_partitions=4)
               .to_pandas().sort_values("id").reset_index(drop=True))
        pd.testing.assert_frame_equal(got.astype(exp.dtypes.to_dict()),
                                      exp, check_exact=True)
        if prev is not None:
            assert got.equals(prev)
        prev = got


def test_rolling_slope_exact_trend():
    # y = 7*j + 3: slope must be exactly 7 everywhere after row 0
    n = 20
    t = pa.table({"id": pa.array(range(n), pa.int64()),
                  "k": pa.array([1] * n, pa.int64()),
                  "t": pa.array(range(n), pa.int64()),
                  "y": pa.array([7 * j + 3 for j in range(n)],
                                pa.int64())})
    got = (rolling_slope(ray.data.from_arrow(t), key_col="k",
                         ts_col="t", id_col="id", value_col="y", k=5,
                         num_partitions=2)
           .to_pandas().sort_values("id"))
    assert pd.isna(got.roll_slope.iloc[0])      # single-row window
    assert (got.roll_slope.iloc[1:] == 7.0).all()


BURST_ORACLE = """
    WITH g AS (
      SELECT k, t - lag(t) OVER (PARTITION BY k ORDER BY t, id) AS gap
      FROM ev WHERE k IS NOT NULL AND t IS NOT NULL),
    s AS (SELECT k, CAST(count(gap) AS BIGINT) AS n_gaps,
                 CAST(coalesce(sum(gap), 0) AS BIGINT) AS sum_gap,
                 CAST(coalesce(sum(CAST(gap AS HUGEINT) * gap), 0)
                      AS DOUBLE) AS sum_gap2
          FROM g GROUP BY k),
    f AS (SELECT *, CASE WHEN n_gaps = 0 THEN NULL
                    ELSE CAST(sum_gap AS DOUBLE)
                         / CAST(n_gaps AS DOUBLE) END AS mu FROM s),
    v AS (SELECT *, CASE WHEN n_gaps < 2 THEN NULL
                    ELSE sqrt((sum_gap2 - CAST(sum_gap AS DOUBLE) * mu)
                              / CAST(n_gaps - 1 AS DOUBLE)) END AS sd
          FROM f)
    SELECT k, n_gaps, sum_gap, sum_gap2,
           (sd - mu) / NULLIF(sd + mu, 0) AS burstiness
    FROM v ORDER BY k
"""


def test_burstiness_duckdb_fuzz_partition_invariant():
    from featurebox_ray.stages.window import group_burstiness

    rng = np.random.default_rng(151)
    n = 1000
    # HUGE native-unit gaps force the split-word Σg² path past 2^63
    pdf = pd.DataFrame({
        "id": np.arange(n),
        "k": rng.integers(0, 40, n),
        "t": rng.integers(0, 4 * 10**12, n),
    })
    con = duckdb.connect()
    con.register("ev", pdf)
    exp = con.sql(BURST_ORACLE).df().reset_index(drop=True)
    t = pa.table({c: pa.array(pdf[c], pa.int64()) for c in pdf})
    prev = None
    for parts in (1, 6):
        ds = ray.data.from_arrow(t)
        if parts > 1:
            ds = ds.repartition(parts)
        got = (group_burstiness(ds, key_col="k", ts_col="t",
                                id_col="id", num_partitions=4)
               .to_pandas().sort_values("k").reset_index(drop=True))
        pd.testing.assert_frame_equal(got.astype(exp.dtypes.to_dict()),
                                      exp, check_exact=True)
        if prev is not None:
            assert got.equals(prev)
        prev = got


def test_burstiness_regimes():
    from featurebox_ray.stages.window import group_burstiness

    # periodic key (constant gaps) -> sd = 0 -> B = -1
    # bursty key (tiny gaps + one huge gap) -> B near +1
    ids = list(range(12))
    ks = [1] * 6 + [2] * 6
    ts = [0, 10, 20, 30, 40, 50] + [0, 1, 2, 3, 4, 1000000]
    t = pa.table({"id": pa.array(ids, pa.int64()),
                  "k": pa.array(ks, pa.int64()),
                  "t": pa.array(ts, pa.int64())})
    got = (group_burstiness(ray.data.from_arrow(t), key_col="k",
                            ts_col="t", id_col="id", num_partitions=2)
           .to_pandas().sort_values("k"))
    assert got.burstiness.tolist()[0] == -1.0
    # 5 gaps [1,1,1,1,~1e6]: sample σ≈447k, μ=200k -> B ≈ 0.38 > 0
    assert got.burstiness.tolist()[1] > 0.3


KS_ORACLE = """
    WITH e AS (SELECT k, s, v FROM t
               WHERE k IS NOT NULL AND s IS NOT NULL
                 AND v IS NOT NULL AND isfinite(v)),
    c AS (SELECT k, v,
                 sum(CASE WHEN s = 0 THEN 1 ELSE 0 END) AS a,
                 sum(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS bb
          FROM e GROUP BY k, v),
    w AS (SELECT k, v,
                 sum(a) OVER (PARTITION BY k ORDER BY v) AS ca,
                 sum(bb) OVER (PARTITION BY k ORDER BY v) AS cb,
                 sum(a) OVER (PARTITION BY k) AS na,
                 sum(bb) OVER (PARTITION BY k) AS nb
          FROM c)
    SELECT k, CAST(min(na) AS BIGINT) AS n0,
           CAST(min(nb) AS BIGINT) AS n1,
           CAST(max(abs(ca * nb - cb * na)) AS BIGINT) AS d_num,
           CASE WHEN min(na) = 0 OR min(nb) = 0 THEN NULL
                ELSE CAST(max(abs(ca * nb - cb * na)) AS DOUBLE)
                     / CAST(min(na) * min(nb) AS DOUBLE) END AS ks_d
    FROM w GROUP BY k ORDER BY k
"""


def test_ks_drift_duckdb_fuzz_partition_invariant():
    from featurebox_ray.stages.regress import group_ks_drift

    rng = np.random.default_rng(193)
    n = 1200
    pdf = pd.DataFrame({
        "k": rng.integers(0, 10, n),
        "s": rng.integers(0, 2, n),
        # coarse values force heavy ties (run-end semantics)
        "v": np.round(rng.normal(0, 2, n), 0),
    })
    # one key exists only on side 0 -> NULL ks_d
    pdf.loc[pdf.k == 9, "s"] = 0
    pdf.loc[rng.choice(n, 10, replace=False), "v"] = np.nan
    con = duckdb.connect()
    con.register("t", pdf)
    exp = con.sql(KS_ORACLE).df().reset_index(drop=True)
    t = pa.table({"k": pa.array(pdf.k, pa.int64()),
                  "s": pa.array(pdf.s, pa.int64()),
                  "v": pa.array(pdf.v, pa.float64(),
                                from_pandas=True)})
    prev = None
    for parts in (1, 6):
        ds = ray.data.from_arrow(t)
        if parts > 1:
            ds = ds.repartition(parts)
        got = (group_ks_drift(ds, key_col="k", side_col="s",
                              value_col="v", num_partitions=4)
               .to_pandas().sort_values("k").reset_index(drop=True))
        pd.testing.assert_frame_equal(got.astype(exp.dtypes.to_dict()),
                                      exp, check_exact=True)
        if prev is not None:
            assert got.equals(prev)
        prev = got
    assert pd.isna(got.loc[got.k == 9, "ks_d"]).all()


def test_ks_drift_regimes():
    from featurebox_ray.stages.regress import group_ks_drift

    # identical samples -> D = 0; disjoint supports -> D = 1
    k = [1] * 8 + [2] * 8
    s = ([0, 1] * 4) + [0] * 4 + [1] * 4
    v = [5.0, 5.0, 7.0, 7.0, 5.0, 5.0, 7.0, 7.0,
         1.0, 2.0, 3.0, 4.0, 10.0, 11.0, 12.0, 13.0]
    t = pa.table({"k": pa.array(k, pa.int64()),
                  "s": pa.array(s, pa.int64()),
                  "v": pa.array(v, pa.float64())})
    got = (group_ks_drift(ray.data.from_arrow(t), key_col="k",
                          side_col="s", value_col="v",
                          num_partitions=2)
           .to_pandas().sort_values("k"))
    assert got.ks_d.tolist() == [0.0, 1.0]
