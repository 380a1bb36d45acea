"""Weighted group quantiles (stages/quantile.py:
weighted_group_quantiles) vs a DuckDB RANGE-window replay."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray

from featurebox_ray.stages.quantile import weighted_group_quantiles

ORACLE = """
    WITH t AS (SELECT g, v, w FROM raw
               WHERE v IS NOT NULL AND w IS NOT NULL),
    c AS (SELECT g, v,
                 sum(w) OVER (PARTITION BY g ORDER BY v) AS cum,
                 sum(w) OVER (PARTITION BY g) AS tw
          FROM t)
    SELECT g, CAST(min(tw) AS BIGINT) AS tot_w,
           min(v) FILTER (WHERE cum * 2 >= tw) AS wq1_2,
           min(v) FILTER (WHERE cum * 4 >= 3 * tw) AS wq3_4
    FROM c GROUP BY g ORDER BY g NULLS LAST
"""


def test_weighted_quantiles_duckdb_fuzz_partition_invariant():
    rng = np.random.default_rng(103)
    n = 900
    g = [None if rng.random() < 0.03 else f"g{rng.integers(0, 8)}"
         for _ in range(n)]
    # coarse values force heavy ties (the RANGE-frame peer semantics)
    v = np.round(rng.normal(0, 3, n), 0)
    v[rng.choice(n, 10, replace=False)] = np.nan
    w = rng.integers(1, 9, n)
    pdf = pd.DataFrame({"g": g, "v": v, "w": w})
    con = duckdb.connect()
    con.register("raw", pdf)
    exp = con.sql(ORACLE).df().reset_index(drop=True)
    t = pa.table({"g": pa.array(g, pa.string()),
                  "v": pa.array(v, pa.float64(), from_pandas=True),
                  "w": pa.array(w, pa.int64())})
    prev = None
    for parts in (1, 5):
        ds = ray.data.from_arrow(t)
        if parts > 1:
            ds = ds.repartition(parts)
        got = (weighted_group_quantiles(
            ds, group_col="g", value_col="v", weight_col="w",
            qs=[(1, 2), (3, 4)], num_partitions=4)
            .to_pandas()
            .sort_values("g", na_position="last")
            .reset_index(drop=True))
        pd.testing.assert_frame_equal(got.astype(exp.dtypes.to_dict()),
                                      exp, check_exact=True)
        if prev is not None:
            assert got.equals(prev)
        prev = got


def test_weighted_quantiles_hand_case():
    # weights skew the median: values 1,2,3 with weights 1,1,8 ->
    # W=10; median = first v with cum*2 >= 10 -> cum(3)=10 -> 3
    t = pa.table({"g": pa.array(["a"] * 3, pa.string()),
                  "v": pa.array([1.0, 2.0, 3.0], pa.float64()),
                  "w": pa.array([1, 1, 8], pa.int64())})
    got = weighted_group_quantiles(
        ray.data.from_arrow(t), group_col="g", value_col="v",
        weight_col="w", qs=[(1, 2)], num_partitions=2).to_pandas()
    assert got.wq1_2.tolist() == [3.0]
    # uniform weights reduce to the plain weighted-median midpoint
    t2 = pa.table({"g": pa.array(["a"] * 4, pa.string()),
                   "v": pa.array([1.0, 2.0, 3.0, 4.0], pa.float64()),
                   "w": pa.array([1, 1, 1, 1], pa.int64())})
    got2 = weighted_group_quantiles(
        ray.data.from_arrow(t2), group_col="g", value_col="v",
        weight_col="w", qs=[(1, 2), (0, 1), (1, 1)],
        names=["med", "q0", "q1"], num_partitions=2).to_pandas()
    assert got2.med.tolist() == [2.0]
    assert got2.q0.tolist() == [1.0]   # q=0 -> minimum
    assert got2.q1.tolist() == [4.0]   # q=1 -> maximum


def test_weighted_quantiles_guards():
    t = pa.table({"g": pa.array(["a"], pa.string()),
                  "v": pa.array([1.0], pa.float64()),
                  "w": pa.array([0], pa.int64())})
    with pytest.raises(Exception, match="positive"):
        weighted_group_quantiles(
            ray.data.from_arrow(t), group_col="g", value_col="v",
            weight_col="w", qs=[(1, 2)]).to_pandas()
    with pytest.raises(ValueError, match="rational"):
        weighted_group_quantiles(
            ray.data.from_arrow(t), group_col="g", value_col="v",
            weight_col="w", qs=[(3, 2)])


TRIM_ORACLE = """
    WITH t AS (SELECT g, v FROM raw WHERE v IS NOT NULL),
    r AS (SELECT g, v, row_number() OVER (PARTITION BY g ORDER BY v)
                   AS rn,
                 count(*) OVER (PARTITION BY g) AS n FROM t),
    k AS (SELECT g, v, rn, n, (n * 1) // 4 AS kk FROM r)
    SELECT g, CAST(min(n) AS BIGINT) AS n_vals,
           CAST(coalesce(count(*) FILTER (WHERE rn > kk
                                            AND rn <= n - kk), 0)
                AS BIGINT) AS n_kept,
           CAST(coalesce(sum(v) FILTER (WHERE rn > kk
                                          AND rn <= n - kk), 0)
                AS BIGINT) AS sum_kept,
           CAST(sum(v) FILTER (WHERE rn > kk AND rn <= n - kk)
                AS DOUBLE)
             / CAST(count(*) FILTER (WHERE rn > kk AND rn <= n - kk)
                    AS DOUBLE) AS trimmed_mean
    FROM k GROUP BY g ORDER BY g NULLS LAST
"""


def test_trimmed_mean_duckdb_fuzz_partition_invariant():
    from featurebox_ray.stages.quantile import group_trimmed_mean

    rng = np.random.default_rng(107)
    n = 700
    g = [None if rng.random() < 0.03 else f"g{rng.integers(0, 10)}"
         for _ in range(n)]
    v = rng.integers(-100, 100, n).astype(object)
    for i in rng.choice(n, 12, replace=False):
        v[i] = None
    pdf = pd.DataFrame({"g": g, "v": pd.array([x for x in v],
                                              dtype="Int64")})
    con = duckdb.connect()
    con.register("raw", pdf)
    exp = con.sql(TRIM_ORACLE).df().reset_index(drop=True)
    t = pa.table({"g": pa.array(g, pa.string()),
                  "v": pa.array(pd.array([x for x in v],
                                         dtype="Int64"))})
    prev = None
    for parts in (1, 5):
        ds = ray.data.from_arrow(t)
        if parts > 1:
            ds = ds.repartition(parts)
        got = (group_trimmed_mean(ds, group_col="g", value_col="v",
                                  trim_num=1, trim_den=4,
                                  num_partitions=3)
               .to_pandas().sort_values("g", na_position="last")
               .reset_index(drop=True))
        pd.testing.assert_frame_equal(got.astype(exp.dtypes.to_dict()),
                                      exp, check_exact=True)
        if prev is not None:
            assert got.equals(prev)
        prev = got


def test_trimmed_mean_hand_case():
    from featurebox_ray.stages.quantile import group_trimmed_mean

    # 1/4 trim on [0, 1, 2, 3, 100] -> k=1, keep [1, 2, 3] -> 2.0
    t = pa.table({"g": pa.array(["a"] * 5, pa.string()),
                  "v": pa.array([100, 0, 2, 1, 3], pa.int64())})
    got = group_trimmed_mean(ray.data.from_arrow(t), group_col="g",
                             value_col="v", trim_num=1,
                             trim_den=4).to_pandas()
    assert got.n_kept.tolist() == [3]
    assert got.trimmed_mean.tolist() == [2.0]
