"""Theil-Sen robust slope (stages/regress.py:group_theil_sen)."""

import duckdb
import numpy as np
import pyarrow as pa
import ray

from featurebox_ray.stages.regress import group_theil_sen


def _serial_theil_sen(x, y):
    slopes = []
    for i in range(len(x)):
        for j in range(len(x)):
            if x[j] > x[i]:
                slopes.append((y[j] - y[i]) / (x[j] - x[i]))
    if not slopes:
        return 0, None
    s = np.sort(np.array(slopes))
    rank = max(int(np.ceil(len(s) / 2)) - 1, 0)
    return len(s), float(s[rank])


def test_theil_sen_vs_serial_and_duckdb():
    rng = np.random.default_rng(11)
    n = 600
    keys = rng.integers(0, 25, n)
    x = rng.integers(0, 1000, n)
    y = np.round(rng.normal(size=n) * 10, 3)
    # inject ties in x, NaN/null y, and a null key
    x[::7] = 42
    y[5] = np.nan
    t = pa.table({
        "k": pa.array([None if i == 13 else int(keys[i])
                       for i in range(n)], pa.int64()),
        "x": pa.array(x, pa.int64()),
        "y": pa.array([None if i == 29 else float(y[i])
                       for i in range(n)], pa.float64()),
    })
    got = (group_theil_sen(ray.data.from_arrow(t).repartition(5),
                           key_col="k", x_col="x", y_col="y",
                           num_partitions=4)
           .to_pandas().sort_values("k").reset_index(drop=True))
    # serial reference
    mask = (np.arange(n) != 13) & (np.arange(n) != 29) & np.isfinite(y)
    for _, row in got.iterrows():
        km = mask & (keys == row["k"])
        npairs, slope = _serial_theil_sen(x[km], y[km])
        assert row["n_points"] == km.sum()
        assert row["n_pairs"] == npairs
        if slope is None:
            assert np.isnan(row["slope"]) or row["slope"] is None
        else:
            assert row["slope"] == slope
    # DuckDB cross-check of the whole frame
    con = duckdb.connect()
    con.register("t", t)
    want = con.execute("""
        WITH e AS (SELECT k, x, y FROM t
                   WHERE k IS NOT NULL AND y IS NOT NULL
                     AND isfinite(y)),
        g AS (SELECT k, CAST(count(*) AS BIGINT) n_points FROM e
              GROUP BY k),
        p AS (SELECT a.k AS k, (b.y-a.y)/(b.x-a.x) AS s
              FROM e a JOIN e b ON a.k = b.k AND b.x > a.x),
        m AS (SELECT k, CAST(count(*) AS BIGINT) n_pairs,
                     quantile_disc(s, CAST(0.5 AS DOUBLE)) slope
              FROM p GROUP BY k)
        SELECT g.k, g.n_points, coalesce(m.n_pairs, 0) n_pairs, m.slope
        FROM g LEFT JOIN m ON g.k = m.k ORDER BY g.k
    """).fetchnumpy()
    assert (got["k"].to_numpy() == want["k"]).all()
    assert (got["n_pairs"].to_numpy() == want["n_pairs"]).all()
    gs, ws = got["slope"].to_numpy(), want["slope"]
    both = ~(np.isnan(gs) | np.isnan(ws))
    assert (gs[both] == ws[both]).all()


def test_theil_sen_outlier_robust_and_skip():
    # planted line y = 3x + 1 with 20% wild outliers -> slope exactly 3
    x = np.arange(50, dtype=np.int64)
    y = 3.0 * x + 1
    y[::5] = 1e6
    t = pa.table({"k": pa.array(np.zeros(50, np.int64)),
                  "x": pa.array(x), "y": pa.array(y)})
    got = group_theil_sen(ray.data.from_arrow(t), key_col="k",
                          x_col="x", y_col="y").to_pandas()
    assert got["slope"].tolist() == [3.0]
    # max_group skip drops the key entirely
    got2 = group_theil_sen(ray.data.from_arrow(t), key_col="k",
                           x_col="x", y_col="y", max_group=10
                           ).to_pandas()
    assert len(got2) == 0
