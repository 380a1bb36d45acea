"""QQ drift (stages/diff.py:group_qq_drift) vs a DuckDB quantile_disc
replay; planted-shift sanity; partition invariance."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray

from featurebox_ray.stages.diff import group_qq_drift

_DECILES = ", ".join(
    f"CAST(quantile_disc(c, {q / 10}) AS BIGINT) AS d{q}"
    for q in range(1, 10))
_GREATEST = ", ".join(f"abs(a.d{q}-b.d{q})" for q in range(1, 10))

ORACLE = f"""
    WITH e AS (SELECT g, side, c FROM t
               WHERE g IS NOT NULL AND side IS NOT NULL
                 AND c IS NOT NULL),
    q AS (SELECT g, side, CAST(count(*) AS BIGINT) AS n, {_DECILES}
          FROM e GROUP BY g, side)
    SELECT a.g, a.n AS n_a, b.n AS n_b,
           greatest({_GREATEST}) AS qq_dist
    FROM q a JOIN q b USING (g)
    WHERE a.side = 0 AND b.side = 1 ORDER BY a.g
"""


def test_qq_drift_duckdb_partition_invariant():
    rng = np.random.default_rng(288)
    n = 4000
    g = rng.integers(0, 5, n).astype(float)
    side = rng.integers(0, 2, n).astype(float)
    c = rng.integers(-100, 100, n).astype(float)
    # planted shift: group 2 side 1 shifted by +500
    c[(g == 2) & (side == 1)] += 500
    # group 4 is one-sided -> must drop
    side[g == 4] = 0
    for a in (g, side, c):
        a[rng.choice(n, 12, replace=False)] = np.nan
    pdf = pd.DataFrame({"g": pd.array(g, dtype="Int64"),
                        "side": pd.array(side, dtype="Int64"),
                        "c": pd.array(c, dtype="Int64")})
    con = duckdb.connect()
    con.register("t", pdf)
    exp = con.sql(ORACLE).df().reset_index(drop=True)
    assert 4 not in set(exp.g)
    assert int(exp.loc[exp.g == 2, "qq_dist"].iloc[0]) > 300
    t = pa.Table.from_pandas(pdf, preserve_index=False)
    prev = None
    for parts in (1, 6):
        ds = ray.data.from_arrow(t)
        if parts > 1:
            ds = ds.repartition(parts)
        got = (group_qq_drift(ds, group_col="g", side_col="side",
                              value_col="c", num_partitions=4)
               .to_pandas().sort_values("g").reset_index(drop=True))
        pd.testing.assert_frame_equal(
            got.astype(exp.dtypes.to_dict()), exp)
        if prev is not None:
            assert got.equals(prev)
        prev = got


def test_qq_drift_bad_side_raises():
    t = pa.table({"g": pa.array([1], pa.int64()),
                  "side": pa.array([2], pa.int64()),
                  "c": pa.array([5], pa.int64())})
    with pytest.raises(Exception):
        group_qq_drift(ray.data.from_arrow(t), group_col="g",
                       side_col="side", value_col="c").to_pandas()
