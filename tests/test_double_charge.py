"""Near-duplicate event audit (stages/interval.py:
near_duplicate_events) vs a DuckDB lag replay; planted double charge;
window boundary; partition invariance."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from featurebox_ray.stages.interval import near_duplicate_events

ORACLE = """
    WITH e AS (SELECT id, k, c, t FROM tab
               WHERE k IS NOT NULL AND c IS NOT NULL
                 AND t IS NOT NULL AND id IS NOT NULL),
    d AS (SELECT id, k, c, t,
                 t - lag(t) OVER (PARTITION BY k, c
                                  ORDER BY t, id) AS gap
          FROM e)
    SELECT id, k, c, gap AS gap_us FROM d
    WHERE gap IS NOT NULL AND gap <= 100 ORDER BY id
"""


def test_double_charge_duckdb_partition_invariant():
    rng = np.random.default_rng(299)
    n = 3000
    k = rng.integers(0, 40, n).astype(float)
    c = rng.integers(0, 50, n).astype(float)     # heavy collisions
    t = rng.integers(0, 100_000, n).astype(float)
    ids = np.arange(n).astype(float)
    k[rng.choice(n, 10, replace=False)] = np.nan
    pdf = pd.DataFrame({"id": pd.array(ids, dtype="Int64"),
                        "k": pd.array(k, dtype="Int64"),
                        "c": pd.array(c, dtype="Int64"),
                        "t": pd.array(t, dtype="Int64")})
    con = duckdb.connect()
    con.register("tab", pdf)
    exp = con.sql(ORACLE).df().reset_index(drop=True)
    assert len(exp) > 0
    tab = pa.Table.from_pandas(pdf, preserve_index=False)
    prev = None
    for parts in (1, 6):
        ds = ray.data.from_arrow(tab)
        if parts > 1:
            ds = ds.repartition(parts)
        got = (near_duplicate_events(ds, key_col="k",
                                     amount_col="c", ts_col="t",
                                     id_col="id", window_us=100,
                                     num_partitions=4)
               .to_pandas().sort_values("id").reset_index(drop=True)
               .rename(columns={"c": "c"}))
        pd.testing.assert_frame_equal(
            got[["id", "k", "c", "gap_us"]].astype(
                exp.dtypes.to_dict()), exp)
        if prev is not None:
            assert got.equals(prev)
        prev = got


def test_double_charge_window_boundary():
    # gaps of exactly window and window+1: inclusive boundary
    t = pa.table({
        "id": pa.array([1, 2, 3, 4], pa.int64()),
        "k": pa.array([7, 7, 7, 7], pa.int64()),
        "c": pa.array([500, 500, 900, 900], pa.int64()),
        "t": pa.array([0, 60, 0, 61], pa.int64()),
    })
    got = near_duplicate_events(
        ray.data.from_arrow(t), key_col="k", amount_col="c",
        ts_col="t", id_col="id", window_us=60).to_pandas()
    assert got.id.tolist() == [2]
    assert got.gap_us.tolist() == [60]
