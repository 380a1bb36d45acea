"""Incremental aggregate refresh (stages/incremental.py) — the
maintenance invariant (refresh == recompute), repeated refreshes,
partition invariance, NULL-value coalesce semantics."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from featurebox_ray.stages.incremental import (finalize_agg,
                                               group_agg_state,
                                               refresh_agg_state)

ORACLE = """
    WITH e AS (SELECT k1, k2,
                      CAST(round(coalesce(v, 0) * 100) AS BIGINT)
                          AS c
               FROM t WHERE k1 IS NOT NULL AND k2 IS NOT NULL)
    SELECT k1, k2, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(c) AS BIGINT) AS sum_c,
           CAST(min(c) AS BIGINT) AS min_c,
           CAST(max(c) AS BIGINT) AS max_c,
           CAST(sum(c) AS DOUBLE) / CAST(count(*) AS DOUBLE) / 100.0
               AS avg
    FROM e GROUP BY k1, k2 ORDER BY k1, k2
"""


def _pdf(seed, n):
    rng = np.random.default_rng(seed)
    k1 = rng.integers(0, 25, n).astype(float)
    k2 = rng.choice(["a", "b", "c"], n)
    v = np.round(rng.uniform(-50, 50, n), 2)
    k1[rng.choice(n, 10, replace=False)] = np.nan
    v[rng.choice(n, 10, replace=False)] = np.nan
    return pd.DataFrame({"k1": pd.array(k1, dtype="Int64"),
                         "k2": k2, "v": v})


def _ds(pdf, parts):
    ds = ray.data.from_arrow(
        pa.Table.from_pandas(pdf, preserve_index=False))
    return ds.repartition(parts) if parts > 1 else ds


def test_refresh_equals_recompute_two_deltas():
    base = _pdf(280, 1500)
    d1 = _pdf(281, 500)
    d2 = _pdf(282, 300)
    con = duckdb.connect()
    con.register("t", pd.concat([base, d1, d2]))
    exp = con.sql(ORACLE).df().reset_index(drop=True)
    prev = None
    for parts in (1, 5):
        st = group_agg_state(_ds(base, parts),
                             key_cols=["k1", "k2"], value_col="v",
                             num_partitions=4)
        st = refresh_agg_state(st, _ds(d1, parts),
                               key_cols=["k1", "k2"], value_col="v",
                               num_partitions=4)
        st = refresh_agg_state(st, _ds(d2, parts),
                               key_cols=["k1", "k2"], value_col="v",
                               num_partitions=4)
        got = (finalize_agg(st).to_pandas()
               .sort_values(["k1", "k2"]).reset_index(drop=True))
        pd.testing.assert_frame_equal(
            got.astype(exp.dtypes.to_dict()), exp)
        if prev is not None:
            assert got.equals(prev)
        prev = got


def test_state_hand_case():
    t = pa.table({
        "k1": pa.array([1, 1, 2], pa.int64()),
        "k2": pa.array(["x", "x", "y"]),
        "v": pa.array([1.25, None, -2.0], pa.float64()),
    })
    st = group_agg_state(ray.data.from_arrow(t),
                         key_cols=["k1", "k2"], value_col="v",
                         num_partitions=2)
    got = (finalize_agg(st).to_pandas().sort_values("k1")
           .reset_index(drop=True))
    assert got.n.tolist() == [2, 1]
    # NULL value coalesces to 0 cents (counted, like the SQL view)
    assert got.sum_c.tolist() == [125, -200]
    assert got.min_c.tolist() == [0, -200]
    assert got.max_c.tolist() == [125, -200]
    assert got.avg.tolist() == [0.625, -2.0]
