"""Daily new-vs-returning (stages/retention.py:
daily_new_vs_returning) vs a DuckDB replay; hand case; partition
invariance."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from featurebox_ray.stages.retention import daily_new_vs_returning

US_DAY = 86_400_000_000

ORACLE = """
    WITH e AS (SELECT k, t // 86400000000 AS d FROM tab
               WHERE k IS NOT NULL AND t IS NOT NULL),
    ud AS (SELECT DISTINCT k, d FROM e),
    m AS (SELECT k, min(d) AS md FROM ud GROUP BY k)
    SELECT ud.d AS day, CAST(count(*) AS BIGINT) AS n_active,
           CAST(sum(CASE WHEN m.md = ud.d THEN 1 ELSE 0 END)
                AS BIGINT) AS n_new,
           CAST(sum(CASE WHEN m.md = ud.d THEN 1 ELSE 0 END)
                AS DOUBLE) / CAST(count(*) AS DOUBLE) AS new_frac
    FROM ud JOIN m USING (k) GROUP BY ud.d ORDER BY day
"""


def test_new_vs_returning_duckdb_partition_invariant():
    rng = np.random.default_rng(298)
    rows = []
    for u in range(60):
        start = int(rng.integers(0, 20))
        for d in range(start, 30):
            if rng.uniform() < 0.5:
                rows.append((u, d * US_DAY + int(rng.integers(
                    0, US_DAY))))
    k = [r[0] for r in rows] + [None]
    t = [r[1] for r in rows] + [5]
    pdf = pd.DataFrame({"k": pd.array(k, dtype="Int64"),
                        "t": pd.array(t, dtype="Int64")})
    con = duckdb.connect()
    con.register("tab", pdf)
    exp = con.sql(ORACLE).df().reset_index(drop=True)
    tab = pa.Table.from_pandas(pdf, preserve_index=False)
    prev = None
    for parts in (1, 6):
        ds = ray.data.from_arrow(tab)
        if parts > 1:
            ds = ds.repartition(parts)
        got = (daily_new_vs_returning(ds, key_col="k", ts_col="t",
                                      num_partitions=4)
               .to_pandas().reset_index(drop=True))
        pd.testing.assert_frame_equal(
            got.astype(exp.dtypes.to_dict()), exp)
        if prev is not None:
            assert got.equals(prev)
        prev = got
    # the sum of n_new over all days equals the distinct user count
    n_users = pdf.dropna().k.nunique()
    assert got.n_new.sum() == n_users


def test_new_vs_returning_hand_case():
    t = pa.table({
        "k": pa.array([1, 1, 1, 2, 2], pa.int64()),
        "t": pa.array([0, US_DAY, US_DAY + 5, US_DAY, 2 * US_DAY],
                      pa.int64()),
    })
    got = daily_new_vs_returning(
        ray.data.from_arrow(t), key_col="k", ts_col="t").to_pandas()
    assert got.day.tolist() == [0, 1, 2]
    assert got.n_active.tolist() == [1, 2, 1]
    assert got.n_new.tolist() == [1, 1, 0]
    assert got.new_frac.tolist() == [1.0, 0.5, 0.0]
