"""Temporal split audit (stages/profile.py:temporal_split_audit) vs a
DuckDB replay; hand-checked overlap; partition invariance."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from featurebox_ray.stages.profile import temporal_split_audit

ORACLE = """
    WITH e AS (SELECT u, CAST(t AS BIGINT) AS t FROM tab
               WHERE u IS NOT NULL AND t IS NOT NULL),
    b AS (SELECT min(t) AS mn, max(t) AS mx FROM e),
    c AS (SELECT mn + (mx - mn) * 4 // 5 AS cut FROM b),
    s AS (SELECT u, CASE WHEN t >= (SELECT cut FROM c)
                         THEN 1 ELSE 0 END AS side FROM e),
    r AS (SELECT CAST(sum(CASE WHEN side = 0 THEN 1 ELSE 0 END)
                      AS BIGINT) AS rows_train,
                 CAST(sum(side) AS BIGINT) AS rows_test FROM s),
    u AS (SELECT u AS uid,
                 max(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS htr,
                 max(side) AS hte
          FROM s GROUP BY u),
    k AS (SELECT CAST(sum(htr) AS BIGINT) AS users_train,
                 CAST(sum(hte) AS BIGINT) AS users_test,
                 CAST(sum(CASE WHEN htr = 1 AND hte = 1
                          THEN 1 ELSE 0 END) AS BIGINT)
                   AS users_both
          FROM u)
    SELECT c.cut AS cut_ts, r.rows_train, r.rows_test,
           k.users_train, k.users_test, k.users_both,
           CASE WHEN k.users_test = 0 THEN NULL
                ELSE CAST(k.users_both AS DOUBLE)
                     / CAST(k.users_test AS DOUBLE) END
             AS leak_share
    FROM c, r, k
"""


def test_split_audit_duckdb_fuzz_partition_invariant():
    rng = np.random.default_rng(509)
    n = 2000
    u = [None if rng.random() < 0.02 else int(rng.integers(0, 150))
         for _ in range(n)]
    t_ = [None if rng.random() < 0.02
          else int(rng.integers(0, 10 ** 9)) for _ in range(n)]
    pdf = pd.DataFrame({"u": u, "t": t_})
    con = duckdb.connect()
    con.register("tab", pdf)
    exp = con.sql(ORACLE).df().reset_index(drop=True)
    t = pa.table({"u": pa.array(u, pa.int64()),
                  "t": pa.array(t_, pa.int64())})
    prev = None
    for parts in (1, 11):
        ds = ray.data.from_arrow(t)
        if parts > 1:
            ds = ds.repartition(parts)
        got = (temporal_split_audit(ds, user_col="u", ts_col="t",
                                    num_partitions=5)
               .to_pandas().reset_index(drop=True))
        pd.testing.assert_frame_equal(
            got.astype(exp.dtypes.to_dict()), exp, check_exact=True)
        if prev is not None:
            assert got.equals(prev)
        prev = got


def test_split_audit_hand_checked():
    # span 0..100 -> cut at 80; user 1 on both sides, user 2 train
    # only, user 3 test only
    t = pa.table({"u": [1, 1, 2, 3], "t": [0, 90, 50, 100]})
    got = temporal_split_audit(ray.data.from_arrow(t), user_col="u",
                               ts_col="t").to_pandas().iloc[0]
    assert got["cut_ts"] == 80
    assert (got["rows_train"], got["rows_test"]) == (2, 2)
    assert (got["users_train"], got["users_test"],
            got["users_both"]) == (2, 2, 1)
    assert got["leak_share"] == 0.5
