"""k-anonymity audit (stages/profile.py:k_anonymity) vs a DuckDB
GROUP BY replay, NULL quasi-identifier handling."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from featurebox_ray.stages.profile import k_anonymity

ORACLE = """
    SELECT a, b, CAST(count(*) AS BIGINT) AS n, count(*) < 3 AS below_k
    FROM t GROUP BY a, b
    ORDER BY a NULLS LAST, b NULLS LAST
"""


def test_k_anonymity_duckdb_fuzz_partition_invariant():
    rng = np.random.default_rng(167)
    n = 600
    a = [None if rng.random() < 0.04 else f"a{rng.integers(0, 8)}"
         for _ in range(n)]
    b = [None if rng.random() < 0.04 else f"b{rng.integers(0, 6)}"
         for _ in range(n)]
    pdf = pd.DataFrame({"a": a, "b": b})
    con = duckdb.connect()
    con.register("t", pdf)
    exp = con.sql(ORACLE).df().reset_index(drop=True)
    t = pa.table({"a": pa.array(a, pa.string()),
                  "b": pa.array(b, pa.string())})
    prev = None
    for parts in (1, 7):
        ds = ray.data.from_arrow(t)
        if parts > 1:
            ds = ds.repartition(parts)
        got = (k_anonymity(ds, cols=["a", "b"], k=3, num_partitions=4)
               .to_pandas()
               .sort_values(["a", "b"], na_position="last")
               .reset_index(drop=True))
        pd.testing.assert_frame_equal(got.astype(exp.dtypes.to_dict()),
                                      exp)
        if prev is not None:
            assert got.equals(prev)
        prev = got
    # flags are consistent with the counts
    assert ((got.n < 3) == got.below_k).all()
    assert got.below_k.any() and (~got.below_k).any()


def test_k_anonymity_hand_case():
    t = pa.table({"a": pa.array(["x", "x", "x", "y"], pa.string()),
                  "b": pa.array(["1", "1", "1", "2"], pa.string())})
    got = (k_anonymity(ray.data.from_arrow(t), cols=["a", "b"], k=2)
           .to_pandas().sort_values("a").reset_index(drop=True))
    assert got.n.tolist() == [3, 1]
    assert got.below_k.tolist() == [False, True]


OV_ORACLE = """
    WITH d AS (
      SELECT u, t, lag(t) OVER (PARTITION BY u ORDER BY sq) AS pt
      FROM ev WHERE u IS NOT NULL AND sq IS NOT NULL
        AND t IS NOT NULL)
    SELECT u, CAST(count(pt) AS BIGINT) AS n_pairs,
           CAST(coalesce(sum(CASE WHEN t < pt THEN 1 ELSE 0 END), 0)
                AS BIGINT) AS n_violations,
           CASE WHEN count(pt) = 0 THEN NULL
                ELSE CAST(coalesce(sum(CASE WHEN t < pt THEN 1
                                            ELSE 0 END), 0) AS DOUBLE)
                     / CAST(count(pt) AS DOUBLE) END
             AS violation_rate
    FROM d GROUP BY u ORDER BY u
"""


def test_order_violations_duckdb_fuzz_partition_invariant():
    from featurebox_ray.stages.profile import order_violations

    rng = np.random.default_rng(223)
    n = 900
    pdf = pd.DataFrame({
        "u": rng.integers(0, 20, n).astype(float),
        "sq": np.arange(n).astype(float),
        # mostly increasing with planted regressions
        "t": (np.arange(n) * 10
              + rng.integers(-40, 5, n)).astype(float),
    })
    pdf.loc[rng.choice(n, 7, replace=False), "u"] = np.nan
    pdf.loc[rng.choice(n, 7, replace=False), "t"] = np.nan
    con = duckdb.connect()
    con.register("ev", pdf.astype({"u": "Int64", "sq": "Int64",
                                   "t": "Int64"}))
    exp = con.sql(OV_ORACLE).df().reset_index(drop=True)
    t = pa.table({"u": pa.array(pd.array(pdf.u, dtype="Int64")),
                  "sq": pa.array(pd.array(pdf.sq, dtype="Int64")),
                  "t": pa.array(pd.array(pdf.t, dtype="Int64"))})
    prev = None
    for parts in (1, 6):
        ds = ray.data.from_arrow(t)
        if parts > 1:
            ds = ds.repartition(parts)
        got = (order_violations(ds, key_col="u", seq_col="sq",
                                ts_col="t", num_partitions=4)
               .to_pandas().sort_values("u").reset_index(drop=True))
        pd.testing.assert_frame_equal(got.astype(exp.dtypes.to_dict()),
                                      exp, check_exact=True)
        if prev is not None:
            assert got.equals(prev)
        prev = got
    # planted regressions exist in the fuzz corpus
    assert got.n_violations.sum() > 0
