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
