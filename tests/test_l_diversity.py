"""l-diversity audit (stages/profile.py:l_diversity_audit) vs a
DuckDB count(DISTINCT) replay; constant-sensitive leak case."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from featurebox_ray.stages.profile import l_diversity_audit

ORACLE = """
    SELECT q1, q2, CAST(count(*) AS BIGINT) AS n,
           CAST(count(DISTINCT s) AS BIGINT) AS n_sensitive,
           count(DISTINCT s) >= 2 AS ok
    FROM t
    WHERE q1 IS NOT NULL AND q2 IS NOT NULL AND s IS NOT NULL
    GROUP BY q1, q2 ORDER BY q1, q2
"""


def test_l_diversity_duckdb_partition_invariant():
    rng = np.random.default_rng(293)
    n = 2500
    q1 = rng.choice(["a", "b", "c"], n)
    q2 = rng.integers(0, 4, n).astype(float)
    s = rng.choice(["x", "y", "z"], n)
    # leaking group: big but constant sensitive value
    leak = (q1 == "c") & (q2 == 3)
    s[leak] = "x"
    q2[rng.choice(n, 10, replace=False)] = np.nan
    pdf = pd.DataFrame({"q1": q1,
                        "q2": pd.array(q2, dtype="Int64"), "s": s})
    con = duckdb.connect()
    con.register("t", pdf)
    exp = con.sql(ORACLE).df().reset_index(drop=True)
    bad = exp[(exp.q1 == "c") & (exp.q2 == 3)]
    assert (bad.n > 50).all() and (~bad.ok).all()
    t = pa.Table.from_pandas(pdf, preserve_index=False)
    prev = None
    for parts in (1, 6):
        ds = ray.data.from_arrow(t)
        if parts > 1:
            ds = ds.repartition(parts)
        got = (l_diversity_audit(ds, quasi_cols=["q1", "q2"],
                                 sensitive_col="s", l_threshold=2,
                                 num_partitions=4)
               .to_pandas().sort_values(["q1", "q2"])
               .reset_index(drop=True))
        pd.testing.assert_frame_equal(
            got.astype(exp.dtypes.to_dict()), exp)
        if prev is not None:
            assert got.equals(prev)
        prev = got
