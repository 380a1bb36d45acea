"""Leave-one-out target encoding (stages/encode.py:loo_target_encode)
vs a DuckDB window replay; singleton NULL; partition invariance."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from featurebox_ray.stages.encode import loo_target_encode

ORACLE = """
    WITH e AS (SELECT id, cat,
                      CAST(round(coalesce(v, 0) * 100) AS BIGINT)
                        AS y
               FROM t WHERE id IS NOT NULL AND cat IS NOT NULL),
    s AS (SELECT cat, CAST(sum(y) AS BIGINT) AS sg,
                 CAST(count(*) AS BIGINT) AS cg
          FROM e GROUP BY cat)
    SELECT e.id, e.cat,
           CASE WHEN s.cg > 1
                THEN CAST(s.sg - e.y AS DOUBLE)
                     / CAST(s.cg - 1 AS DOUBLE)
                ELSE NULL END AS loo_cents
    FROM e JOIN s USING (cat) ORDER BY e.id
"""


def test_loo_encode_duckdb_fuzz_partition_invariant():
    rng = np.random.default_rng(479)
    n = 1500
    ids = rng.permutation(n * 2)[:n]
    cats = [None if rng.random() < 0.03
            else f"c{rng.integers(0, 40)}" for _ in range(n)]
    vals = [None if rng.random() < 0.05
            else round(float(rng.normal() * 20), 2)
            for _ in range(n)]
    pdf = pd.DataFrame({"id": ids, "cat": cats, "v": vals})
    con = duckdb.connect()
    con.register("t", pdf)
    exp = con.sql(ORACLE).df().reset_index(drop=True)
    t = pa.table({"id": pa.array(ids, pa.int64()),
                  "cat": pa.array(cats, pa.string()),
                  "v": pa.array(vals, pa.float64())})
    prev = None
    for parts in (1, 12):
        ds = ray.data.from_arrow(t)
        if parts > 1:
            ds = ds.repartition(parts)
        got = (loo_target_encode(ds, id_col="id", cat_col="cat",
                                 value_col="v", num_partitions=6)
               .to_pandas().sort_values("id")
               .reset_index(drop=True))
        pd.testing.assert_frame_equal(
            got.astype(exp.dtypes.to_dict()), exp, check_exact=True)
        if prev is not None:
            assert got.equals(prev)
        prev = got


def test_loo_encode_hand_checked():
    # cat a: values 1.00 2.00 3.00 -> loo of row1 = (200+300)/2 = 250
    t = pa.table({"id": [1, 2, 3, 4],
                  "cat": ["a", "a", "a", "b"],
                  "v": [1.0, 2.0, 3.0, 9.0]})
    got = (loo_target_encode(ray.data.from_arrow(t), id_col="id",
                             cat_col="cat", value_col="v")
           .to_pandas().set_index("id"))
    assert got.loc[1, "loo_cents"] == 250.0
    assert got.loc[2, "loo_cents"] == 200.0
    assert got.loc[3, "loo_cents"] == 150.0
    assert pd.isna(got.loc[4, "loo_cents"])  # singleton category
