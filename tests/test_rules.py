"""Association rules (stages/rules.py:association_rules) vs a DuckDB
distinct-basket self-join replay; tiny hand-checked basket set;
partition invariance."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from featurebox_ray.stages.rules import association_rules

ORACLE = """
    WITH d AS (SELECT DISTINCT u AS bk, i FROM t
               WHERE u IS NOT NULL AND i IS NOT NULL),
    s AS (SELECT i, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY i),
    nb AS (SELECT CAST(count(DISTINCT bk) AS BIGINT) AS nu FROM d),
    p AS (SELECT x.i AS a, y.i AS b, CAST(count(*) AS BIGINT) AS n_ab
          FROM d x JOIN d y ON x.bk = y.bk AND x.i < y.i
          GROUP BY 1, 2),
    pp AS (SELECT a AS ant, b AS cons, n_ab FROM p
           UNION ALL SELECT b, a, n_ab FROM p)
    SELECT pp.ant, pp.cons, pp.n_ab, sa.n AS n_ant, sc.n AS n_cons,
           nb.nu AS n_baskets,
           CAST(pp.n_ab AS DOUBLE) / CAST(nb.nu AS DOUBLE)
             AS support,
           CAST(pp.n_ab AS DOUBLE) / CAST(sa.n AS DOUBLE)
             AS confidence,
           CAST(pp.n_ab * nb.nu AS DOUBLE)
             / CAST(sa.n * sc.n AS DOUBLE) AS lift
    FROM pp, nb
    JOIN s sa ON pp.ant = sa.i
    JOIN s sc ON pp.cons = sc.i
    ORDER BY ant, cons
"""

COLS = ["ant", "cons", "n_ab", "n_ant", "n_cons", "n_baskets",
        "support", "confidence", "lift"]


def test_association_rules_duckdb_fuzz_partition_invariant():
    rng = np.random.default_rng(407)
    n = 3000
    u = [None if rng.random() < 0.02 else int(rng.integers(0, 120))
         for _ in range(n)]
    i = [None if rng.random() < 0.02 else f"i{rng.integers(0, 8)}"
         for _ in range(n)]
    pdf = pd.DataFrame({"u": u, "i": i})
    con = duckdb.connect()
    con.register("t", pdf)
    exp = con.sql(ORACLE).df().reset_index(drop=True)
    t = pa.table({"u": pa.array(u, pa.int64()),
                  "i": pa.array(i, pa.string())})
    prev = None
    for parts in (1, 11):
        ds = ray.data.from_arrow(t)
        if parts > 1:
            ds = ds.repartition(parts)
        got = (association_rules(ds, basket_col="u", item_col="i",
                                 num_partitions=5)
               .to_pandas().sort_values(["ant", "cons"])
               .reset_index(drop=True))[COLS]
        pd.testing.assert_frame_equal(
            got.astype(exp.dtypes.to_dict()), exp, check_exact=True)
        if prev is not None:
            assert got.equals(prev)
        prev = got


def test_association_rules_hand_checked():
    # baskets: 1:{a,b} 2:{a,b,c} 3:{a} 4:{c} -> n=4
    t = pa.table({"u": [1, 1, 2, 2, 2, 3, 4, 2],
                  "i": ["a", "b", "a", "b", "c", "a", "c", "a"]})
    got = (association_rules(ray.data.from_arrow(t), basket_col="u",
                             item_col="i")
           .to_pandas().set_index(["ant", "cons"]))
    # a->b: n_ab=2, n_a=3 -> conf 2/3; lift 2*4/(3*2) = 4/3
    assert got.loc[("a", "b"), "n_ab"] == 2
    assert got.loc[("a", "b"), "confidence"] == 2.0 / 3.0
    assert got.loc[("a", "b"), "lift"] == float(2 * 4) / float(3 * 2)
    # b->a: conf = 2/2 = 1
    assert got.loc[("b", "a"), "confidence"] == 1.0
    # a->c and c->a present with n_ab=1
    assert got.loc[("a", "c"), "n_ab"] == 1
    assert got.loc[("a", "c"), "support"] == 0.25
    # min_count filter drops the a-c pair entirely
    got2 = (association_rules(ray.data.from_arrow(t), basket_col="u",
                              item_col="i", min_count=2)
            .to_pandas())
    assert set(map(tuple, got2[["ant", "cons"]].values)) == {
        ("a", "b"), ("b", "a")}
