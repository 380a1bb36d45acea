"""cogroup (stages/join.py) — the public two-sided keyed extension
point: user kernels build custom ops; verified by implementing an
anti-join and a per-key count-match against DuckDB."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray

from featurebox_ray.stages.join import cogroup


def _tables():
    rng = np.random.default_rng(315)
    n = 4000
    k = rng.integers(0, 300, n).astype(object)
    k[::577] = None
    left = pa.table({"k": pa.array(list(k), pa.int64()),
                     "v": pa.array(rng.integers(0, 99, n))})
    right = pa.table({"rk": pa.array(
        rng.integers(0, 250, 700).astype(np.int64)),
        "w": pa.array(rng.integers(0, 9, 700))})
    return left, right


def test_cogroup_anti_join_vs_duckdb():
    left, right = _tables()

    def anti(lt: pa.Table, rt: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if lt.num_rows == 0:
            return lt.select(["k", "v"])
        m = pc.invert(pc.is_in(lt["k"],
                               value_set=rt["k"].combine_chunks()))
        return lt.filter(pc.fill_null(m, True)).select(["k", "v"])

    got = (cogroup(ray.data.from_arrow(left).repartition(5),
                   ray.data.from_arrow(right), on="k",
                   right_on="rk", kernel=anti, num_partitions=6)
           .to_pandas().sort_values(["k", "v"])
           .reset_index(drop=True))
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    exp = (con.sql("SELECT k, v FROM l WHERE k IS NULL OR k NOT IN "
                   "(SELECT rk FROM r)").df()
           .sort_values(["k", "v"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got.astype(exp.dtypes.to_dict()),
                                  exp)


def test_cogroup_per_key_match_counts():
    left, right = _tables()

    def counts(lt: pa.Table, rt: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        empty = pa.table({"k": pa.array([], pa.int64()),
                          "n_left": pa.array([], pa.int64()),
                          "n_right": pa.array([], pa.int64())})
        if lt.num_rows == 0 and rt.num_rows == 0:
            return empty
        both = pa.concat_tables([lt.select(["k"]), rt.select(["k"])])
        keys = pc.unique(both["k"].combine_chunks())
        nl = [int(pc.sum(pc.cast(pc.fill_null(
            pc.equal(lt["k"], kv), kv.as_py() is None),
            pa.int64())).as_py() or 0) if lt.num_rows else 0
            for kv in keys]
        nr = [int(pc.sum(pc.cast(pc.fill_null(
            pc.equal(rt["k"], kv), kv.as_py() is None),
            pa.int64())).as_py() or 0) if rt.num_rows else 0
            for kv in keys]
        # count NULL keys explicitly (pc.equal(NULL) is null)
        nl = [lt["k"].null_count if kv.as_py() is None else x
              for kv, x in zip(keys, nl)]
        nr = [rt["k"].null_count if kv.as_py() is None else x
              for kv, x in zip(keys, nr)]
        return pa.table({"k": keys,
                         "n_left": pa.array(nl, pa.int64()),
                         "n_right": pa.array(nr, pa.int64())})

    got = (cogroup(ray.data.from_arrow(left).repartition(4),
                   ray.data.from_arrow(right), on="k",
                   right_on="rk", kernel=counts, num_partitions=5)
           .to_pandas().sort_values("k").reset_index(drop=True))
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    exp = (con.sql("""
        WITH ks AS (SELECT k FROM l UNION SELECT rk FROM r)
        SELECT ks.k,
               CAST(coalesce(nl.c, 0) AS BIGINT) AS n_left,
               CAST(coalesce(nr.c, 0) AS BIGINT) AS n_right
        FROM ks
        LEFT JOIN (SELECT k, count(*) c FROM l GROUP BY k) nl
          ON ks.k IS NOT DISTINCT FROM nl.k
        LEFT JOIN (SELECT rk, count(*) c FROM r GROUP BY rk) nr
          ON ks.k IS NOT DISTINCT FROM nr.rk
    """).df().sort_values("k").reset_index(drop=True))
    pd.testing.assert_frame_equal(got.astype(exp.dtypes.to_dict()),
                                  exp)


def test_cogroup_validates_clashing_columns():
    left = pa.table({"k": pa.array([1], pa.int64()),
                     "v": pa.array([1], pa.int64())})
    right = pa.table({"rk": pa.array([1], pa.int64()),
                      "v": pa.array([2], pa.int64())})
    with pytest.raises(ValueError, match="both sides"):
        cogroup(ray.data.from_arrow(left),
                ray.data.from_arrow(right), on="k", right_on="rk",
                kernel=lambda a, b: a)
