"""K-step sequential funnel (stages/funnel.py:funnel_path)."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest
import ray

from featurebox_ray.stages.funnel import funnel_path

H = 50  # horizon in native units (plain int64 ts -> us convention)


def test_funnel_path_vs_duckdb_fuzz():
    rng = np.random.default_rng(17)
    n = 900
    tys = np.array(["a", "b", "c", "x"])[rng.integers(0, 4, n)]
    t = pa.table({
        "u": pa.array(rng.integers(0, 30, n), pa.int64()),
        "ts": pa.array(rng.integers(0, 200, n), pa.int64()),
        "ty": pa.array(tys, pa.string()),
    })
    con = duckdb.connect()
    con.register("t", t)
    want = con.execute(f"""
        WITH e AS (SELECT u, ts, ty FROM t WHERE ts IS NOT NULL),
        s1 AS (SELECT u, min(ts) t1 FROM e WHERE ty='a' GROUP BY u),
        s2 AS (SELECT e.u, min(e.ts) t2 FROM e JOIN s1 USING (u)
               WHERE e.ty='b' AND e.ts > s1.t1
                 AND e.ts <= s1.t1 + {H} GROUP BY e.u),
        s3 AS (SELECT e.u, min(e.ts) t3
               FROM e JOIN s1 USING (u) JOIN s2 USING (u)
               WHERE e.ty='c' AND e.ts > s2.t2
                 AND e.ts <= s1.t1 + {H} GROUP BY e.u)
        SELECT s1.u, s1.t1, s2.t2, s3.t3,
               CAST(1 + CASE WHEN s2.u IS NOT NULL THEN 1 ELSE 0 END
                      + CASE WHEN s3.u IS NOT NULL THEN 1 ELSE 0 END
                    AS BIGINT) steps_completed
        FROM s1 LEFT JOIN s2 USING (u) LEFT JOIN s3 USING (u)
        ORDER BY u
    """).fetch_arrow_table().to_pandas()
    for parts in (2, 5):
        got = (funnel_path(ray.data.from_arrow(t).repartition(4),
                           key_col="u", ts_col="ts", type_col="ty",
                           steps=["a", "b", "c"],
                           horizon_s=H / 1e6,  # native-unit convention
                           num_partitions=parts)
               .to_pandas().sort_values("u").reset_index(drop=True))
        assert got["u"].tolist() == want["u"].tolist()
        for c in ("t1", "t2", "t3"):
            g, w = got[c], want[c]
            assert (g.isna() == w.isna()).all()
            assert (g.dropna().to_numpy()
                    == w.dropna().to_numpy()).all()
        assert got["steps_completed"].tolist() == \
            want["steps_completed"].tolist()


def test_funnel_path_semantics():
    # b at the same ts as a does NOT count (strictly after); horizon
    # cuts the c step
    t = pa.table({
        "u": pa.array([1, 1, 1, 1, 2, 2], pa.int64()),
        "ts": pa.array([10, 10, 20, 100, 5, 6], pa.int64()),
        "ty": pa.array(["a", "b", "b", "c", "a", "c"]),
    })
    got = (funnel_path(ray.data.from_arrow(t), key_col="u",
                       ts_col="ts", type_col="ty",
                       steps=["a", "b", "c"], horizon_s=50 / 1e6)
           .to_pandas().sort_values("u").reset_index(drop=True))
    assert got["u"].tolist() == [1, 2]
    assert got["t1"].tolist() == [10, 5]
    assert got["t2"].tolist()[0] == 20          # not the ts=10 b
    assert got["steps_completed"].tolist() == [2, 1]  # c@100 > 10+50;
    # user 2 has no b, so its c cannot count either
    with pytest.raises(Exception, match="at least 2"):
        funnel_path(ray.data.from_arrow(t), key_col="u", ts_col="ts",
                    type_col="ty", steps=["a"], horizon_s=1)
