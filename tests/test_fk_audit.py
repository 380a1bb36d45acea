"""FK audit (stages/profile.py:fk_audit) vs a DuckDB NOT EXISTS
replay; NULL-key children count as orphans."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from featurebox_ray.stages.profile import fk_audit


def test_fk_audit_duckdb_fuzz():
    rng = np.random.default_rng(571)
    parents = list(range(0, 200, 2))        # even ids only
    child = [None if rng.random() < 0.03
             else int(rng.integers(0, 200)) for _ in range(1500)]
    pdf_c = pd.DataFrame({"k": child})
    pdf_p = pd.DataFrame({"pk": parents})
    con = duckdb.connect()
    con.register("c", pdf_c)
    con.register("p", pdf_p)
    exp = con.sql("""
        SELECT CAST(count(*) AS BIGINT) AS n_child,
               CAST(sum(CASE WHEN NOT EXISTS (
                   SELECT 1 FROM p WHERE p.pk = c.k)
                   THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans
        FROM c""").df().iloc[0]
    tc = pa.table({"k": pa.array(child, pa.int64())})
    tp = pa.table({"pk": pa.array(parents, pa.int64())})
    got = fk_audit(ray.data.from_arrow(tc).repartition(7),
                   ray.data.from_arrow(tp),
                   child_key="k", parent_key="pk",
                   relation="c->p", num_partitions=4).to_pandas()
    r = got.iloc[0]
    assert r["n_child"] == exp["n_child"]
    assert r["n_orphans"] == exp["n_orphans"]
    assert r["orphan_share"] == (float(exp["n_orphans"])
                                 / float(exp["n_child"]))


def test_fk_audit_clean_relation():
    tc = pa.table({"k": pa.array([2, 4, 2], pa.int64())})
    tp = pa.table({"pk": pa.array([2, 4], pa.int64())})
    got = fk_audit(ray.data.from_arrow(tc), ray.data.from_arrow(tp),
                   child_key="k", parent_key="pk",
                   relation="clean").to_pandas().iloc[0]
    assert got["n_orphans"] == 0
    assert got["orphan_share"] == 0.0
