"""Best-F1 threshold sweep (stages/regress.py:pr_threshold_sweep) vs a
DuckDB cumulative-window replay; hand case; partition invariance."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from featurebox_ray.stages.regress import pr_threshold_sweep

ORACLE = """
    WITH e AS (SELECT grp, y, s FROM t
               WHERE grp IS NOT NULL AND y IS NOT NULL
                 AND s IS NOT NULL),
    g AS (SELECT grp, CAST(sum(y) AS BIGINT) AS npos
          FROM e GROUP BY grp),
    c AS (SELECT grp, s,
                 CAST(sum(sum(y)) OVER (
                   PARTITION BY grp ORDER BY s DESC) AS BIGINT) AS tp,
                 CAST(sum(count(*)) OVER (
                   PARTITION BY grp ORDER BY s DESC) AS BIGINT)
                     AS cnt_ge
          FROM e GROUP BY grp, s),
    f AS (SELECT c.grp, c.s AS threshold, tp,
                 cnt_ge - tp AS fp, g.npos - tp AS fn,
                 CAST(tp AS DOUBLE) / CAST(cnt_ge AS DOUBLE)
                     AS precision,
                 CAST(tp AS DOUBLE) / CAST(g.npos AS DOUBLE) AS recall,
                 CAST(2 * tp AS DOUBLE) / CAST(cnt_ge + g.npos
                                               AS DOUBLE) AS f1
          FROM c JOIN g USING (grp) WHERE g.npos > 0)
    SELECT grp, threshold, tp, fp, fn, precision, recall, f1
    FROM f
    QUALIFY row_number() OVER (
      PARTITION BY grp ORDER BY f1 DESC, threshold ASC) = 1
    ORDER BY grp
"""


def test_pr_sweep_duckdb_fuzz_partition_invariant():
    rng = np.random.default_rng(274)
    n = 4000
    grp = rng.integers(0, 7, n).astype(float)
    s = rng.integers(-20, 20, n).astype(float)  # heavy score ties
    # label correlated with score so the sweep is non-trivial
    y = (rng.uniform(-25, 25, n) < s).astype(float)
    for a in (grp, s, y):
        a[rng.choice(n, 25, replace=False)] = np.nan
    grp[grp == 6] = np.nan  # plus one group fully nulled elsewhere
    # one group with zero positives -> must be absent from the output
    y[np.nan_to_num(grp, nan=-1) == 5] = 0.0
    pdf = pd.DataFrame({"grp": pd.array(grp, dtype="Int64"),
                        "y": pd.array(y, dtype="Int64"),
                        "s": pd.array(s, dtype="Int64")})
    con = duckdb.connect()
    con.register("t", pdf)
    exp = con.sql(ORACLE).df().reset_index(drop=True)
    assert 5 not in set(exp.grp)
    t = pa.Table.from_pandas(pdf, preserve_index=False)
    prev = None
    for parts in (1, 5):
        ds = ray.data.from_arrow(t)
        if parts > 1:
            ds = ds.repartition(parts)
        got = (pr_threshold_sweep(ds, key_col="grp", label_col="y",
                                  score_col="s", num_partitions=4)
               .to_pandas().sort_values("grp")
               .reset_index(drop=True))
        pd.testing.assert_frame_equal(
            got.astype(exp.dtypes.to_dict()), exp)
        if prev is not None:
            assert got.equals(prev)
        prev = got


def test_pr_sweep_hand_case():
    # scores 3,2,1; labels 1,0,1 -> thresholds: t=3 f1=2/3;
    # t=2: tp=1 fp=1 fn=1 f1=0.5; t=1: tp=2 fp=1 f1=0.8 -> best t=1
    t = pa.table({
        "g": pa.array([0, 0, 0], pa.int64()),
        "y": pa.array([1, 0, 1], pa.int64()),
        "s": pa.array([3, 2, 1], pa.int64()),
    })
    got = pr_threshold_sweep(ray.data.from_arrow(t), key_col="g",
                             label_col="y", score_col="s").to_pandas()
    assert got.threshold.tolist() == [1]
    assert got.tp.tolist() == [2] and got.fp.tolist() == [1]
    assert got.fn.tolist() == [0]
    assert got.f1.tolist() == [0.8]


def test_pr_sweep_tie_prefers_lower_threshold():
    # two thresholds with identical (tp, fp, fn) -> identical f1;
    # the lower threshold must win on both sides
    t = pa.table({
        "g": pa.array([0] * 4, pa.int64()),
        "y": pa.array([1, 1, 0, 0], pa.int64()),
        "s": pa.array([10, 9, 2, 1], pa.int64()),
    })
    got = pr_threshold_sweep(ray.data.from_arrow(t), key_col="g",
                             label_col="y", score_col="s").to_pandas()
    # t=9: tp=2 fp=0 fn=0 f1=1.0 is unique best
    assert got.threshold.tolist() == [9]
    assert got.f1.tolist() == [1.0]
