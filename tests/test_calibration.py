"""Calibration bins (stages/regress.py:calibration_bins) vs a DuckDB
replay; perfect-calibration sanity."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from featurebox_ray.stages.regress import calibration_bins

ORACLE = """
    WITH q AS (
      SELECT CAST(least(floor(pred * {nb}), {nb} - 1) AS BIGINT)
               AS bin,
             CAST(floor(pred * {sc} + 0.5) AS BIGINT) AS pq, label
      FROM t WHERE pred IS NOT NULL AND label IS NOT NULL
        AND pred >= 0 AND pred <= 1),
    s AS (SELECT bin, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(pq) AS BIGINT) AS sum_pred_q,
                 CAST(sum(label) AS BIGINT) AS sum_label
          FROM q GROUP BY bin)
    SELECT bin, n, sum_pred_q, sum_label,
           CAST(sum_pred_q AS DOUBLE) / CAST(n AS DOUBLE) / {sc}.0
             AS avg_pred,
           CAST(sum_label AS DOUBLE) / CAST(n AS DOUBLE) AS avg_label,
           abs(CAST(sum_pred_q AS DOUBLE) / CAST(n AS DOUBLE) / {sc}.0
               - CAST(sum_label AS DOUBLE) / CAST(n AS DOUBLE)) AS gap
    FROM s ORDER BY bin
"""


def test_calibration_duckdb_fuzz_partition_invariant():
    rng = np.random.default_rng(97)
    n = 2000
    pred = rng.uniform(-0.1, 1.1, n)          # some out-of-range rows
    pred[rng.choice(n, 15, replace=False)] = np.nan
    lab = (rng.uniform(size=n) < np.clip(pred, 0, 1)).astype(float)
    lab[rng.choice(n, 15, replace=False)] = np.nan
    pdf = pd.DataFrame({"pred": pred, "label": lab})
    con = duckdb.connect()
    con.register("t", pdf.astype({"label": "Int64"}))
    exp = con.sql(ORACLE.format(nb=8, sc=1 << 9)).df().reset_index(
        drop=True)
    t = pa.table({"pred": pa.array(pred, pa.float64(),
                                   mask=np.isnan(pred)),
                  "label": pa.array(pd.array(lab, dtype="Int64"))})
    prev = None
    for parts in (1, 6):
        ds = ray.data.from_arrow(t)
        if parts > 1:
            ds = ds.repartition(parts)
        got = (calibration_bins(ds, pred_col="pred", label_col="label",
                                n_bins=8, quant_bits=9)
               .to_pandas().reset_index(drop=True))
        pd.testing.assert_frame_equal(got.astype(exp.dtypes.to_dict()),
                                      exp)
        if prev is not None:
            assert got.equals(prev)
        prev = got
    # labels drawn with P(label)=pred -> gaps should be smallish
    assert (got.gap < 0.25).all()


def test_calibration_perfect_hand_case():
    # two bins, each perfectly calibrated
    t = pa.table({
        "pred": pa.array([0.25, 0.25, 0.25, 0.25, 0.75, 0.75, 0.75,
                          0.75], pa.float64()),
        "label": pa.array([0, 0, 0, 1, 1, 1, 1, 0], pa.int64()),
    })
    got = calibration_bins(ray.data.from_arrow(t), pred_col="pred",
                           label_col="label", n_bins=2,
                           quant_bits=10).to_pandas()
    assert got.bin.tolist() == [0, 1]
    assert got.avg_pred.tolist() == [0.25, 0.75]
    assert got.avg_label.tolist() == [0.25, 0.75]
    assert got.gap.tolist() == [0.0, 0.0]
