"""winsorize (stages/binning.py) edge semantics."""

import numpy as np
import pyarrow as pa
import ray

from featurebox_ray.stages.binning import winsorize


def _run(tbl, **kw):
    return winsorize(ray.data.from_arrow(tbl), **kw).to_pandas()


def test_winsorize_clips_to_group_edges():
    vals = list(range(1, 21))            # group A: 1..20
    tbl = pa.table({
        "g": pa.array(["A"] * 20 + ["B"] * 3),
        "v": pa.array([float(x) for x in vals] + [100.0, 200.0, 300.0]),
    })
    out = _run(tbl, group_col="g", value_col="v", q_lo=0.25, q_hi=0.75,
               num_partitions=2)
    a = out[out.g == "A"].sort_values("v")
    # quantile_disc rank: max(ceil(q*n)-1, 0) -> p25 = element 4 (=5.0),
    # p75 = element 14 (=15.0)
    assert a["value_w"].min() == 5.0 and a["value_w"].max() == 15.0
    assert (a["value_w"] == np.clip(a["v"], 5.0, 15.0)).all()
    b = out[out.g == "B"]
    assert b["value_w"].min() == 100.0 and b["value_w"].max() == 300.0
    # interior values pass through untouched (exact substitution)
    assert out[out.v == 10.0]["value_w"].iloc[0] == 10.0


def test_winsorize_null_value_and_unknown_group():
    tbl = pa.table({
        "g": pa.array(["A", "A", "A", None]),
        "v": pa.array([1.0, 2.0, None, 50.0]),
    })
    out = _run(tbl, group_col="g", value_col="v", q_lo=0.05, q_hi=0.95,
               num_partitions=1)
    assert out["value_w"].isna().tolist()[2]       # null value stays null
    # null group: no edges -> pass-through
    assert out.loc[3, "value_w"] == 50.0
