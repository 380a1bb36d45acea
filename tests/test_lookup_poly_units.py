"""Direct unit coverage for stages/lookup.py and stages/poly.py —
previously exercised only through the gate pipelines (q13/q14), which
left them invisible to the unit suite (the cdc.py clobber lesson:
every module needs at least one direct test import)."""

import numpy as np
import pyarrow as pa
import ray

from featurebox_ray.stages.lookup import (BroadcastTable,
                                          add_depart_lookup)
from featurebox_ray.stages.poly import (add_poly_features,
                                        degree_tuples,
                                        poly_feature_names)


def test_poly_degree_tuples_and_features():
    # all-zero tuple excluded (sum > 0), reference polyfeature order
    assert degree_tuples(2, (0, 1)) == [(0, 1), (1, 0), (1, 1)]
    assert poly_feature_names(["a", "b"], (0, 1)) == ["b", "a", "a*b"]
    t = pa.table({"a": pa.array([2.0, 3.0]),
                  "b": pa.array([4.0, 5.0])})
    out = add_poly_features(ray.data.from_arrow(t), ["a", "b"],
                            degrees=(0, 1)).to_pandas()
    assert np.allclose(out["poly:a*b"], [8.0, 15.0])
    assert np.allclose(out["poly:a"], [2.0, 3.0])


def test_lookup_depart_broadcast_and_nan_fill():
    dim = pa.table({"key": pa.array([1, 2], pa.int64()),
                    "w": pa.array([10.0, 20.0])})
    facts = pa.table({"k": pa.array([2, 1, 2, None], pa.int64()),
                      "x": pa.array([1.0, 2.0, 3.0, 4.0])})
    out = (add_depart_lookup(ray.data.from_arrow(facts), dim,
                             key_col="k", prefix="d")
           .to_pandas().sort_values("x"))
    got = out["d_w"].tolist()
    assert got[:3] == [20.0, 10.0, 20.0]
    assert np.isnan(got[3])                     # NULL key -> NaN
    # BroadcastTable direct: unknown keys -> NaN rows
    bt = BroadcastTable(dim)
    rows = bt.rows_for(pa.chunked_array([pa.array([2, 99], pa.int64())]))
    assert rows[0, 0] == 20.0 and np.isnan(rows[1, 0])
