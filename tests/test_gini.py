"""Per-group Gini diversity (stages/profile.py:group_gini) vs replay."""

import numpy as np
import pyarrow as pa
import pytest
import ray

from featurebox_ray.stages.profile import group_gini


def _serial(groups, vals):
    cells, tot = {}, {}
    for g, v in zip(groups, vals):
        cells[(g, v)] = cells.get((g, v), 0) + 1
        tot[g] = tot.get(g, 0) + 1
    out = {}
    for g, n in tot.items():
        s2 = sum(c * c for (gg, _), c in cells.items() if gg == g)
        out[g] = (n, float(n * n - s2) / float(n * n))
    return out


def test_group_gini_matches_serial_replay():
    rng = np.random.default_rng(7)
    groups = rng.integers(0, 20, 600).tolist()
    vals = rng.choice(["a", "b", "c", "d", None], 600,
                      p=[.4, .3, .2, .05, .05]).tolist()
    expect = _serial(groups, vals)
    t = pa.table({"g": pa.array(groups, pa.int64()),
                  "v": pa.array(vals)})
    for parts in (1, 9):
        ds = ray.data.from_arrow(t)
        if parts > 1:
            ds = ds.repartition(parts)
        res = group_gini(ds, group_col="g", value_col="v",
                         num_partitions=5).to_pandas()
        got = {r.g: (r.n, r.gini) for r in res.itertuples()}
        assert got == expect  # bit-exact, any partitioning


def test_group_gini_edge_groups():
    # single-value group -> gini 0; all-distinct group -> 1 - 1/n
    t = pa.table({"g": pa.array(["mono"] * 5 + ["multi"] * 4),
                  "v": pa.array(["x"] * 5 + ["a", "b", "c", "d"])})
    res = group_gini(ray.data.from_arrow(t), group_col="g",
                     value_col="v").to_pandas().set_index("g")
    assert res.loc["mono", "gini"] == 0.0
    assert res.loc["multi", "gini"] == (16.0 - 4.0) / 16.0
