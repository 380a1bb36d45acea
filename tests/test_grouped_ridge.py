"""Many-model grouped ridge (stages/regress.py:grouped_ridge) vs the
serial replay; planted per-group model recovery; partition invariance."""

import numpy as np
import pyarrow as pa
import ray

from _oracle_replays import replay_grouped_ridge
from featurebox_ray.stages.regress import grouped_ridge


def _mk(rng, n, d, n_grp):
    x = rng.uniform(-1, 1, (n, d))
    g = rng.integers(0, n_grp, n)
    # per-group planted coefficients + intercept
    w = rng.uniform(-2, 2, (n_grp, d))
    b = rng.uniform(-1, 1, n_grp)
    y = (x * w[g]).sum(axis=1) + b[g] + rng.normal(0, 0.01, n)
    return x, y, g, w, b


def test_grouped_ridge_matches_replay_and_recovers():
    rng = np.random.default_rng(276)
    n, d, n_grp = 1200, 6, 4
    x, y, g, w, b = _mk(rng, n, d, n_grp)
    # the table stores float32; the replay must quantize the SAME
    # values the engine reads back, so round-trip through f32 first
    vecs = [row.astype(np.float32).astype(np.float64).tolist()
            for row in x]
    vecs[5] = None            # NULL rows must drop
    ylist = list(y)
    ylist[9] = None
    glist = [int(v) for v in g]
    glist[11] = None
    exp = replay_grouped_ridge(vecs, ylist, glist, quant_bits=12,
                               y_scale=10000,
                               lam_num=1, lam_den=100000)
    t = pa.table({
        "embedding": pa.array(vecs, pa.list_(pa.float32())),
        "label": pa.array(ylist, pa.float64()),
        "grp": pa.array(glist, pa.int64()),
    })
    prev = None
    for parts in (1, 6):
        ds = ray.data.from_arrow(t)
        if parts > 1:
            ds = ds.repartition(parts)
        got = grouped_ridge(ds, group_col="grp", quant_bits=12,
                            y_scale=10000,
                            lam_num=1, lam_den=100000).to_pandas()
        rows = list(zip(got.group, got.j, got.coef))
        assert [(int(a), int(b_), float(c)) for a, b_, c in rows] == exp
        if prev is not None:
            assert rows == prev
        prev = rows
    # planted recovery: quantization at 12 bits + tiny noise -> close
    got_w = np.array(got.coef).reshape(n_grp, d + 1)
    # float32 storage of x loses ~1e-7; tolerance dominated by noise
    assert np.allclose(got_w[:, :d], w, atol=0.05)
    assert np.allclose(got_w[:, d], b, atol=0.05)


def test_grouped_ridge_negative_group_raises():
    t = pa.table({
        "embedding": pa.array([[0.1, 0.2]], pa.list_(pa.float32())),
        "label": pa.array([1.0], pa.float64()),
        "grp": pa.array([-1], pa.int64()),
    })
    import pytest

    with pytest.raises(Exception):
        grouped_ridge(ray.data.from_arrow(t), group_col="grp")
