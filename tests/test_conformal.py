"""Split-conformal intervals (stages/regress.py:conformal_intervals)
vs the serial replay; coverage sanity on a planted model; partition
invariance."""

import numpy as np
import pyarrow as pa
import pytest
import ray

from _oracle_replays import replay_conformal
from featurebox_ray.stages.regress import conformal_intervals


def _table(n=2000, d=4, seed=278, sigma=0.2):
    rng = np.random.default_rng(seed)
    x = rng.uniform(-1, 1, (n, d)).astype(np.float32)
    w = rng.uniform(-2, 2, d)
    y = x.astype(np.float64) @ w + 1.0 + rng.normal(0, sigma, n)
    vecs = [row.astype(np.float64).tolist() for row in x]
    return vecs, list(y), list(range(n))


def test_conformal_matches_replay_partition_invariant():
    vecs, ys, ids = _table()
    vecs[2] = None
    ys[4] = None
    ids[6] = None
    kw = dict(quant_bits=10, y_scale=1000, coef_bits=14,
              lam_num=1, lam_den=1000)
    exp = replay_conformal(vecs, ys, ids, **kw)[0]
    t = pa.table({
        "embedding": pa.array(vecs, pa.list_(pa.float32())),
        "label": pa.array(ys, pa.float64()),
        "vid": pa.array(ids, pa.int64()),
    })
    prev = None
    for parts in (1, 6):
        ds = ray.data.from_arrow(t)
        if parts > 1:
            ds = ds.repartition(parts)
        got = conformal_intervals(ds, id_col="vid",
                                  **kw).to_pandas()
        row = (int(got.n_train[0]), int(got.n_cal[0]),
               int(got.n_test[0]), float(got.q_hat[0]),
               float(got.coverage[0]), float(got.target[0]))
        assert row == exp
        if prev is not None:
            assert row == prev
        prev = row
    # conformal guarantee: coverage should land near (>=-ish) 0.9
    assert got.coverage[0] > 0.85
    assert got.target[0] == 0.9
    # threshold should be on the noise scale, not the y scale
    assert 0.1 < got.q_hat[0] < 1.5


def test_conformal_alpha_too_small_raises():
    vecs, ys, ids = _table(n=40)
    t = pa.table({
        "embedding": pa.array(vecs, pa.list_(pa.float32())),
        "label": pa.array(ys, pa.float64()),
        "vid": pa.array(ids, pa.int64()),
    })
    # alpha = 1/1000 with ~10 calibration rows -> infinite interval
    with pytest.raises(Exception):
        conformal_intervals(ray.data.from_arrow(t), id_col="vid",
                            alpha_num=1, alpha_den=1000,
                            y_scale=1000, coef_bits=14)
