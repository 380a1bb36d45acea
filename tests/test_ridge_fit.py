"""Distributed ridge (stages/regress.py:fit_ridge) — replay parity,
planted-coefficient recovery at lambda→0."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from _oracle_replays import replay_ridge
from featurebox_ray.stages.regress import fit_ridge


def _emb(seed=139, n=300, d=6):
    rng = np.random.default_rng(seed)
    X = rng.uniform(-1, 1, (n, d))
    beta = np.array([2.0, -1.0, 0.5, 0.0, 3.0, -0.25])
    y = X @ beta + 1.5
    return X, y, beta


def test_ridge_replay_parity_partition_invariant():
    X, y, _ = _emb()
    t = pa.table({"embedding": pa.array([list(r) for r in X],
                                        pa.list_(pa.float32())),
                  "label": pa.array(y, pa.float64())})
    # float32 storage: replay must see the same float32-rounded values
    Xf = np.stack(t["embedding"].to_pandas().values).astype(np.float64)
    exp = replay_ridge(Xf, y, quant_bits=10, y_scale=100, lam_num=1,
                       lam_den=100)
    prev = None
    for parts in (1, 5):
        ds = ray.data.from_arrow(t)
        if parts > 1:
            ds = ds.repartition(parts)
        got = (fit_ridge(ds, lam_num=1, lam_den=100, quant_bits=10,
                         y_scale=100, num_partitions=3)
               .to_pandas().reset_index(drop=True))
        pd.testing.assert_frame_equal(got, exp, check_exact=True)
        if prev is not None:
            assert got.equals(prev)
        prev = got


def test_ridge_recovers_planted_coefficients():
    X, y, beta = _emb(seed=149, n=2000)
    t = pa.table({"embedding": pa.array([list(r) for r in X],
                                        pa.list_(pa.float64())),
                  "label": pa.array(y, pa.float64())})
    got = fit_ridge(ray.data.from_arrow(t), lam_num=1, lam_den=10**6,
                    quant_bits=14, y_scale=10**6).to_pandas()
    coefs = got.coef.values
    # quantization + tiny lambda: within 1e-3 of the planted betas
    assert np.allclose(coefs[:-1], beta, atol=1e-3)
    assert abs(coefs[-1] - 1.5) < 1e-3          # intercept
