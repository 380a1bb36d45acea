"""Product-quantization encoding (stages/pq.py)."""

import numpy as np
import pyarrow as pa
import pytest
import ray

from featurebox_ray.stages.cohesion import quantize_half_up
from featurebox_ray.stages.pq import pq_encode


def _vectors(rng, n=200, dim=32):
    return rng.normal(size=(n, dim)).astype(np.float32)


def _serial_pq(vecs, ids, m, k, qb):
    order = np.argsort(ids)
    cb = quantize_half_up(vecs[order[:k]].astype(np.float64), qb)
    xq = quantize_half_up(vecs.astype(np.float64), qb)
    sub = vecs.shape[1] // m
    codes = np.zeros((len(vecs), m), np.int64)
    for i in range(len(vecs)):
        for s in range(m):
            d = ((xq[i, s * sub:(s + 1) * sub]
                  - cb[:, s * sub:(s + 1) * sub]) ** 2).sum(axis=1)
            codes[i, s] = int(np.argmin(d))
    return codes


def test_pq_matches_serial():
    rng = np.random.default_rng(3)
    vecs = _vectors(rng)
    ids = np.arange(200, dtype=np.int64)
    rng.shuffle(ids)
    t = pa.table({"vec_id": pa.array(ids),
                  "embedding": pa.array(list(vecs),
                                        pa.list_(pa.float32()))})
    want = _serial_pq(vecs, ids, m=4, k=16, qb=10)
    got = (pq_encode(ray.data.from_arrow(t).repartition(4), m=4, k=16,
                     quant_bits=10)
           .to_pandas().set_index("vec_id").loc[ids])
    for s in range(4):
        assert (got[f"c{s}"].to_numpy() == want[:, s]).all()
    packed = sum(want[:, s] * (16 ** s) for s in range(4))
    assert (got["pq_code"].to_numpy() == packed).all()
    # codebook members encode to themselves (distance 0)
    order = np.argsort(ids)
    for j, row in enumerate(order[:16]):
        assert got.loc[ids[row], "pq_code"] == sum(
            want[row, s] * 16 ** s for s in range(4))


def test_pq_validation():
    rng = np.random.default_rng(0)
    vecs = _vectors(rng, n=8, dim=30)  # 30 % 4 != 0
    t = pa.table({"vec_id": pa.array(np.arange(8, dtype=np.int64)),
                  "embedding": pa.array(list(vecs),
                                        pa.list_(pa.float32()))})
    with pytest.raises(Exception, match="not divisible|at least"):
        pq_encode(ray.data.from_arrow(t), m=4, k=4).to_pandas()
    with pytest.raises(Exception, match="at least"):
        pq_encode(ray.data.from_arrow(t), m=2, k=16).to_pandas()
