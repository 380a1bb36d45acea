"""Distributed PCA (stages/pca.py) — bit-exact vs serial replay."""

import numpy as np
import pyarrow as pa
import pytest
import ray

from featurebox_ray.stages.pca import (_finish_fit, _project_serial,
                                       _quantized_int, pca_fit,
                                       pca_fit_transform)


def _make(n=400, d=16, seed=7):
    rng = np.random.default_rng(seed)
    # anisotropic data: a few dominant directions
    basis = rng.normal(size=(d, d))
    scales = np.concatenate([[10.0, 5.0, 2.0], np.full(d - 3, 0.3)])
    x = (rng.normal(size=(n, d)) * scales) @ basis / (3 * d)
    t = pa.table({"vec_id": pa.array(np.arange(n, dtype=np.int64)),
                  "embedding": pa.array(list(x.astype(np.float32)))})
    return t, x


def _serial_replay(t, n_components, quant_bits, proj_bits):
    qi = _quantized_int(t, "embedding", quant_bits)
    n, d = qi.shape
    g = qi.T @ qi
    cs = qi.sum(axis=0)
    comps, _ = _finish_fit(g, cs, n, d, quant_bits, n_components)
    return _project_serial(qi, cs, n, comps, quant_bits, proj_bits)


def test_pca_bit_exact_vs_serial_and_partition_invariant():
    t, _ = _make()
    want = _serial_replay(t, 3, 10, 20)
    for parts in (2, 7):
        got = (pca_fit_transform(ray.data.from_arrow(t).repartition(parts),
                                 n_components=3, num_partitions=3)
               .to_pandas().sort_values("vec_id").reset_index(drop=True))
        m = got[["pc1", "pc2", "pc3"]].to_numpy(np.float64)
        assert (m == want).all(), "not bit-exact vs serial replay"


def test_pca_recovers_dominant_directions():
    t, x = _make(n=800, d=16, seed=11)
    comps, mean, n, cs = pca_fit(ray.data.from_arrow(t).repartition(4),
                                 n_components=3)
    assert n == 800 and comps.shape == (16, 3)
    # engine components ~ numpy PCA on the float data (quantization is
    # 2^-10; directions agree to ~1e-2 in |cos|)
    xf = np.vstack(t["embedding"].to_pylist()).astype(np.float64)
    xc = xf - xf.mean(axis=0)
    _, _, vt = np.linalg.svd(xc, full_matrices=False)
    for c in range(3):
        cos = abs(float(vt[c] @ comps[:, c]))
        assert cos > 0.99, (c, cos)
    # projected variance decreases by component
    got = pca_fit_transform(ray.data.from_arrow(t),
                            n_components=3).to_pandas()
    v = got[["pc1", "pc2", "pc3"]].to_numpy(np.float64).var(axis=0)
    assert v[0] > v[1] > v[2]
    # sign convention: largest-|entry| of each component positive
    for c in range(3):
        j = int(np.argmax(np.abs(comps[:, c])))
        assert comps[j, c] > 0


def test_pca_guards():
    t, _ = _make(n=1)
    with pytest.raises(ValueError, match="at least 2"):
        pca_fit(ray.data.from_arrow(t))
