"""Error-policy wrapper (ref on_errors featurizers/base.py:96-101,228-249),
PreMap generation bias (ref symbol/probability/preference.py), and
y/constant magnitude transforms (ref preprocess.py:90-170)."""

import numpy as np
import pyarrow as pa
import pytest
import ray

from featurebox_ray.functions.expr import PreMap, _random_tree
from featurebox_ray.stages.errors import robust_kernel
from featurebox_ray.stages.normalize import MagnitudeNormalizer


def _fragile(batch: pa.Table) -> pa.Table:
    v = batch["v"].to_numpy(zero_copy_only=False)
    if (v < 0).any():
        raise ValueError("negative value")
    return batch.append_column("sqrt_v", pa.array(np.sqrt(v)))


def test_error_policy_nan():
    t = pa.table({"id": pa.array([0, 1, 2, 3]),
                  "v": pa.array([4.0, -1.0, 9.0, 16.0])})
    out = robust_kernel(_fragile, on_errors="nan")(t)
    df = out.to_pandas()
    assert df["__errors"].tolist() == [0, 1, 0, 0]
    assert np.allclose(df.loc[[0, 2, 3], "sqrt_v"], [2.0, 3.0, 4.0])
    assert np.isnan(df.loc[1, "sqrt_v"])
    assert df.loc[1, "id"] == 1  # input columns carried through


def test_error_policy_keep_and_raise():
    t = pa.table({"id": pa.array([0, 1]), "v": pa.array([1.0, -2.0])})
    out = robust_kernel(_fragile, on_errors="keep")(t).to_pandas()
    assert "negative value" in out.loc[1, "__error_msg"]
    assert out.loc[0, "__error_msg"] is None
    with pytest.raises(Exception):
        robust_kernel(_fragile, on_errors="raise")(t)


def test_error_policy_clean_batch_passthrough():
    t = pa.table({"id": pa.array([0]), "v": pa.array([4.0])})
    out = robust_kernel(_fragile, on_errors="nan")(t).to_pandas()
    assert out["__errors"].tolist() == [0]
    assert out["sqrt_v"].tolist() == [2.0]


def test_error_policy_in_ray_pipeline(tiny_dir):
    ds = ray.data.read_parquet(f"{tiny_dir}/transcripts").limit(500)

    def poison(batch: pa.Table) -> pa.Table:
        if (pa.compute.utf8_length(batch["text"]).to_numpy(
                zero_copy_only=False) > 100).any():
            raise RuntimeError("doc too long")
        return batch.append_column(
            "ok_len", pa.compute.utf8_length(batch["text"]).cast(pa.int64()))

    out = ds.map_batches(robust_kernel(poison, on_errors="nan"),
                         batch_format="pyarrow", batch_size=64).to_pandas()
    assert len(out) == 500
    assert (out["__errors"] == 1).sum() > 0  # some long docs exist
    assert (out["__errors"] == 0).sum() > 0


def test_premap_row_stochastic_and_bias():
    pm = PreMap(4)
    assert np.allclose(pm.P.sum(axis=1), 1.0)
    pm.down(0, 1, 0.1)
    assert np.allclose(pm.P.sum(axis=1), 1.0)  # reference invariant
    assert pm.P[0, 1] < pm.P[0, 2]
    rng = np.random.default_rng(0)
    draws = [pm.draw(rng, 0) for _ in range(2000)]
    # terminal 1 drawn much less often after terminal 0
    assert draws.count(1) < draws.count(2) * 0.5
    # generation runs with a premap
    tree = _random_tree(rng, 4, 3, ["sq"], ["add", "mul"], pm)
    assert tree[0] in ("x", "sq", "add", "mul")


def test_magnitude_y_and_constants():
    # reference ger_magnitude parity: 1234.5 -> 10**4 (divide-by-10 loop
    # counts to c=4), 0.02 -> 10**-2, 300 -> 10**3, 1 -> 10**-1, -5 -> 1
    n = MagnitudeNormalizer(["v"]).fit_y(y_mean=1234.5)
    assert n.scale_y == 10000.0
    y = np.array([10000.0, 20000.0])
    assert np.allclose(n.transform_y(y), [1.0, 2.0])
    assert np.allclose(n.inverse_transform_y(n.transform_y(y)), y)
    out = MagnitudeNormalizer(["v"]).fit_transform_constants(
        [0.02, 300.0, 1.0, -5.0])
    assert np.allclose(out, [2.0, 0.3, 10.0, -5.0])


def test_premap_marginal_weights():
    """Reference per-terminal prob map: weighted marginals bias the first
    draw and seed the conditional rows."""
    from featurebox_ray.functions.expr import PreMap

    pm = PreMap(3, weights=[8, 1, 1])
    rng = np.random.default_rng(0)
    draws = [pm.draw(rng, None) for _ in range(400)]
    assert draws.count(0) > 250
    # conditional rows start proportional to the marginals
    assert pm.P[1, 0] > pm.P[1, 1]
    # down() still renormalizes rows
    pm.down(0, 0, 0.1)
    assert np.allclose(pm.P.sum(axis=1), 1.0)
