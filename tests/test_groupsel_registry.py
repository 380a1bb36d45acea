"""GS/UGS group selection, expression promotion, feature registry."""

import itertools

import numpy as np
import pytest
import ray

from featurebox_ray.functions.expr import apply_expression
from featurebox_ray.registry import FeatureRegistry, FeatureSpec
from featurebox_ray.selection.groupsel import (
    GroupSelect, UnionGroupSelect, calinski_harabasz, dbscan)


@pytest.fixture(scope="module")
def planted():
    rng = np.random.default_rng(11)
    X = rng.normal(size=(250, 6))
    # two redundant copies of the signal column -> equivalent subsets
    X[:, 3] = X[:, 1] * 1.0 + rng.normal(0, 1e-6, 250)
    y = 2.0 * X[:, 1] + rng.normal(0, 0.05, 250)
    return X, y


def test_dbscan_basic():
    pts = np.array([0.0, 0.1, 0.2, 5.0, 5.1, 9.0])
    D = np.abs(pts[:, None] - pts[None, :])
    labels = dbscan(D, eps=0.5, min_samples=2)
    assert labels[0] == labels[1] == labels[2]
    assert labels[3] == labels[4] != labels[0]
    assert labels[5] == -1  # noise


def test_group_select_clusters_equivalent_subsets(planted):
    X, y = planted
    subsets = [(1,), (3,), (0,), (2,), (1, 3)]
    gs = GroupSelect(seed=0).fit(X, y, subsets)
    # (1,) and (3,) predict nearly identically -> same cluster
    lab = {s: gs.labels_[i] for i, s in enumerate(subsets)}
    assert lab[(1,)] == lab[(3,)]
    assert gs.scores_[0] > 0.99
    # representatives contain a high-scoring subset
    best_rep_scores = [gs.scores_[subsets.index(r)] for r in gs.representatives_
                       if r in subsets]
    assert max(best_rep_scores) > 0.99


def test_union_group_select_ranking(planted):
    X, y = planted
    subsets = list(itertools.combinations(range(6), 1))
    ugs = UnionGroupSelect().fit(X, y, subsets)
    top_subset, top_score = ugs.ranking_[0]
    assert top_subset in {(1,), (3,)}
    assert top_score > 0.99


def test_apply_expression(tiny_dir):
    ds = ray.data.read_parquet(f"{tiny_dir}/transcripts")
    from featurebox_ray.stages.scalar import add_scalar_features

    ds = add_scalar_features(ds)
    expr = ("mul", ("x", 0), ("x", 1))
    out = apply_expression(ds, expr, columns=["text_len", "n_tokens"],
                           out_col="len_x_tokens")
    df = out.limit(100).to_pandas()
    assert np.allclose(df["len_x_tokens"],
                       df["text_len"].astype(float) * df["n_tokens"].astype(float))


def test_registry_fold_unfold():
    reg = FeatureRegistry()
    reg.add(FeatureSpec("text_len"))
    reg.add_many(["lag1_v", "lag2_v"], group="lags_v", stage="window")
    reg.add_many(["roll5_mean_v", "roll5_std_v"], group="roll5_v", stage="window")
    assert reg.fold() == ["text_len", "lags_v", "roll5_v"]
    assert reg.unfold(["lags_v", "text_len"]) == ["lag1_v", "lag2_v", "text_len"]
    with pytest.raises(ValueError):
        reg.add(FeatureSpec("text_len"))
    import pyarrow as pa

    t = pa.table({"text_len": pa.array([1.0]), "lag1_v": pa.array([1.0]),
                  "lag2_v": pa.array([1.0]), "roll5_mean_v": pa.array([1.0]),
                  "roll5_std_v": pa.array([1.0])})
    assert reg.validate_table(t) == []
    t2 = t.drop_columns(["lag2_v"])
    assert any("missing" in p for p in reg.validate_table(t2))


def test_model_zoo_knn_and_kernel_ridge():
    """KNR/KRR numpy models: KNN matches a hand-rolled neighbor average;
    kernel ridge interpolates smooth planted functions far better than a
    linear fit; every zoo entry runs through generic CV."""
    import numpy as np

    from featurebox_ray.selection.models import (
        KernelRidgeRBF, KNNRegressor, Ridge, cv_score_model, quick_models,
        r2_score)

    rng = np.random.default_rng(9)
    X = rng.uniform(-2, 2, size=(250, 2))
    y = np.sin(X[:, 0]) * X[:, 1]  # nonlinear: linear r2 is poor

    knn = KNNRegressor(n_neighbors=3).fit(X[:200], y[:200])
    pred = knn.predict(X[200:])
    # manual check of one query point
    q = X[200]
    d = np.sum((X[:200] - q) ** 2, axis=1)
    want = y[:200][np.argsort(d)[:3]].mean()
    assert pred[0] == pytest.approx(want)

    krr = KernelRidgeRBF(alpha=1e-3).fit(X[:200], y[:200])
    r2_krr = r2_score(y[200:], krr.predict(X[200:]))
    r2_lin = r2_score(y[200:], Ridge(1e-6).fit(X[:200], y[:200])
                      .predict(X[200:]))
    assert r2_krr > 0.95 > r2_lin + 0.3

    for name, factory in quick_models().items():
        s = cv_score_model(factory, X, y, k=3)
        assert np.isfinite(s), name
