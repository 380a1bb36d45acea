"""Pipeline composition object (sklearn Pipeline surface, §2.13): the
chained fit/transform must reproduce the step-by-step result exactly,
for numpy estimators and for Dataset-level transformers."""

import numpy as np
import pandas as pd
import pytest


def _planted(n=200, seed=4):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, 3)) * np.array([100.0, 0.01, 1.0])
    y = 3.0 * X[:, 0] / 100.0 - 5.0 * X[:, 1] * 100.0 + rng.normal(0, 0.1, n)
    return X, y


def test_pipeline_matches_manual_chaining():
    from featurebox_ray.functions.pipeline import Pipeline, StandardScaler
    from featurebox_ray.selection.models import Ridge

    X, y = _planted()
    pipe = Pipeline([("scale", StandardScaler()), ("ridge", Ridge(1e-2))])
    pipe.fit(X, y)
    pred = pipe.predict(X)

    sc = StandardScaler().fit(X)
    manual = Ridge(1e-2).fit(sc.transform(X), y).predict(sc.transform(X))
    np.testing.assert_array_equal(pred, manual)
    assert pipe.score(X, y) > 0.99


def test_pipeline_classifier_and_params():
    from featurebox_ray.functions.pipeline import Pipeline, StandardScaler
    from featurebox_ray.selection.models import (
        LogisticRegressionClassifier, accuracy_score)

    rng = np.random.default_rng(9)
    X = rng.normal(size=(300, 3))
    y = np.where(X[:, 0] - X[:, 1] > 0, "p", "n")
    pipe = Pipeline([("scale", StandardScaler()),
                     ("clf", LogisticRegressionClassifier(C=1.0))])
    pipe.fit(X, y)
    assert accuracy_score(y, pipe.predict(X)) > 0.95
    # score() on a string-label estimator without .score -> accuracy
    assert pipe.score(X, y) > 0.95
    # named access + params routing
    assert pipe["clf"] is pipe.named_steps["clf"]
    assert pipe.get_params()["clf__C"] == 1.0
    pipe.set_params(clf__C=0.5)
    assert pipe["clf"].C == 0.5
    with pytest.raises(ValueError):
        pipe.set_params(nope__x=1)


def test_pipeline_facade_end_to_end():
    """scale -> SymbolLearning chained through Pipeline == the same two
    steps run by hand (the reference's scaler+learner composition)."""
    from featurebox_ray.functions.pipeline import Pipeline, StandardScaler
    from featurebox_ray.functions.skflow import SymbolLearning

    rng = np.random.default_rng(11)
    X = rng.uniform(1.0, 2.0, size=(120, 3))
    y = 2.0 * (X[:, 0] + X[:, 1]) + 1.0
    mk = dict(pop=40, gens=3, seed=0)
    pipe = Pipeline([("scale", StandardScaler(with_std=False)),
                     ("sl", SymbolLearning(**mk))])
    pipe.fit(X, y)
    p1 = pipe.predict(X)

    sc = StandardScaler(with_std=False).fit(X)
    sl = SymbolLearning(**mk).fit(sc.transform(X), y)
    np.testing.assert_array_equal(p1, sl.predict(sc.transform(X)))


def test_pipeline_validates_steps():
    from featurebox_ray.functions.pipeline import Pipeline
    from featurebox_ray.selection.models import Ridge

    with pytest.raises(TypeError):
        Pipeline([("r", Ridge()), ("r2", Ridge())])  # no transform mid-chain
    with pytest.raises(ValueError):
        Pipeline([])
    with pytest.raises(ValueError):
        Pipeline([("a", "passthrough"), ("a", Ridge())])


def test_pipeline_dataset_level_transformer(ray_session):
    """A Dataset-level step (MagnitudeNormalizer, y-less fit) chains the
    same as direct use."""
    import ray

    from featurebox_ray.functions.pipeline import Pipeline
    from featurebox_ray.stages.normalize import MagnitudeNormalizer

    df = pd.DataFrame({"a": [1200.0, 3400.0, 900.0, 5600.0],
                       "b": [0.02, 0.04, 0.01, 0.03]})
    ds = ray.data.from_pandas(df)
    pipe = Pipeline([("mag", MagnitudeNormalizer(["a", "b"]))])
    out = pipe.fit(ds).transform(ds).to_pandas()
    direct = MagnitudeNormalizer(["a", "b"]).fit(ds).transform(ds).to_pandas()
    pd.testing.assert_frame_equal(out, direct)
    assert out["a"].abs().max() <= 1.0
