"""GridSearchCV analog + method_pack (reference quickmethod.py:316-346):
deterministic grid expansion, Ray-fan-out == serial scores, planted
best-param recovery, and the packed-estimator surfaces."""

import numpy as np
import pytest


def _reg_data(n=80, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, 3))
    y = 2.0 * X[:, 0] - 1.0 * X[:, 2] + rng.normal(0, 0.05, n)
    return X, y


def test_expand_grid_deterministic():
    from featurebox_ray.selection.grid import expand_grid

    got = expand_grid({"a": [1, 2], "b": ["x", "y"]})
    assert got == [{"a": 1, "b": "x"}, {"a": 1, "b": "y"},
                   {"a": 2, "b": "x"}, {"a": 2, "b": "y"}]
    # list-of-dicts blocks concatenate in order (the reference grid shape)
    got2 = expand_grid([{"a": [1]}, {"b": [2, 3]}])
    assert got2 == [{"a": 1}, {"b": 2}, {"b": 3}]
    assert expand_grid([{}]) == [{}]


def test_grid_search_recovers_planted_alpha(ray_session):
    from featurebox_ray.selection.grid import GridSearchCV
    from featurebox_ray.selection.models import Ridge

    X, y = _reg_data()
    gs = GridSearchCV(Ridge(), {"alpha": [1e4, 1e2, 1e-2]}, cv=5)
    gs.fit(X, y)
    # near-noiseless linear target: tiny regularization must win
    assert gs.best_params_ == {"alpha": 1e-2}
    assert gs.best_score_ > 0.99
    assert np.corrcoef(gs.predict(X), y)[0, 1] > 0.99
    assert len(gs.cv_results_["params"]) == 3


def test_grid_search_serial_equals_ray(ray_session):
    from featurebox_ray.selection.grid import GridSearchCV
    from featurebox_ray.selection.models import KNNRegressor

    X, y = _reg_data(seed=3)
    grid = {"n_neighbors": [3, 5, 7], "weights": ["uniform", "distance"]}
    a = GridSearchCV(KNNRegressor(), grid, cv=4).fit(X, y)
    b = GridSearchCV(KNNRegressor(), grid, cv=4, parallel=None).fit(X, y)
    assert a.cv_results_["mean_test_score"] == b.cv_results_["mean_test_score"]
    assert a.best_params_ == b.best_params_


def test_grid_search_classifier_tiebreak(ray_session):
    from featurebox_ray.selection.grid import GridSearchCV
    from featurebox_ray.selection.models import LogisticRegressionClassifier

    rng = np.random.default_rng(7)
    X = rng.normal(size=(150, 2))
    y = np.where(X[:, 0] + X[:, 1] > 0, "hi", "lo")
    gs = GridSearchCV(LogisticRegressionClassifier(),
                      {"C": [1.0, 1.0, 0.5]}, cv=5,
                      scoring="balanced_accuracy")
    gs.fit(X, y)
    assert gs.best_score_ > 0.9
    # duplicate combos score identically -> earliest wins
    scores = gs.cv_results_["mean_test_score"]
    assert scores[0] == scores[1]
    if gs.best_params_["C"] == 1.0:
        assert gs.cv_results_["params"].index(gs.best_params_) == 0
    assert gs.score(X, y) > 0.9  # accuracy fallback on string labels


def test_method_pack_surfaces(ray_session):
    from featurebox_ray.selection.grid import GridSearchCV, method_pack

    X, y = _reg_data(seed=5)
    packed = method_pack(["Ridge", "KNR"], me="reg", gd=True, cv=4)
    assert len(packed) == 2 and all(
        isinstance(p, GridSearchCV) for p in packed)
    packed[0].fit(X, y)
    assert packed[0].best_score_ > 0.9

    cvs = method_pack(["Ridge"], me="reg", gd=False, cv=4)
    s = cvs[0](X, y)
    assert isinstance(s, float) and s > 0.9

    clf_pack = method_pack(["LogR"], me="clf", gd=True, cv=4)
    assert clf_pack[0].scoring == "balanced_accuracy"

    with pytest.raises(KeyError):
        method_pack(["NOPE"], me="reg")
    with pytest.raises(ValueError):
        method_pack(me="wat")


def test_grid_search_in_pipeline(ray_session):
    """GridSearchCV slots into Pipeline as the final estimator (the
    reference's scaler -> GridSearchCV(est) composition)."""
    from featurebox_ray.functions.pipeline import Pipeline, StandardScaler
    from featurebox_ray.selection.grid import GridSearchCV
    from featurebox_ray.selection.models import Ridge

    X, y = _reg_data(seed=8)
    pipe = Pipeline([("scale", StandardScaler()),
                     ("gs", GridSearchCV(Ridge(), {"alpha": [10.0, 1e-3]},
                                         cv=4))])
    pipe.fit(X, y)
    assert pipe.score(X, y) > 0.99
    assert pipe["gs"].best_params_ == {"alpha": 1e-3}
