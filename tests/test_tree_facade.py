"""Tree-family models (deterministic numpy CART / gradient boosting) and
the SymbolLearning estimator facade."""

import numpy as np
import pytest


def _planted_nonlinear(n=400, seed=3):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, 4))
    y = (2.0 * (X[:, 0] > 0) + 3.0 * (X[:, 1] > 0.5)
         + rng.normal(0, 0.05, n))
    return X, y


def test_tree_beats_ridge_on_planted_nonlinear():
    from featurebox_ray.selection.models import (cv_score, cv_score_model,
                                                 quick_models)

    X, y = _planted_nonlinear()
    zoo = quick_models()
    tree = cv_score_model(zoo["DTR"], X, y)
    gbr = cv_score_model(zoo["GBR"], X, y)
    ridge = cv_score(X, y, alpha=1e-2)
    assert tree > ridge + 0.1
    assert gbr > ridge + 0.1
    assert tree > 0.9


def test_tree_determinism_and_structure():
    from featurebox_ray.selection.models import DecisionTreeRegressor

    X, y = _planted_nonlinear(seed=11)
    p1 = DecisionTreeRegressor(max_depth=4).fit(X, y).predict(X)
    p2 = DecisionTreeRegressor(max_depth=4).fit(X, y).predict(X)
    np.testing.assert_array_equal(p1, p2)
    # a depth-1 stump on a step target recovers the step
    Xs = np.linspace(-1, 1, 100).reshape(-1, 1)
    ys = (Xs[:, 0] > 0).astype(float)
    stump = DecisionTreeRegressor(max_depth=1, min_samples_leaf=5).fit(Xs, ys)
    j, thr, left, right = stump._tree
    assert j == 0 and abs(thr) < 0.03
    assert left == pytest.approx(0.0) and right == pytest.approx(1.0)


def test_boosting_reduces_train_error_monotonically_enough():
    from featurebox_ray.selection.models import (DecisionTreeRegressor,
                                                 GradientBoostedTrees)

    X, y = _planted_nonlinear(seed=5)
    shallow = DecisionTreeRegressor(max_depth=1).fit(X, y)
    gbr = GradientBoostedTrees(n_estimators=40, learning_rate=0.2,
                               max_depth=1).fit(X, y)
    e_shallow = float(np.mean((y - shallow.predict(X)) ** 2))
    e_gbr = float(np.mean((y - gbr.predict(X)) ** 2))
    assert e_gbr < e_shallow / 2


def test_exhaustion_with_tree_model_finds_planted_subset(ray_session):
    from featurebox_ray.selection.search import Exhaustion

    X, y = _planted_nonlinear()
    ex = Exhaustion(n_select=(2,), model="DTR").fit(X, y)
    assert ex.best_subset_ == (0, 1)
    assert ex.best_score_ > 0.9
    # string name and factory resolve to the same result
    from featurebox_ray.selection.models import DecisionTreeRegressor

    ex2 = Exhaustion(n_select=(2,),
                     model=lambda: DecisionTreeRegressor(max_depth=5)).fit(X, y)
    assert ex2.best_subset_ == ex.best_subset_
    assert ex2.best_score_ == pytest.approx(ex.best_score_)


def test_groupselect_with_model(ray_session):
    from featurebox_ray.selection.groupsel import GroupSelect

    X, y = _planted_nonlinear()
    subsets = [(0,), (1,), (2,), (3,), (0, 1)]
    gs = GroupSelect(seed=0, model="DTR").fit(X, y, subsets)
    assert len(gs.labels_) == len(subsets)
    # the nonlinear-capable model scores the true pair far above noise
    assert gs.scores_[4] > 0.9
    assert gs.scores_[2] < 0.2


def test_symbol_learning_facade_roundtrip(ray_session):
    from featurebox_ray.functions.skflow import SymbolLearning

    rng = np.random.default_rng(2)
    X = rng.normal(size=(150, 3))
    y = X[:, 0] * X[:, 1]
    sl = SymbolLearning(loop="MultiMutateLoop", pop=120, gens=12,
                        depth=2, seed=4)
    sl.fit(X, y)
    assert sl.expr_ is not None and sl.expr_str_
    assert sl.score(X, y) > 0.99
    # estimator protocol
    params = sl.get_params()
    assert params["loop"] == "MultiMutateLoop"
    sl.set_params(gens=5)
    assert sl.gens == 5
    with pytest.raises(ValueError):
        sl.set_params(nonsense=1)
    # transform appends exactly one fitted-feature column
    T = sl.transform(X)
    assert T.shape == (150, 4)
    np.testing.assert_allclose(T[:, 3], sl.predict(X))
    # unknown loop rejected
    with pytest.raises(ValueError, match="unknown loop"):
        SymbolLearning(loop="NopeLoop").fit(X, y)


def test_symbol_learning_grouped_terminals(ray_session):
    from featurebox_ray.functions.skflow import SymbolLearning

    rng = np.random.default_rng(9)
    X = rng.normal(size=(120, 4))
    # target: sum of the packed group (madd over gx0 = x0..x1)
    y = X[:, 0] + X[:, 1]
    sl = SymbolLearning(loop="BaseLoop", pop=80, gens=10, depth=2,
                        un_ops=("madd",), bin_ops=("add", "sub"),
                        x_group=[[0, 1], [2, 3]], seed=1)
    sl.fit(X, y)
    assert sl.score(X, y) > 0.99
