"""Classifier zoo (reference dict_method_clf, selection/quickmethod.py:
44-163): planted-fixture recovery + deterministic behavior + the
Exhaustion driver scoring classification targets with stratified-CV
accuracy."""

import numpy as np


def _planted_linear_boundary(n=400, seed=7):
    """Binary labels from a planted linear boundary on (x0, x1); x2/x3
    are noise features."""
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, 4))
    z = 1.5 * X[:, 0] - 2.0 * X[:, 1] + 0.3
    y = (z + rng.normal(0, 0.2, n) > 0).astype(np.int64)
    return X, y


def _planted_axis_split(n=300, seed=5):
    """Labels from a planted axis-aligned split on x1 at 0.25."""
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, 3))
    y = (X[:, 1] > 0.25).astype(np.int64)
    return X, y


def test_logistic_recovers_planted_boundary():
    from featurebox_ray.selection.models import (
        LogisticRegressionClassifier, accuracy_score)

    X, y = _planted_linear_boundary()
    m = LogisticRegressionClassifier(C=1.0).fit(X, y)
    assert accuracy_score(y, m.predict(X)) > 0.95
    # recovered direction ~ parallel to the planted (1.5, -2.0) normal
    w = m.coef_[0, :2]
    cos = w @ np.array([1.5, -2.0]) / (
        np.linalg.norm(w) * np.linalg.norm([1.5, -2.0]))
    assert cos > 0.99
    # noise features carry little weight
    assert np.all(np.abs(m.coef_[0, 2:]) < 0.2 * np.abs(m.coef_[0, :2]).min())
    # deterministic
    m2 = LogisticRegressionClassifier(C=1.0).fit(X, y)
    np.testing.assert_array_equal(m.coef_, m2.coef_)


def test_cart_classifier_recovers_planted_axis_split():
    from featurebox_ray.selection.models import DecisionTreeClassifier

    X, y = _planted_axis_split()
    m = DecisionTreeClassifier(max_depth=1, min_samples_leaf=5).fit(X, y)
    # the stump splits on feature 1 near the planted threshold
    j, thr, left, right = m._tree
    assert j == 1
    assert abs(thr - 0.25) < 0.15
    assert left != right
    np.testing.assert_array_equal(m.predict(X), y)


def test_knn_gbc_perceptron_on_planted_boundary():
    from featurebox_ray.selection.models import (accuracy_score,
                                                 quick_models_clf)

    X, y = _planted_linear_boundary(seed=13)
    zoo = quick_models_clf()
    for name in ("KNC", "KNC-dist", "GBC", "Per", "TreeC"):
        m = zoo[name]().fit(X, y)
        acc = accuracy_score(y, m.predict(X))
        assert acc > 0.85, (name, acc)


def test_multiclass_ovr_paths():
    from featurebox_ray.selection.models import (
        GradientBoostedClassifier, KNNClassifier,
        LogisticRegressionClassifier, PerceptronClassifier,
        accuracy_score)

    rng = np.random.default_rng(2)
    centers = np.array([[0.0, 0.0], [4.0, 0.0], [0.0, 4.0]])
    X = np.concatenate([c + rng.normal(0, 0.5, (60, 2)) for c in centers])
    y = np.repeat(np.array(["a", "b", "c"]), 60)
    for cls in (LogisticRegressionClassifier, KNNClassifier,
                PerceptronClassifier, GradientBoostedClassifier):
        m = cls().fit(X, y)
        pred = m.predict(X)
        assert set(pred) <= {"a", "b", "c"}
        assert accuracy_score(y, pred) > 0.95, cls.__name__


def test_stratified_kfold_deterministic_and_stratified():
    from featurebox_ray.selection.models import stratified_kfold_indices

    y = np.array([0] * 30 + [1] * 10)
    folds1 = list(stratified_kfold_indices(y, 5))
    folds2 = list(stratified_kfold_indices(y, 5))
    all_test = np.concatenate([t for _, t in folds1])
    # a partition: every index in exactly one test fold
    np.testing.assert_array_equal(np.sort(all_test), np.arange(40))
    for (tr1, te1), (tr2, te2) in zip(folds1, folds2):
        np.testing.assert_array_equal(te1, te2)
        np.testing.assert_array_equal(tr1, tr2)
    for tr, te in folds1:
        # each fold keeps the 3:1 class ratio
        assert (y[te] == 0).sum() == 6 and (y[te] == 1).sum() == 2
        assert len(np.intersect1d(tr, te)) == 0


def test_balanced_accuracy():
    from featurebox_ray.selection.models import balanced_accuracy_score

    y = np.array([0, 0, 0, 0, 1])
    # majority-class guesser: recall 1.0 on class 0, 0.0 on class 1
    assert balanced_accuracy_score(y, np.zeros(5)) == 0.5


def test_exhaustion_classification_scoring(ray_session):
    """Exhaustion(model='LogR') finds the informative feature pair of a
    planted boundary, scoring stratified-CV accuracy."""
    from featurebox_ray.selection.search import Exhaustion

    X, y = _planted_linear_boundary(n=300, seed=21)
    ex = Exhaustion(n_select=(2,), model="LogR", k=4).fit(X, y)
    assert ex.best_subset_ == (0, 1)
    assert ex.best_score_ > 0.9
    # explicit scoring override round-trips
    ex2 = Exhaustion(n_select=(2,), model="TreeC",
                     scoring="balanced_accuracy", k=4).fit(X, y)
    assert ex2.best_subset_ == (0, 1)
