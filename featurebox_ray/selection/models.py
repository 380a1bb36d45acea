"""Minimal numpy model zoo + CV utilities for the selection layer.

The container has no scikit-learn, so the reference's estimator surface
(quickmethod model zoo, GridSearchCV scoring — featurebox/selection/
quickmethod.py:44-346, exhaustion.py:74-87) is re-expressed with closed-form
numpy models: OLS/Ridge (exact), plus k-fold CV and r² — sufficient for the
subset-scoring fan-outs, whose parallel structure (not the model class) is
what the engine reproduces.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import numpy as np


class Ridge:
    """Closed-form ridge regression (alpha=0 -> OLS) with intercept."""

    def __init__(self, alpha: float = 1e-6):
        self.alpha = alpha
        self.coef_ = None
        self.intercept_ = 0.0

    def fit(self, X: np.ndarray, y: np.ndarray) -> "Ridge":
        X = np.asarray(X, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        mx = X.mean(axis=0)
        my = y.mean()
        Xc, yc = X - mx, y - my
        A = Xc.T @ Xc + self.alpha * np.eye(X.shape[1])
        self.coef_ = np.linalg.solve(A, Xc.T @ yc)
        self.intercept_ = my - mx @ self.coef_
        return self

    def predict(self, X: np.ndarray) -> np.ndarray:
        return np.asarray(X, dtype=np.float64) @ self.coef_ + self.intercept_


def r2_score(y_true: np.ndarray, y_pred: np.ndarray) -> float:
    y_true = np.asarray(y_true, dtype=np.float64)
    ss_res = float(np.sum((y_true - y_pred) ** 2))
    ss_tot = float(np.sum((y_true - y_true.mean()) ** 2))
    return 1.0 - ss_res / ss_tot if ss_tot > 0 else 0.0


def kfold_indices(n: int, k: int = 5, seed: int = 0) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
    """Deterministic shuffled k-fold split."""
    rng = np.random.default_rng(seed)
    order = rng.permutation(n)
    folds = np.array_split(order, k)
    for i in range(k):
        test = folds[i]
        train = np.concatenate([folds[j] for j in range(k) if j != i])
        yield train, test


def cv_score(X: np.ndarray, y: np.ndarray, *, alpha: float = 1e-6,
             k: int = 5, seed: int = 0) -> float:
    """Mean k-fold r² of Ridge on (X, y) — the per-candidate score the
    selection drivers fan out (analog of GridSearchCV.best_score_)."""
    return cv_score_model(lambda: Ridge(alpha), X, y, k=k, seed=seed)


def _sq_dists(A: np.ndarray, B: np.ndarray) -> np.ndarray:
    """Pairwise squared distances with the >=0 clamp (cancellation can go
    slightly negative); shared by KNN and kernel ridge."""
    d2 = (np.sum(A * A, axis=1)[:, None]
          - 2.0 * A @ B.T + np.sum(B * B, axis=1)[None, :])
    return np.maximum(d2, 0.0)


class KNNRegressor:
    """k-nearest-neighbors regression (reference quickmethod 'KNR-set',
    selection/quickmethod.py:169-175): uniform or inverse-distance
    weights, brute-force vectorized distances (the sandbox corpus sizes
    the selection layer sees are small; ANN-scale search lives in
    stages/ann.py)."""

    def __init__(self, n_neighbors: int = 5, weights: str = "uniform"):
        assert weights in ("uniform", "distance")
        self.k = n_neighbors
        self.weights = weights
        self._X = None
        self._y = None

    def fit(self, X: np.ndarray, y: np.ndarray) -> "KNNRegressor":
        self._X = np.asarray(X, np.float64)
        self._y = np.asarray(y, np.float64)
        return self

    def predict(self, X: np.ndarray) -> np.ndarray:
        X = np.asarray(X, np.float64)
        d2 = _sq_dists(X, self._X)
        k = min(self.k, len(self._y))
        idx = np.argpartition(d2, k - 1, axis=1)[:, :k]
        rows = np.arange(len(X))[:, None]
        if self.weights == "uniform":
            return self._y[idx].mean(axis=1)
        d = np.sqrt(d2[rows, idx])
        w = 1.0 / np.maximum(d, 1e-12)
        return (self._y[idx] * w).sum(axis=1) / w.sum(axis=1)


class KernelRidgeRBF:
    """RBF kernel ridge regression (reference 'KRR-set',
    quickmethod.py:185-191): closed-form dual solve
    ``(K + αI)c = y`` with ``K = exp(-γ‖x-x'‖²)``; γ defaults to
    1/(n_features · var(X)) (sklearn's 'scale' heuristic)."""

    def __init__(self, alpha: float = 1.0, gamma=None):
        self.alpha = alpha
        self.gamma = gamma
        self._X = None
        self._c = None

    def _k(self, A, B):
        return np.exp(-self._g * _sq_dists(A, B))

    def fit(self, X: np.ndarray, y: np.ndarray) -> "KernelRidgeRBF":
        X = np.asarray(X, np.float64)
        y = np.asarray(y, np.float64)
        v = X.var()
        self._g = (self.gamma if self.gamma is not None
                   else 1.0 / (X.shape[1] * (v if v > 0 else 1.0)))
        self._X = X
        K = self._k(X, X)
        self._c = np.linalg.solve(K + self.alpha * np.eye(len(X)), y)
        return self

    def predict(self, X: np.ndarray) -> np.ndarray:
        return self._k(np.asarray(X, np.float64), self._X) @ self._c


class DecisionTreeRegressor:
    """Depth-bounded CART regression tree with exact deterministic splits
    (reference quickmethod tree family, quickmethod.py:176-184 'DTR-set'
    — sklearn-free): per node, every feature's SSE-reduction curve is
    computed vectorized from sorted prefix sums; the best (feature,
    threshold) is chosen by strictly-lower SSE with ascending feature
    scan and first-min threshold, so ties resolve identically on every
    run and machine.  Thresholds are midpoints between distinct
    neighboring values; prediction routes ``x <= thr`` left."""

    def __init__(self, max_depth: int = 5, min_samples_leaf: int = 5):
        self.max_depth = max_depth
        self.min_samples_leaf = min_samples_leaf
        self._tree = None

    @staticmethod
    def _best_split(X: np.ndarray, y: np.ndarray, min_leaf: int):
        n, p = X.shape
        best = None  # (sse, j, thr)
        for j in range(p):
            order = np.argsort(X[:, j], kind="stable")
            xs, ys = X[order, j], y[order]
            cy = np.cumsum(ys)
            cy2 = np.cumsum(ys * ys)
            i = np.arange(min_leaf, n - min_leaf + 1)
            if len(i) == 0:
                continue
            valid = xs[i - 1] < xs[i]
            i = i[valid]
            if len(i) == 0:
                continue
            ly, ly2 = cy[i - 1], cy2[i - 1]
            ry, ry2 = cy[-1] - ly, cy2[-1] - ly2
            sse = (ly2 - ly * ly / i) + (ry2 - ry * ry / (n - i))
            k = int(np.argmin(sse))
            if best is None or sse[k] < best[0]:
                thr = (xs[i[k] - 1] + xs[i[k]]) / 2.0
                best = (float(sse[k]), j, thr)
        return best

    def _build(self, X, y, depth):
        n = len(y)
        mean = float(y.mean())
        if (depth >= self.max_depth or n < 2 * self.min_samples_leaf
                or np.all(y == y[0])):
            return mean
        node_sse = float(np.sum((y - mean) ** 2))
        best = self._best_split(X, y, self.min_samples_leaf)
        if best is None or best[0] >= node_sse:
            return mean
        _, j, thr = best
        left = X[:, j] <= thr
        return (j, thr,
                self._build(X[left], y[left], depth + 1),
                self._build(X[~left], y[~left], depth + 1))

    def fit(self, X: np.ndarray, y: np.ndarray) -> "DecisionTreeRegressor":
        X = np.asarray(X, np.float64)
        y = np.asarray(y, np.float64)
        self._tree = self._build(X, y, 0)
        return self

    def _predict_node(self, node, X, out, idx):
        if not isinstance(node, tuple):
            out[idx] = node
            return
        j, thr, l, r = node
        left = X[idx, j] <= thr
        self._predict_node(l, X, out, idx[left])
        self._predict_node(r, X, out, idx[~left])

    def predict(self, X: np.ndarray) -> np.ndarray:
        X = np.asarray(X, np.float64)
        out = np.empty(len(X))
        self._predict_node(self._tree, X, out, np.arange(len(X)))
        return out


class GradientBoostedTrees:
    """Squared-loss gradient boosting over shallow deterministic CART
    trees (reference 'GBR-set'/'AdaBR-set' family, quickmethod.py:
    193-205): each stage fits the residual, shrunk by ``learning_rate``.
    Fully deterministic (no subsampling)."""

    def __init__(self, n_estimators: int = 50, learning_rate: float = 0.1,
                 max_depth: int = 2, min_samples_leaf: int = 5):
        self.n_estimators = n_estimators
        self.learning_rate = learning_rate
        self.max_depth = max_depth
        self.min_samples_leaf = min_samples_leaf
        self._trees: list = []
        self._base = 0.0

    def fit(self, X: np.ndarray, y: np.ndarray) -> "GradientBoostedTrees":
        X = np.asarray(X, np.float64)
        y = np.asarray(y, np.float64)
        self._base = float(y.mean())
        resid = y - self._base
        self._trees = []
        for _ in range(self.n_estimators):
            t = DecisionTreeRegressor(self.max_depth,
                                      self.min_samples_leaf).fit(X, resid)
            pred = t.predict(X)
            resid = resid - self.learning_rate * pred
            self._trees.append(t)
        return self

    def predict(self, X: np.ndarray) -> np.ndarray:
        X = np.asarray(X, np.float64)
        out = np.full(len(X), self._base)
        for t in self._trees:
            out += self.learning_rate * t.predict(X)
        return out


def quick_models() -> dict:
    """The numpy model zoo (analog of the reference's dict_method_reg
    registry, quickmethod.py:164-230): name -> constructor.  The tree
    family is covered by the deterministic numpy CART/GBT above (the
    sandbox has no sklearn)."""
    return {
        "OLS": lambda: Ridge(alpha=0.0),
        "Ridge": lambda: Ridge(alpha=1e-2),
        "KNR": lambda: KNNRegressor(n_neighbors=5),
        "KNR-dist": lambda: KNNRegressor(n_neighbors=5, weights="distance"),
        "KRR": lambda: KernelRidgeRBF(alpha=1.0),
        "DTR": lambda: DecisionTreeRegressor(max_depth=5),
        "GBR": lambda: GradientBoostedTrees(n_estimators=50,
                                            learning_rate=0.1, max_depth=2),
    }


def cv_score_model(model_factory, X: np.ndarray, y: np.ndarray, *,
                   k: int = 5, seed: int = 0) -> float:
    """Mean k-fold r² for any zoo model (generalizes :func:`cv_score`)."""
    scores = []
    for train, test in kfold_indices(len(y), k, seed):
        m = model_factory().fit(X[train], y[train])
        scores.append(r2_score(y[test], m.predict(X[test])))
    return float(np.mean(scores))
