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


def quick_models() -> dict:
    """The numpy model zoo (analog of the reference's dict_method_reg
    registry, quickmethod.py:164-230): name -> constructor.  sklearn's
    tree/boosting ensembles have no closed numpy form and the sandbox has
    no sklearn — documented out of scope (SURVEY §2.9)."""
    return {
        "OLS": lambda: Ridge(alpha=0.0),
        "Ridge": lambda: Ridge(alpha=1e-2),
        "KNR": lambda: KNNRegressor(n_neighbors=5),
        "KNR-dist": lambda: KNNRegressor(n_neighbors=5, weights="distance"),
        "KRR": lambda: KernelRidgeRBF(alpha=1.0),
    }


def cv_score_model(model_factory, X: np.ndarray, y: np.ndarray, *,
                   k: int = 5, seed: int = 0) -> float:
    """Mean k-fold r² for any zoo model (generalizes :func:`cv_score`)."""
    scores = []
    for train, test in kfold_indices(len(y), k, seed):
        m = model_factory().fit(X[train], y[train])
        scores.append(r2_score(y[test], m.predict(X[test])))
    return float(np.mean(scores))
