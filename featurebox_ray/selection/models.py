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
    scores = []
    for train, test in kfold_indices(len(y), k, seed):
        m = Ridge(alpha).fit(X[train], y[train])
        scores.append(r2_score(y[test], m.predict(X[test])))
    return float(np.mean(scores))
