"""Minimal numpy model zoo + CV utilities for the selection layer.

The container has no scikit-learn, so the reference's estimator surface
(quickmethod model zoo, GridSearchCV scoring — featurebox/selection/
quickmethod.py:44-346, exhaustion.py:74-87) is re-expressed with closed-form
numpy models: OLS/Ridge (exact), plus k-fold CV and r² — sufficient for the
subset-scoring fan-outs, whose parallel structure (not the model class) is
what the engine reproduces.
"""

from __future__ import annotations

import inspect

from typing import Iterator, Tuple

import numpy as np


class ParamsMixin:
    """sklearn-style get_params/set_params derived from the __init__
    signature (every zoo model stores its constructor args under the
    same attribute names), so the models compose with
    :class:`featurebox_ray.functions.pipeline.Pipeline` param routing."""

    def get_params(self, deep: bool = True) -> dict:
        sig = inspect.signature(type(self).__init__)
        return {k: getattr(self, k) for k in sig.parameters
                if k != "self" and hasattr(self, k)}

    def set_params(self, **params):
        valid = set(self.get_params())
        for k, v in params.items():
            if k not in valid:
                raise ValueError(
                    f"unknown parameter {k!r} for {type(self).__name__}; "
                    f"one of {sorted(valid)}")
            setattr(self, k, v)
        return self


class Ridge(ParamsMixin):
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


class KNNRegressor(ParamsMixin):
    """k-nearest-neighbors regression (reference quickmethod 'KNR-set',
    selection/quickmethod.py:169-175): uniform or inverse-distance
    weights, brute-force vectorized distances (the sandbox corpus sizes
    the selection layer sees are small; ANN-scale search lives in
    stages/ann.py)."""

    def __init__(self, n_neighbors: int = 5, weights: str = "uniform"):
        assert weights in ("uniform", "distance")
        self.n_neighbors = n_neighbors
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
        k = min(self.n_neighbors, len(self._y))
        idx = np.argpartition(d2, k - 1, axis=1)[:, :k]
        rows = np.arange(len(X))[:, None]
        if self.weights == "uniform":
            return self._y[idx].mean(axis=1)
        d = np.sqrt(d2[rows, idx])
        w = 1.0 / np.maximum(d, 1e-12)
        return (self._y[idx] * w).sum(axis=1) / w.sum(axis=1)


class KernelRidgeRBF(ParamsMixin):
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


class DecisionTreeRegressor(ParamsMixin):
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
                # when the two neighbors are 1 ulp apart the midpoint can
                # round up to xs[i[k]]; routing x <= thr would then send
                # every row left and recurse on an empty right child
                if thr >= xs[i[k]]:
                    thr = xs[i[k] - 1]
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


class GradientBoostedTrees(ParamsMixin):
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


# ---------------------------------------------------------------------------
# classification (reference dict_method_clf, quickmethod.py:44-163)
# ---------------------------------------------------------------------------


def accuracy_score(y_true: np.ndarray, y_pred: np.ndarray) -> float:
    y_true = np.asarray(y_true)
    return float(np.mean(y_true == np.asarray(y_pred))) if len(y_true) else 0.0


def balanced_accuracy_score(y_true: np.ndarray, y_pred: np.ndarray) -> float:
    """Mean per-class recall (the reference's 'balanced_accuracy' scoring
    for KNC/GPC/GBC sets, quickmethod.py:50,75,104)."""
    y_true = np.asarray(y_true)
    y_pred = np.asarray(y_pred)
    recalls = []
    for c in np.unique(y_true):
        m = y_true == c
        recalls.append(float(np.mean(y_pred[m] == c)))
    return float(np.mean(recalls)) if recalls else 0.0


def stratified_kfold_indices(y: np.ndarray, k: int = 5
                             ) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
    """Deterministic stratified k-fold (the reference's
    ``StratifiedKFold(5, shuffle=False)``, quickmethod.py:49 etc.):
    each class's indices, in order of appearance, are split into k
    near-equal contiguous chunks; fold i's test set is the union of
    chunk i over classes.  No randomness at all."""
    y = np.asarray(y)
    n = len(y)
    per_class = [np.flatnonzero(y == c) for c in np.unique(y)]
    chunks = [np.array_split(idx, k) for idx in per_class]
    for i in range(k):
        test = np.sort(np.concatenate([c[i] for c in chunks]))
        mask = np.ones(n, dtype=bool)
        mask[test] = False
        yield np.flatnonzero(mask), test


class LogisticRegressionClassifier(ParamsMixin):
    """L2-regularized logistic regression fit by IRLS/Newton (reference
    'LogR-L1' set, quickmethod.py:143-148 — the sandbox has no liblinear;
    the deterministic Newton solve replaces it, penalty fixed to L2).
    Binary directly; >2 classes one-vs-rest (liblinear's multiclass
    strategy).  Fully deterministic: starts at w=0, fixed iteration cap,
    convergence on the Newton step norm."""

    def __init__(self, C: float = 1.0, max_iter: int = 100,
                 tol: float = 1e-8):
        self.C = C
        self.max_iter = max_iter
        self.tol = tol
        self.classes_ = None
        self.coef_ = None        # (n_classes_eff, p)
        self.intercept_ = None   # (n_classes_eff,)

    def _fit_binary(self, X: np.ndarray, t: np.ndarray) -> np.ndarray:
        n, p = X.shape
        Xb = np.hstack([X, np.ones((n, 1))])
        lam = 1.0 / self.C
        w = np.zeros(p + 1)
        reg = lam * np.eye(p + 1)
        reg[-1, -1] = 0.0  # intercept unpenalized (liblinear-style)
        for _ in range(self.max_iter):
            z = Xb @ w
            mu = 1.0 / (1.0 + np.exp(-np.clip(z, -500, 500)))
            s = np.maximum(mu * (1.0 - mu), 1e-10)
            grad = Xb.T @ (mu - t) + reg @ w
            H = (Xb * s[:, None]).T @ Xb + reg + 1e-12 * np.eye(p + 1)
            step = np.linalg.solve(H, grad)
            w = w - step
            if float(np.max(np.abs(step))) < self.tol:
                break
        return w

    def fit(self, X: np.ndarray, y: np.ndarray
            ) -> "LogisticRegressionClassifier":
        X = np.asarray(X, np.float64)
        y = np.asarray(y)
        self.classes_ = np.unique(y)
        if len(self.classes_) == 2:
            w = self._fit_binary(X, (y == self.classes_[1]).astype(np.float64))
            self.coef_ = w[None, :-1]
            self.intercept_ = w[-1:]
        else:
            ws = [self._fit_binary(X, (y == c).astype(np.float64))
                  for c in self.classes_]
            W = np.stack(ws)
            self.coef_, self.intercept_ = W[:, :-1], W[:, -1]
        return self

    def decision_function(self, X: np.ndarray) -> np.ndarray:
        return np.asarray(X, np.float64) @ self.coef_.T + self.intercept_

    def predict(self, X: np.ndarray) -> np.ndarray:
        d = self.decision_function(X)
        if len(self.classes_) == 2:
            return self.classes_[(d[:, 0] > 0).astype(int)]
        return self.classes_[np.argmax(d, axis=1)]


class KNNClassifier(ParamsMixin):
    """k-nearest-neighbors vote (reference 'KNC-set',
    quickmethod.py:47-56): uniform or inverse-distance weights; vote
    ties break to the LOWEST class label (deterministic on every run)."""

    def __init__(self, n_neighbors: int = 5, weights: str = "uniform"):
        assert weights in ("uniform", "distance")
        self.n_neighbors = n_neighbors
        self.weights = weights
        self._X = None
        self._yi = None
        self.classes_ = None

    def fit(self, X: np.ndarray, y: np.ndarray) -> "KNNClassifier":
        self._X = np.asarray(X, np.float64)
        y = np.asarray(y)
        self.classes_, self._yi = np.unique(y, return_inverse=True)
        return self

    def predict(self, X: np.ndarray) -> np.ndarray:
        X = np.asarray(X, np.float64)
        d2 = _sq_dists(X, self._X)
        k = min(self.n_neighbors, len(self._yi))
        idx = np.argpartition(d2, k - 1, axis=1)[:, :k]
        rows = np.arange(len(X))[:, None]
        lab = self._yi[idx]                       # (m, k) class indices
        if self.weights == "uniform":
            w = np.ones_like(lab, dtype=np.float64)
        else:
            w = 1.0 / np.maximum(np.sqrt(d2[rows, idx]), 1e-12)
        votes = np.zeros((len(X), len(self.classes_)))
        for c in range(len(self.classes_)):
            votes[:, c] = np.where(lab == c, w, 0.0).sum(axis=1)
        # argmax takes the FIRST (lowest-label) max: deterministic ties
        return self.classes_[np.argmax(votes, axis=1)]


class DecisionTreeClassifier(ParamsMixin):
    """Depth-bounded Gini CART (reference 'TreeC-em',
    quickmethod.py:82-90 — sklearn-free): per node, every feature's
    weighted-Gini curve comes from per-class one-hot prefix sums over the
    sorted column; best (feature, threshold) by strictly-lower impurity,
    ascending feature scan, first-min threshold — identical tie behavior
    to :class:`DecisionTreeRegressor`.  Leaves predict the majority
    class (lowest label on count ties)."""

    def __init__(self, max_depth: int = 5, min_samples_leaf: int = 5):
        self.max_depth = max_depth
        self.min_samples_leaf = min_samples_leaf
        self._tree = None
        self.classes_ = None

    @staticmethod
    def _best_split(X: np.ndarray, yi: np.ndarray, n_classes: int,
                    min_leaf: int):
        n, p = X.shape
        onehot = np.zeros((n, n_classes))
        onehot[np.arange(n), yi] = 1.0
        best = None  # (weighted_gini, j, thr)
        for j in range(p):
            order = np.argsort(X[:, j], kind="stable")
            xs = X[order, j]
            cc = np.cumsum(onehot[order], axis=0)     # (n, C) class counts
            i = np.arange(min_leaf, n - min_leaf + 1)
            if len(i) == 0:
                continue
            valid = xs[i - 1] < xs[i]
            i = i[valid]
            if len(i) == 0:
                continue
            lc = cc[i - 1]                            # left counts (m, C)
            rc = cc[-1][None, :] - lc
            nl = i.astype(np.float64)
            nr = (n - i).astype(np.float64)
            gl = 1.0 - np.sum((lc / nl[:, None]) ** 2, axis=1)
            gr = 1.0 - np.sum((rc / nr[:, None]) ** 2, axis=1)
            wg = nl * gl + nr * gr
            k = int(np.argmin(wg))
            if best is None or wg[k] < best[0]:
                thr = (xs[i[k] - 1] + xs[i[k]]) / 2.0
                if thr >= xs[i[k]]:   # 1-ulp midpoint round-up guard
                    thr = xs[i[k] - 1]
                best = (float(wg[k]), j, thr)
        return best

    def _leaf(self, yi: np.ndarray) -> int:
        counts = np.bincount(yi, minlength=len(self.classes_))
        return int(np.argmax(counts))  # first max -> lowest label on ties

    def _build(self, X, yi, depth):
        n = len(yi)
        if (depth >= self.max_depth or n < 2 * self.min_samples_leaf
                or np.all(yi == yi[0])):
            return self._leaf(yi)
        counts = np.bincount(yi, minlength=len(self.classes_))
        node_gini = n * (1.0 - np.sum((counts / n) ** 2))
        best = self._best_split(X, yi, len(self.classes_),
                                self.min_samples_leaf)
        if best is None or best[0] >= node_gini:
            return self._leaf(yi)
        _, j, thr = best
        left = X[:, j] <= thr
        return (j, thr,
                self._build(X[left], yi[left], depth + 1),
                self._build(X[~left], yi[~left], depth + 1))

    def fit(self, X: np.ndarray, y: np.ndarray) -> "DecisionTreeClassifier":
        X = np.asarray(X, np.float64)
        y = np.asarray(y)
        self.classes_, yi = np.unique(y, return_inverse=True)
        self._tree = self._build(X, yi, 0)
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
        out = np.empty(len(X), dtype=np.int64)
        self._predict_node(self._tree, X, out, np.arange(len(X)))
        return self.classes_[out]


class GradientBoostedClassifier(ParamsMixin):
    """Logistic-loss gradient boosting over shallow deterministic CART
    regression trees (reference 'GBC-em', quickmethod.py:92-105): binary
    directly (stages fit the gradient y - sigmoid(F)); >2 classes
    one-vs-rest over binary boosters.  Deterministic (no subsampling)."""

    def __init__(self, n_estimators: int = 50, learning_rate: float = 0.1,
                 max_depth: int = 2, min_samples_leaf: int = 5):
        self.n_estimators = n_estimators
        self.learning_rate = learning_rate
        self.max_depth = max_depth
        self.min_samples_leaf = min_samples_leaf
        self.classes_ = None
        self._boosters = []   # per class (or one for binary): (f0, [trees])

    def _fit_binary(self, X: np.ndarray, t: np.ndarray):
        pbar = float(np.clip(t.mean(), 1e-10, 1 - 1e-10))
        f0 = float(np.log(pbar / (1.0 - pbar)))
        F = np.full(len(t), f0)
        trees = []
        for _ in range(self.n_estimators):
            p = 1.0 / (1.0 + np.exp(-F))
            tree = DecisionTreeRegressor(
                self.max_depth, self.min_samples_leaf).fit(X, t - p)
            F = F + self.learning_rate * tree.predict(X)
            trees.append(tree)
        return f0, trees

    def fit(self, X: np.ndarray, y: np.ndarray
            ) -> "GradientBoostedClassifier":
        X = np.asarray(X, np.float64)
        y = np.asarray(y)
        self.classes_ = np.unique(y)
        if len(self.classes_) == 2:
            self._boosters = [self._fit_binary(
                X, (y == self.classes_[1]).astype(np.float64))]
        else:
            self._boosters = [self._fit_binary(
                X, (y == c).astype(np.float64)) for c in self.classes_]
        return self

    def _score_one(self, booster, X):
        f0, trees = booster
        F = np.full(len(X), f0)
        for t in trees:
            F += self.learning_rate * t.predict(X)
        return F

    def predict(self, X: np.ndarray) -> np.ndarray:
        X = np.asarray(X, np.float64)
        if len(self.classes_) == 2:
            return self.classes_[
                (self._score_one(self._boosters[0], X) > 0).astype(int)]
        S = np.stack([self._score_one(b, X) for b in self._boosters], axis=1)
        return self.classes_[np.argmax(S, axis=1)]


class PerceptronClassifier(ParamsMixin):
    """Deterministic perceptron (reference 'Per-L1',
    quickmethod.py:135-141, minus the L1 shrinkage): fixed epoch count,
    rows visited in dataset order (no shuffling), binary ±1 update;
    >2 classes one-vs-rest.  Features are centered/scaled internally so
    the fixed learning rate behaves across feature scales."""

    def __init__(self, max_iter: int = 50, eta0: float = 1.0):
        self.max_iter = max_iter
        self.eta0 = eta0
        self.classes_ = None
        self._W = None
        self._mx = None
        self._sx = None

    def _fit_binary(self, X: np.ndarray, t: np.ndarray) -> np.ndarray:
        n, p = X.shape
        w = np.zeros(p + 1)
        for _ in range(self.max_iter):
            changed = False
            for i in range(n):
                z = X[i] @ w[:-1] + w[-1]
                if t[i] * z <= 0:
                    w[:-1] += self.eta0 * t[i] * X[i]
                    w[-1] += self.eta0 * t[i]
                    changed = True
            if not changed:
                break
        return w

    def fit(self, X: np.ndarray, y: np.ndarray) -> "PerceptronClassifier":
        X = np.asarray(X, np.float64)
        y = np.asarray(y)
        self._mx = X.mean(axis=0)
        sx = X.std(axis=0)
        self._sx = np.where(sx > 0, sx, 1.0)
        Xs = (X - self._mx) / self._sx
        self.classes_ = np.unique(y)
        if len(self.classes_) == 2:
            self._W = self._fit_binary(
                Xs, np.where(y == self.classes_[1], 1.0, -1.0))[None, :]
        else:
            self._W = np.stack([self._fit_binary(
                Xs, np.where(y == c, 1.0, -1.0)) for c in self.classes_])
        return self

    def predict(self, X: np.ndarray) -> np.ndarray:
        Xs = (np.asarray(X, np.float64) - self._mx) / self._sx
        d = Xs @ self._W[:, :-1].T + self._W[:, -1]
        if len(self.classes_) == 2:
            return self.classes_[(d[:, 0] > 0).astype(int)]
        return self.classes_[np.argmax(d, axis=1)]


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


def quick_models_clf() -> dict:
    """The classifier zoo (analog of the reference's dict_method_clf
    registry, quickmethod.py:44-163): name -> constructor.  SVC/GPC/RFC/
    AdaBC have no sklearn-free closed form in this sandbox; the
    deterministic numpy classifiers above cover the linear, neighbor,
    tree and boosted families the selection drivers dispatch on."""
    return {
        "LogR": lambda: LogisticRegressionClassifier(C=1.0),
        "KNC": lambda: KNNClassifier(n_neighbors=5),
        "KNC-dist": lambda: KNNClassifier(n_neighbors=5, weights="distance"),
        "TreeC": lambda: DecisionTreeClassifier(max_depth=5),
        "GBC": lambda: GradientBoostedClassifier(n_estimators=50,
                                                 learning_rate=0.1,
                                                 max_depth=2),
        "Per": lambda: PerceptronClassifier(),
    }


_CLF_SCORERS = {
    "accuracy": accuracy_score,
    "balanced_accuracy": balanced_accuracy_score,
}


def cv_score_classifier(model_factory, X: np.ndarray, y: np.ndarray, *,
                        k: int = 5, scoring: str = "accuracy") -> float:
    """Mean stratified-k-fold classification score (the reference's
    ``cross_val_score(est, cv=StratifiedKFold(5, shuffle=False),
    scoring=...)`` protocol, quickmethod.py:300-320)."""
    scorer = _CLF_SCORERS[scoring]
    scores = []
    for train, test in stratified_kfold_indices(y, k):
        m = model_factory().fit(X[train], y[train])
        scores.append(scorer(y[test], m.predict(X[test])))
    return float(np.mean(scores))


def cv_score_any(model_factory, X: np.ndarray, y: np.ndarray, *,
                 k: int = 5, seed: int = 0, scoring: str = "r2") -> float:
    """One entry point for the selection drivers: ``scoring`` picks the
    regression path (shuffled k-fold + r²) or the classification path
    (stratified k-fold + accuracy/balanced_accuracy)."""
    if scoring == "r2":
        return cv_score_model(model_factory, X, y, k=k, seed=seed)
    return cv_score_classifier(model_factory, X, y, k=k, scoring=scoring)
