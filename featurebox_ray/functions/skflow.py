"""sklearn-style estimator facade over the symbolic-regression engine —
re-expression of the reference's ``SymbolLearning`` (symbol/skflow.py:
12-255): one fit/predict/transform object wrapping loop choice, group
packing, coefficient fitting and scoring, so the GP layer composes like
the reference's estimators (SURVEY §2.10/§2.13 Pipeline compat).

No sklearn in the container, so the facade implements the estimator
protocol directly (``get_params``/``set_params``/``fit``/``predict``/
``transform``/``score``) rather than inheriting ``BaseEstimator``; any
duck-typed pipeline that calls those methods composes with it.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from .expr import (SymbolicSearch, add_inner_coefficients, eval_expr,
                   expr_to_str, fit_inner_coefficients, pack_groups)

_LOOPS = {
    # reference flow.py loop names -> mutation-operator sets
    "BaseLoop": ("subtree",),
    "MultiMutateLoop": ("node", "subtree", "shrink"),
    # the reference's literal class name (flow.py spells it "Mutil");
    # accept both so code ported from reference usage keeps working
    "MutilMutateLoop": ("node", "subtree", "shrink"),
    "OnePointMutateLoop": ("node",),
    "DimForceLoop": ("node", "subtree", "shrink"),
}


class SymbolLearning:
    """Fit a symbolic expression to (X, y) and use it like a model.

    Parameters mirror the reference's surface where it has an engine
    analog: ``loop`` picks the evolution variant (flow.py:363-457),
    ``pop``/``gens``/``depth``/probabilities configure the search,
    ``x_group`` packs grouped terminals (symbol/base.py:461-480),
    ``inner_add`` fits per-term inner coefficients (W_i/k_i) with the
    variable-projection solver, and the outer affine (A, B) is always
    fitted in closed form (reference add_coef/inter_add).

    After ``fit``: ``expr_`` (tuple tree), ``expr_str_``, ``best_score_``
    (search r²), ``coef_k_``/``coef_a_``/``intercept_b_``.
    ``predict(X)`` evaluates ``a·f(X; k) + b``; ``transform(X)`` appends
    the fitted expression as one extra feature column.
    """

    def __init__(self, *, loop: str = "MultiMutateLoop", pop: int = 200,
                 gens: int = 15, depth: int = 3,
                 un_ops: Sequence[str] = ("sqrt", "sq", "ln"),
                 bin_ops: Sequence[str] = ("add", "sub", "mul", "div"),
                 cx_prob: float = 0.6, mut_prob: float = 0.3,
                 hall_n: int = 1, inner_add: bool = False,
                 x_group=None, dims=None, target_dim=None,
                 dim_penalty: float = 0.5, seed: int = 0,
                 batch_size: int = 200):
        self.loop = loop
        self.pop, self.gens, self.depth = pop, gens, depth
        self.un_ops, self.bin_ops = tuple(un_ops), tuple(bin_ops)
        self.cx_prob, self.mut_prob = cx_prob, mut_prob
        self.hall_n = hall_n
        self.inner_add = inner_add
        self.x_group = x_group
        self.dims, self.target_dim = dims, target_dim
        self.dim_penalty = dim_penalty
        self.seed = seed
        self.batch_size = batch_size
        self.expr_ = None
        self.expr_str_: Optional[str] = None
        self.best_score_: float = -np.inf
        self.hall_: list = []
        self.coef_k_: Optional[np.ndarray] = None
        self.coef_a_: float = 1.0
        self.intercept_b_: float = 0.0
        self.search_: Optional[SymbolicSearch] = None

    # -- estimator protocol ------------------------------------------------
    _PARAMS = ("loop", "pop", "gens", "depth", "un_ops", "bin_ops",
               "cx_prob", "mut_prob", "hall_n", "inner_add", "x_group",
               "dims", "target_dim", "dim_penalty", "seed", "batch_size")

    def get_params(self, deep: bool = True) -> dict:
        return {p: getattr(self, p) for p in self._PARAMS}

    def set_params(self, **params) -> "SymbolLearning":
        for k, v in params.items():
            if k not in self._PARAMS:
                raise ValueError(f"unknown parameter {k!r}")
            setattr(self, k, v)
        return self

    # -- core --------------------------------------------------------------
    def _columns(self, X: np.ndarray):
        cols = [np.ascontiguousarray(X[:, j], dtype=np.float64)
                for j in range(X.shape[1])]
        if self.x_group is not None:
            cols, names = pack_groups(cols, self.x_group)
        else:
            names = [f"x{j}" for j in range(X.shape[1])]
        return cols, names

    def fit(self, X: np.ndarray, y: np.ndarray) -> "SymbolLearning":
        if self.loop not in _LOOPS:
            raise ValueError(f"unknown loop {self.loop!r}; "
                             f"one of {sorted(_LOOPS)}")
        if self.x_group is not None:
            from .expr import DISPOSE

            if not any(op in DISPOSE for op in self.un_ops):
                raise ValueError(
                    "x_group is set but un_ops contains no dispose op "
                    f"({sorted(DISPOSE)}); expressions touching a packed "
                    "group terminal would stay 2-D and always score -inf")
        X = np.asarray(X, np.float64)
        y = np.asarray(y, np.float64)
        cols, names = self._columns(X)
        search = SymbolicSearch(
            pop=self.pop, gens=self.gens, depth=self.depth,
            un_ops=list(self.un_ops), bin_ops=list(self.bin_ops),
            cx_prob=self.cx_prob, mut_prob=self.mut_prob,
            seed=self.seed, batch_size=self.batch_size,
            dims=self.dims, target_dim=self.target_dim,
            dim_penalty=self.dim_penalty,
            mutations=_LOOPS[self.loop], hall_n=self.hall_n,
            dim_force=(self.loop == "DimForceLoop"))
        # pass the packed column list directly (2-D group terminals must
        # reach the search as-is)
        search.fit(cols, y)
        self.search_ = search
        self.hall_ = list(search.hall_)
        self.expr_ = search.best_expr_
        self.best_score_ = float(search.best_score_)
        if self.expr_ is None:
            raise RuntimeError("search found no finite-scoring expression")
        self.expr_str_ = expr_to_str(self.expr_, names)
        self._names = names
        # coefficient fitting (reference add_coef/inner_add)
        if self.inner_add:
            k, a, b, r2 = fit_inner_coefficients(self.expr_, cols, y)
            self.coef_k_, self.coef_a_, self.intercept_b_ = k, a, b
            self._pexpr = add_inner_coefficients(self.expr_)[0]
            self.fitted_r2_ = float(r2)
        else:
            v = eval_expr(self.expr_, cols)
            vc, yc = v - v.mean(), y - y.mean()
            den = float(vc @ vc)
            a = float(vc @ yc) / den if den > 0 else 0.0
            self.coef_a_ = a
            self.intercept_b_ = float(y.mean() - a * v.mean())
            self.coef_k_ = np.empty(0)
            self._pexpr = self.expr_
            resid = y - (a * v + self.intercept_b_)
            ss = float(yc @ yc)
            self.fitted_r2_ = (1.0 - float(resid @ resid) / ss
                               if ss > 0 else 0.0)
        return self

    def predict(self, X: np.ndarray) -> np.ndarray:
        assert self.expr_ is not None, "fit first"
        cols, _ = self._columns(np.asarray(X, np.float64))
        v = eval_expr(self._pexpr, cols,
                      self.coef_k_ if len(self.coef_k_) else None)
        # the search scored the expression with the non-finite-clamped
        # evaluation (expr.py value()); predict applies the same clamp on
        # BOTH paths, or out-of-sample rows hitting div-by-~0 / ln(<=0)
        # would return NaN/inf where scoring treated them as 0
        v = np.where(np.isfinite(v), v, 0.0)
        return self.coef_a_ * v + self.intercept_b_

    def transform(self, X: np.ndarray) -> np.ndarray:
        """Append the fitted expression as one extra feature column
        (reference add_tree_to_features / TransformerMixin shape)."""
        X = np.asarray(X, np.float64)
        return np.column_stack([X, self.predict(X)])

    def fit_transform(self, X: np.ndarray, y: np.ndarray) -> np.ndarray:
        return self.fit(X, y).transform(X)

    def score(self, X: np.ndarray, y: np.ndarray) -> float:
        y = np.asarray(y, np.float64)
        p = self.predict(X)
        ss_res = float(np.sum((y - p) ** 2))
        ss_tot = float(np.sum((y - y.mean()) ** 2))
        return 1.0 - ss_res / ss_tot if ss_tot > 0 else 0.0

    def __str__(self) -> str:
        return (f"SymbolLearning(loop={self.loop}, "
                f"expr={self.expr_str_ or '<unfitted>'})")
