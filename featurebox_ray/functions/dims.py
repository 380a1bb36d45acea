"""Physical-dimension (unit) vector algebra — clean-room re-implementation
of the reference's ``Dim`` 7-vector SI-exponent system
(featurebox/symbol/functions/dimfunc.py:114-178 and the per-operator rules
at 29-111), used by the expression-feature layer to validate physical
consistency of derived features.

A dimension is a 7-vector of SI base-unit exponents
(kg, m, s, A, K, mol, cd).  Rules mirrored from the reference:

* add/sub: defined only between equal dims (else "nan dim");
* mul/div: exponents add/subtract;
* pow: exponents scale;
* transcendental functions (exp/ln/sin/cos): require dimensionless input,
  output dimensionless;
* a special NAN dim propagates through everything (invalid expression).
"""

from __future__ import annotations

import numpy as np

N_BASE = 7


class Dim:
    __slots__ = ("v",)

    def __init__(self, v=None):
        if v is None:
            self.v = np.zeros(N_BASE)
        else:
            self.v = np.asarray(v, dtype=np.float64)
            assert self.v.shape == (N_BASE,)

    # constructors -----------------------------------------------------
    @staticmethod
    def dless() -> "Dim":
        return Dim()

    @staticmethod
    def nan() -> "Dim":
        return Dim(np.full(N_BASE, np.nan))

    @property
    def is_nan(self) -> bool:
        return bool(np.isnan(self.v).any())

    @property
    def is_dless(self) -> bool:
        return not self.is_nan and bool(np.all(self.v == 0))

    # algebra ----------------------------------------------------------
    def __eq__(self, other) -> bool:
        if not isinstance(other, Dim):
            return NotImplemented
        if self.is_nan or other.is_nan:
            return False
        return bool(np.array_equal(self.v, other.v))

    def __add__(self, other: "Dim") -> "Dim":
        if self.is_nan or other.is_nan:
            return Dim.nan()
        return Dim(self.v.copy()) if np.array_equal(self.v, other.v) else Dim.nan()

    __sub__ = __add__  # same rule: only like dims combine

    def __mul__(self, other: "Dim") -> "Dim":
        if self.is_nan or other.is_nan:
            return Dim.nan()
        return Dim(self.v + other.v)

    def __truediv__(self, other: "Dim") -> "Dim":
        if self.is_nan or other.is_nan:
            return Dim.nan()
        return Dim(self.v - other.v)

    def __pow__(self, p: float) -> "Dim":
        if self.is_nan:
            return Dim.nan()
        return Dim(self.v * float(p))

    def func(self) -> "Dim":
        """Result dim of a transcendental function applied to this dim."""
        if self.is_nan or not self.is_dless:
            return Dim.nan()
        return Dim.dless()

    def __repr__(self):
        return f"Dim({self.v.tolist()})"

    def __hash__(self):
        return hash(tuple(np.nan_to_num(self.v, nan=-999).tolist()))
