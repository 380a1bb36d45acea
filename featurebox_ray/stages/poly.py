"""Polynomial feature crossing — re-expression of the reference's
``PolyFeaturizer`` (featurebox/featurizers/polyfeature.py:25-76): all
degree-tuple products ``x0^d0 * x1^d1 * ...`` over selected numeric columns,
as a stateless vectorized ``map_batches`` stage.

Degree tuples are enumerated once on the driver (tiny), the per-batch work is
pure numpy column products.  The reference's combinatorics guard
(polyfeature.py:38, ``len(degree)**n_features <= 1e6``) is preserved.
"""

from __future__ import annotations

import itertools
from typing import List, Sequence, Tuple

import numpy as np
import pyarrow as pa


def degree_tuples(n_cols: int, degrees: Sequence[int]) -> List[Tuple[int, ...]]:
    assert len(degrees) ** n_cols <= 1e6, "combinatorics guard (ref polyfeature.py:38)"
    out = [t for t in itertools.product(degrees, repeat=n_cols) if sum(t) > 0]
    return out


def poly_feature_names(columns: Sequence[str], degrees: Sequence[int]) -> List[str]:
    names = []
    for t in degree_tuples(len(columns), degrees):
        parts = [f"{c}^{d}" if d != 1 else c
                 for c, d in zip(columns, t) if d != 0]
        names.append("*".join(parts))
    return names


def add_poly_features(ds, columns: Sequence[str], degrees: Sequence[int] = (0, 1, 2),
                      *, prefix: str = "poly", batch_size: int = 65536):
    columns = list(columns)
    tuples = degree_tuples(len(columns), degrees)
    names = poly_feature_names(columns, degrees)

    def kernel(batch: pa.Table) -> pa.Table:
        mat = np.column_stack(
            [batch[c].to_numpy(zero_copy_only=False).astype(np.float64)
             for c in columns]
        )
        for t, name in zip(tuples, names):
            v = np.ones(batch.num_rows)
            for j, d in enumerate(t):
                if d == 1:
                    v = v * mat[:, j]
                elif d != 0:  # negative degrees divide (x^-1 = 1/x), not skip
                    v = v * mat[:, j] ** d
            batch = batch.append_column(f"{prefix}:{name}", pa.array(v))
        return batch

    return ds.map_batches(
        kernel, batch_format="pyarrow", zero_copy_batch=True, batch_size=batch_size
    )
