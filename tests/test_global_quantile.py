"""Exact global order statistic (stages/quantile.py:
global_quantile_element) vs numpy/DuckDB; narrow + wide ranges;
convergence and edge cases."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray

from featurebox_ray.stages.quantile import (_disc_index,
                                            global_quantile_element)


def _run(vals, q, **kw):
    t = pa.table({"v": pa.array(vals, pa.int64())})
    ds = ray.data.from_arrow(t).repartition(4)
    return global_quantile_element(ds, value_col="v", q=q, **kw)


def test_matches_duckdb_quantile_disc_narrow_and_wide():
    rng = np.random.default_rng(281)
    for vals in (
        rng.integers(-500, 500, 5000),            # narrow: 1-2 passes
        rng.integers(-(1 << 50), 1 << 50, 3000),  # wide: many passes
        np.repeat([7, 7, 7, 9], 100),             # heavy ties
    ):
        vals = list(vals)
        vals[3] = None
        con = duckdb.connect()
        con.register("t", pd.DataFrame(
            {"v": pd.array(vals, dtype="Int64")}))
        for q in (0.1, 0.5, 0.9, 1.0):
            exp = con.sql(
                f"SELECT quantile_disc(v, {q}) FROM t").fetchone()[0]
            got = _run(vals, q, n_bins=64)
            assert got["value"] == exp, (q, got, exp)
            nn = sum(v is not None for v in vals)
            assert got["n"] == nn
            assert got["rank"] == _disc_index(q, nn) + 1


def test_exact_element_not_interpolated():
    # median of {0, 1000000} must be an ELEMENT, not 500000
    got = _run([0, 1000000], 0.5)
    assert got["value"] == 0


def test_empty_raises():
    with pytest.raises(Exception):
        _run([None, None], 0.5)
