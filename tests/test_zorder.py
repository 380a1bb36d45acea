"""Z-order layout (stages/zorder.py)."""

import numpy as np
import pyarrow as pa
import pytest
import ray

from featurebox_ray.stages.zorder import (morton_interleave2,
                                          morton_sql_expr, zorder_layout)


def _morton_ref(x: int, y: int, bits: int) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


@pytest.mark.parametrize("bits", [4, 16, 31])
def test_morton_matches_bitwise_reference(bits):
    rng = np.random.default_rng(bits)
    n = 500
    x = rng.integers(0, 1 << bits, n)
    y = rng.integers(0, 1 << bits, n)
    got = morton_interleave2(x, y, bits)
    want = np.array([_morton_ref(int(a), int(b), bits)
                     for a, b in zip(x, y)], np.int64)
    assert (got == want).all()


def test_morton_sql_expr_matches_numpy():
    import duckdb

    rng = np.random.default_rng(0)
    n = 300
    x = rng.integers(0, 1 << 16, n)
    y = rng.integers(0, 1 << 16, n)
    t = pa.table({"qx": pa.array(x, pa.int64()),
                  "qy": pa.array(y, pa.int64())})
    con = duckdb.connect()
    con.register("t", t)
    got = con.execute(
        f"SELECT {morton_sql_expr('qx', 'qy', 16)} AS z FROM t"
    ).fetchnumpy()["z"].astype(np.int64)
    assert (got == morton_interleave2(x, y, 16)).all()


def test_zorder_layout_locality_and_rank():
    # a 2-D grid: z-order rank must equal the serial morton argsort,
    # invariant to input partitioning
    n = 40
    xs, ys = np.meshgrid(np.arange(n), np.arange(n))
    ids = np.arange(n * n)
    t = pa.table({"id": pa.array(ids, pa.int64()),
                  "x": pa.array(xs.ravel(), pa.int64()),
                  "y": pa.array(ys.ravel(), pa.int64())})
    want_z = morton_interleave2(
        (xs.ravel() * 65535) // (n - 1),
        (ys.ravel() * 65535) // (n - 1), 16)
    order = np.lexsort((ids, want_z))
    want_rank = np.empty(n * n, np.int64)
    want_rank[order] = np.arange(1, n * n + 1)
    for parts in (1, 7):
        got = (zorder_layout(ray.data.from_arrow(t).repartition(parts),
                             x_col="x", y_col="y", tie_cols=["id"],
                             bits=16)
               .to_pandas().sort_values("id").reset_index(drop=True))
        assert (got["zval"].to_numpy() == want_z).all()
        assert (got["zrank"].to_numpy() == want_rank).all()


def test_zorder_constant_dimension_and_nulls():
    t = pa.table({"id": pa.array([1, 2, 3, 4], pa.int64()),
                  "x": pa.array([5, 5, 5, None], pa.int64()),
                  "y": pa.array([1, 2, 3, 4], pa.int64())})
    got = (zorder_layout(ray.data.from_arrow(t), x_col="x", y_col="y",
                         tie_cols=["id"], bits=8)
           .to_pandas().sort_values("id").reset_index(drop=True))
    assert got["id"].tolist() == [1, 2, 3]  # null dim dropped
    assert got["zrank"].tolist() == [1, 2, 3]  # y alone orders
