"""Forward fill (LOCF) and trailing rolling distinct count
(stages/window.py) vs DuckDB window oracles, with NULL keys/values at
several partitionings."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray

from featurebox_ray.stages.window import (add_forward_fill,
                                          add_rolling_distinct)


def _fuzz_table(seed, n=700):
    rng = np.random.default_rng(seed)
    keys = [None if rng.random() < 0.04 else int(rng.integers(0, 9))
            for _ in range(n)]
    ts = rng.integers(0, 3000, n).tolist()
    vals = [None if rng.random() < 0.3 else float(rng.integers(0, 50))
            for _ in range(n)]
    svals = [None if rng.random() < 0.3 else str(rng.choice(list("abcde")))
             for _ in range(n)]
    return pa.table({
        "k": pa.array(keys, pa.int64()),
        "ts": pa.array(ts, pa.int64()),
        "o": pa.array(range(n), pa.int64()),
        "v": pa.array(vals, pa.float64()),
        "s": pa.array(svals, pa.string()),
    })


def test_forward_fill_duckdb_parity():
    t = _fuzz_table(11)
    con = duckdb.connect()
    con.register("t", t.to_pandas())
    exp = con.sql("""
        SELECT o,
               last_value(v IGNORE NULLS) OVER w AS v_ffill,
               last_value(s IGNORE NULLS) OVER w AS s_ffill
        FROM t
        WINDOW w AS (PARTITION BY k ORDER BY ts, o
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        ORDER BY o
    """).df().reset_index(drop=True)
    prev = None
    for parts in (1, 4, 9):
        ds = ray.data.from_arrow(t)
        if parts > 1:
            ds = ds.repartition(parts)
        got = (add_forward_fill(ds, key_col="k", ts_col="ts",
                                order_col="o", value_cols=["v", "s"],
                                num_partitions=5)
               .to_pandas().sort_values("o").reset_index(drop=True))
        pd.testing.assert_series_equal(got["v_ffill"], exp["v_ffill"],
                                       check_names=False)
        pd.testing.assert_series_equal(got["s_ffill"], exp["s_ffill"],
                                       check_names=False)
        if prev is not None:
            assert got.equals(prev)
        prev = got


def test_forward_fill_types_preserved():
    t = pa.table({"k": pa.array([1, 1, 1], pa.int64()),
                  "ts": pa.array([1, 2, 3], pa.int64()),
                  "o": pa.array([0, 1, 2], pa.int64()),
                  "i": pa.array([7, None, None], pa.int64())})
    out = add_forward_fill(ray.data.from_arrow(t), key_col="k",
                           ts_col="ts", order_col="o",
                           value_cols=["i"], num_partitions=2)
    tab = pa.concat_tables(
        [pa.table(b) for b in out.iter_batches(batch_format="pyarrow")])
    assert tab.schema.field("i_ffill").type == pa.int64()
    assert tab.sort_by("o")["i_ffill"].to_pylist() == [7, 7, 7]


@pytest.mark.parametrize("window", [1, 3, 8])
def test_rolling_distinct_duckdb_parity(window):
    t = _fuzz_table(23)
    con = duckdb.connect()
    con.register("t", t.to_pandas())
    exp = con.sql(f"""
        SELECT o, CAST(count(DISTINCT s) OVER (
                    PARTITION BY k ORDER BY ts, o
                    ROWS BETWEEN {window - 1} PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS rolling_distinct
        FROM t ORDER BY o
    """).df().reset_index(drop=True)
    prev = None
    for parts in (1, 6):
        ds = ray.data.from_arrow(t)
        if parts > 1:
            ds = ds.repartition(parts)
        got = (add_rolling_distinct(ds, key_col="k", ts_col="ts",
                                    order_col="o", value_col="s",
                                    window=window, num_partitions=5)
               .to_pandas().sort_values("o").reset_index(drop=True))
        assert got["rolling_distinct"].tolist() == \
            exp["rolling_distinct"].tolist()
        if prev is not None:
            assert got.equals(prev)
        prev = got


def test_rolling_distinct_window_guard():
    t = pa.table({"k": pa.array([1], pa.int64()),
                  "ts": pa.array([1], pa.int64()),
                  "o": pa.array([0], pa.int64()),
                  "s": pa.array(["a"], pa.string())})
    with pytest.raises(ValueError):
        add_rolling_distinct(ray.data.from_arrow(t), key_col="k",
                             ts_col="ts", order_col="o", value_col="s",
                             window=0)


def test_last_row_per_key_duckdb_parity():
    from featurebox_ray.stages.rank import last_row_per_key

    t = _fuzz_table(101, n=500)
    con = duckdb.connect()
    con.register("t", t.to_pandas())
    exp = con.sql("""
        SELECT * FROM t
        QUALIFY row_number() OVER (
            PARTITION BY k ORDER BY ts DESC, o DESC) = 1
        ORDER BY o
    """).df().reset_index(drop=True)
    prev = None
    for parts in (1, 6):
        ds = ray.data.from_arrow(t)
        if parts > 1:
            ds = ds.repartition(parts)
        got = (last_row_per_key(ds, key_col="k",
                                order_cols=["ts", "o"],
                                num_partitions=4)
               .to_pandas().sort_values("o").reset_index(drop=True))
        pd.testing.assert_frame_equal(got.astype(exp.dtypes.to_dict()),
                                      exp)
        if prev is not None:
            assert got.equals(prev)
        prev = got
