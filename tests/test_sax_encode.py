"""PAA+SAX symbolic encoding (stages/window.py:sax_encode) vs a DuckDB
replay; hand-checked windows; partition invariance."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from featurebox_ray.stages.window import sax_encode

ORACLE = """
    WITH e AS (
      SELECT k AS u, x AS t, rid AS id,
             CAST(round(coalesce(v, 0) * 100) AS BIGINT) AS y
      FROM pts WHERE k IS NOT NULL AND x IS NOT NULL
        AND rid IS NOT NULL AND v IS NOT NULL),
    r AS (SELECT u, y,
                 row_number() OVER (PARTITION BY u
                                    ORDER BY t, id) - 1 AS rn,
                 count(*) OVER (PARTITION BY u) AS n
          FROM e),
    w AS (SELECT u, rn // {w} AS win_idx,
                 CAST(sum(y) AS BIGINT) AS wsum
          FROM r WHERE rn // {w} < n // {w} GROUP BY u, rn // {w}),
    b AS (SELECT quantile_disc(wsum, CAST(0.25 AS DOUBLE)) AS b1,
                 quantile_disc(wsum, CAST(0.5 AS DOUBLE)) AS b2,
                 quantile_disc(wsum, CAST(0.75 AS DOUBLE)) AS b3
          FROM w)
    SELECT u AS k, win_idx, wsum,
           CAST(CASE WHEN wsum > b.b1 THEN 1 ELSE 0 END
                + CASE WHEN wsum > b.b2 THEN 1 ELSE 0 END
                + CASE WHEN wsum > b.b3 THEN 1 ELSE 0 END
                AS BIGINT) AS symbol
    FROM w, b ORDER BY k, win_idx
"""


def test_sax_encode_duckdb_fuzz_partition_invariant():
    rng = np.random.default_rng(917)
    n = 800
    ks = [None if rng.random() < 0.02 else int(rng.integers(0, 12))
          for _ in range(n)]
    xs = [None if rng.random() < 0.02 else int(rng.integers(0, 40))
          for _ in range(n)]
    vs = [None if rng.random() < 0.03
          else float(rng.integers(-50, 50)) / 4 for _ in range(n)]
    pdf = pd.DataFrame({"k": pd.array(ks, dtype="Int64"),
                        "x": pd.array(xs, dtype="Int64"),
                        "rid": np.arange(n), "v": vs})
    con = duckdb.connect()
    con.register("pts", pdf)
    exp = con.sql(ORACLE.format(w=4)).df().reset_index(drop=True)
    t = pa.table({"k": pa.array(ks, pa.int64()),
                  "x": pa.array(xs, pa.int64()),
                  "rid": pa.array(np.arange(n), pa.int64()),
                  "v": pa.array(vs, pa.float64())})
    prev = None
    for parts in (1, 9):
        ds = ray.data.from_arrow(t)
        if parts > 1:
            ds = ds.repartition(parts)
        got = (sax_encode(ds, key_col="k", ts_col="x",
                          order_col="rid", value_col="v", window=4,
                          num_partitions=5)
               .to_pandas().sort_values(["k", "win_idx"])
               .reset_index(drop=True))
        pd.testing.assert_frame_equal(
            got.astype(exp.dtypes.to_dict()), exp, check_exact=True)
        if prev is not None:
            assert got.equals(prev)
        prev = got


def test_sax_encode_hand_checked():
    # one key, 10 rows, window 4 -> 2 full windows, remainder dropped
    t = pa.table({"k": pa.array([1] * 10, pa.int64()),
                  "x": pa.array(list(range(10)), pa.int64()),
                  "rid": pa.array(list(range(10)), pa.int64()),
                  "v": pa.array([1.0, 1.0, 1.0, 1.0,
                                 5.0, 5.0, 5.0, 5.0,
                                 9.0, 9.0], pa.float64())})
    got = (sax_encode(ray.data.from_arrow(t), key_col="k",
                      ts_col="x", order_col="rid", value_col="v",
                      window=4)
           .to_pandas().sort_values("win_idx")
           .reset_index(drop=True))
    assert got["wsum"].tolist() == [400, 2000]
    # breakpoints are quantile_disc elements of [400, 2000]:
    # b1=b2=400, b3=2000 -> symbols: 400 -> 0, 2000 -> 2
    assert got["symbol"].tolist() == [0, 2]
