"""Global row_number (stages/rank.py:global_row_number)."""

import numpy as np
import pyarrow as pa
import ray

from featurebox_ray.stages.rank import global_row_number


def _ds(df, n_parts):
    return ray.data.from_arrow(pa.Table.from_pandas(
        df, preserve_index=False)).repartition(n_parts)


def test_global_row_number_matches_duckdb_fuzz():
    import duckdb
    import pandas as pd

    rng = np.random.default_rng(83)
    n = 2000
    df = pd.DataFrame({
        "id": rng.permutation(n).astype(np.int64),
        "v": rng.choice([1.5, -2.0, 7.25, 0.0, 3.5], size=n),  # heavy ties
    })
    con = duckdb.connect()
    want = con.execute("""
        SELECT id, v, row_number() OVER (ORDER BY v, id) AS g_rank
        FROM df ORDER BY id
    """).df()
    con.close()
    for parts in (1, 4, 9):
        got = (global_row_number(_ds(df, parts), order_cols=["v", "id"])
               .to_pandas().sort_values("id").reset_index(drop=True))
        assert (got["g_rank"].to_numpy(np.int64)
                == want["g_rank"].to_numpy(np.int64)).all()
        assert (got["id"].to_numpy(np.int64)
                == want["id"].to_numpy(np.int64)).all()


def test_global_row_number_descending_and_empty():
    import pandas as pd

    df = pd.DataFrame({"id": np.arange(10, dtype=np.int64),
                       "v": np.arange(10, dtype=np.float64)})
    got = (global_row_number(_ds(df, 3), order_cols=["v", "id"],
                             descending=True)
           .to_pandas().sort_values("id"))
    # v=9 ranks 1, v=0 ranks 10
    assert got["g_rank"].tolist() == list(range(10, 0, -1))

    empty = _ds(df, 2).filter(lambda r: False)
    out = global_row_number(empty, order_cols=["v", "id"])
    assert out.count() == 0


def test_global_row_number_empty_schema_and_nan_order():
    import duckdb
    import pandas as pd

    # empty input: Ray's sort emits a zero-column bundle for an empty
    # dataset (schema None — same semantics as filter-all), so the rank
    # column cannot be materialized; the op must still return cleanly
    # with 0 rows rather than raise
    df = pd.DataFrame({"id": np.arange(6, dtype=np.int64),
                       "v": np.arange(6, dtype=np.float64)})
    for empty in (ray.data.from_arrow(pa.Table.from_pandas(
                      df, preserve_index=False).slice(0, 0)),
                  _ds(df, 2).filter(lambda r: False)):
        out = global_row_number(empty, order_cols=["v", "id"])
        assert out.count() == 0
        sch = out.schema()
        assert sch is None or "g_rank" in sch.names

    # NaN first-key values must not scramble the driver's block order
    rng = np.random.default_rng(5)
    n = 500
    vals = rng.choice([1.0, 2.0, np.nan, -3.5], size=n)
    df = pd.DataFrame({"id": np.arange(n, dtype=np.int64), "v": vals})
    got = (global_row_number(_ds(df, 6), order_cols=["v", "id"])
           .to_pandas().sort_values("id").reset_index(drop=True))
    con = duckdb.connect()
    want = con.execute("""
        SELECT id, row_number() OVER (ORDER BY v, id) AS g_rank
        FROM df ORDER BY id
    """).df()
    con.close()
    assert (got["g_rank"].to_numpy(np.int64)
            == want["g_rank"].to_numpy(np.int64)).all()
