"""read_with_provenance (sources/io.py) vs DuckDB
filename/file_row_number."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray


def test_read_with_provenance_multifile_rowgroups(tmp_path):
    """Multi-file, multi-row-group layout vs DuckDB's
    filename/file_row_number — the stamps must agree exactly, and
    column pruning must still return the provenance columns."""
    import os

    import pyarrow.parquet as pq

    from featurebox_ray.sources.io import read_with_provenance

    d = str(tmp_path / "frags")
    os.makedirs(d)
    rng = np.random.default_rng(306)
    n = 0
    for i in range(3):
        rows = int(rng.integers(50, 120))
        t = pa.table({
            "id": pa.array(np.arange(n, n + rows, dtype=np.int64)),
            "x": pa.array(rng.integers(0, 9, rows)),
        })
        # small row groups -> several tasks per file
        pq.write_table(t, f"{d}/part-{i}.parquet", row_group_size=37)
        n += rows
    got = (read_with_provenance(d, columns=["id"])
           .to_pandas().sort_values("id").reset_index(drop=True))
    con = duckdb.connect()
    exp = con.sql(f"""
        SELECT id, regexp_extract(filename, '[^/]+$') AS _file,
               CAST(file_row_number AS BIGINT) AS _row
        FROM read_parquet('{d}/*.parquet', filename=true,
                          file_row_number=true)
        ORDER BY id
    """).df().reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["id", "_file", "_row"]].astype({"id": "int64",
                                             "_row": "int64"}), exp)


