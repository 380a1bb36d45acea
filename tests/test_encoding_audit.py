"""Encoding audit (stages/text.py:encoding_audit) vs a DuckDB RE2
replay; planted mojibake; partition invariance."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from featurebox_ray.stages.text import encoding_audit

ORACLE = r"""
    WITH e AS (SELECT g, coalesce(txt, '') AS tx FROM t
               WHERE g IS NOT NULL),
    s AS (SELECT g,
                 len(regexp_extract_all(tx, '\x{FFFD}')) AS r,
                 len(regexp_extract_all(tx, '[ÃÂ]')) AS m,
                 len(regexp_extract_all(tx,
                     '[\x00-\x08\x0b\x0c\x0e-\x1f]')) AS c
          FROM e),
    a AS (SELECT g, CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(sum(CASE WHEN r + m + c > 0 THEN 1 ELSE 0
                          END) AS BIGINT) AS n_flagged,
                 CAST(sum(r) AS BIGINT) AS n_replacement,
                 CAST(sum(m) AS BIGINT) AS n_mojibake,
                 CAST(sum(c) AS BIGINT) AS n_control
          FROM s GROUP BY g)
    SELECT g, n_docs, n_flagged, n_replacement, n_mojibake,
           n_control,
           CAST(n_flagged AS DOUBLE) / CAST(n_docs AS DOUBLE)
             AS flagged_share
    FROM a ORDER BY g
"""


def test_encoding_audit_duckdb_fuzz_partition_invariant():
    rng = np.random.default_rng(587)
    texts, gs = [], []
    for _ in range(400):
        gs.append(None if rng.random() < 0.03
                  else f"s{rng.integers(0, 4)}")
        base = "clean text here"
        r = rng.random()
        if r < 0.1:
            texts.append(base + "� broken �")
        elif r < 0.2:
            texts.append("cafÃ© " + base)  # Ã artifact
        elif r < 0.25:
            texts.append(base + "\x07bell\x1f")
        elif r < 0.3:
            texts.append(None)
        else:
            texts.append(base)
    t = pa.table({"g": pa.array(gs, pa.string()),
                  "txt": pa.array(texts, pa.string())})
    con = duckdb.connect()
    con.register("t", t)
    exp = con.sql(ORACLE).df().reset_index(drop=True)
    prev = None
    for parts in (1, 8):
        ds = ray.data.from_arrow(t)
        if parts > 1:
            ds = ds.repartition(parts)
        got = (encoding_audit(ds, group_col="g", text_col="txt")
               .rename_columns(["g", "n_docs", "n_flagged",
                                "n_replacement", "n_mojibake",
                                "n_control", "flagged_share"])
               .to_pandas().sort_values("g").reset_index(drop=True))
        pd.testing.assert_frame_equal(
            got.astype(exp.dtypes.to_dict()), exp, check_exact=True)
        if prev is not None:
            assert got.equals(prev)
        prev = got


def test_encoding_audit_hand_checked():
    t = pa.table({"g": ["x", "x", "x"],
                  "txt": ["ok", "bad ��", None]})
    got = encoding_audit(ray.data.from_arrow(t), group_col="g",
                         text_col="txt").to_pandas().iloc[0]
    assert (got["n_docs"], got["n_flagged"],
            got["n_replacement"]) == (3, 1, 2)
    assert got["flagged_share"] == 1.0 / 3.0
