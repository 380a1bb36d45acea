"""Prefix-duplicate removal (stages/substr.py:prefix_dedup) vs a
DuckDB lead/starts_with replay; planted prefix chains straddle block
boundaries; partition invariance."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from featurebox_ray.stages.substr import prefix_dedup

ORACLE = """
    WITH s AS (SELECT id, txt FROM t WHERE txt IS NOT NULL),
    l AS (SELECT id, txt,
                 lead(txt) OVER (ORDER BY txt, id) AS nxt
          FROM s)
    SELECT id FROM l
    WHERE nxt IS NULL OR NOT starts_with(nxt, txt)
    ORDER BY id
"""


def _expected(pdf: pd.DataFrame) -> list:
    con = duckdb.connect()
    con.register("t", pdf)
    return con.sql(ORACLE).df()["id"].tolist()


def test_prefix_dedup_duckdb_fuzz_partition_invariant():
    rng = np.random.default_rng(419)
    texts, chars = [], "ab"
    for _ in range(400):
        base = "".join(rng.choice(list(chars),
                                  size=rng.integers(1, 10)))
        texts.append(base)
        if rng.random() < 0.5:           # planted extension chain
            texts.append(base + "".join(
                rng.choice(list(chars), size=rng.integers(1, 6))))
        if rng.random() < 0.2:           # exact duplicate
            texts.append(base)
    texts.extend(["", "", None])         # empty strings + null
    ids = list(range(len(texts)))
    pdf = pd.DataFrame({"id": ids, "txt": texts})
    exp = _expected(pdf)
    t = pa.table({"id": pa.array(ids, pa.int64()),
                  "txt": pa.array(texts, pa.string())})
    prev = None
    for parts in (1, 13):
        ds = ray.data.from_arrow(t)
        if parts > 1:
            ds = ds.repartition(parts)
        got = sorted(prefix_dedup(ds, id_col="id", text_col="txt")
                     .to_pandas()["id"].tolist())
        assert got == exp
        if prev is not None:
            assert got == prev
        prev = got


def test_prefix_dedup_hand_checked():
    # "ab" prefix of "abc" prefix of "abcd"; "x" standalone;
    # duplicates of "q" collapse to max id
    t = pa.table({
        "id": [1, 2, 3, 4, 5, 6, 7],
        "txt": ["ab", "abc", "abcd", "x", "q", "q", "q"]})
    got = sorted(prefix_dedup(ray.data.from_arrow(t), id_col="id",
                              text_col="txt")
                 .to_pandas()["id"].tolist())
    assert got == [3, 4, 7]


def test_prefix_dedup_unicode_and_empty():
    # multi-byte codepoints: byte-prefix == codepoint-prefix on
    # valid UTF-8; empty text is a prefix of everything
    t = pa.table({"id": [1, 2, 3, 4],
                  "txt": ["né", "néant", "", "日本"]})
    got = sorted(prefix_dedup(ray.data.from_arrow(t), id_col="id",
                              text_col="txt")
                 .to_pandas()["id"].tolist())
    assert got == [2, 4]
