"""Corpus line-level dedup / boilerplate removal (stages/lines.py) vs a
DuckDB replay and a pure-Python oracle."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from featurebox_ray.stages.lines import remove_duplicate_lines


def _python_oracle(docs, min_docs, sep="\n"):
    freq = {}
    for i, txt in docs:
        if txt is None:
            continue
        for ln in set(txt.split(sep)):
            freq.setdefault(ln, set()).add(i)
    rows = []
    for i, txt in docs:
        if txt is None:
            continue
        lines = txt.split(sep)
        kept = [ln for ln in lines if len(freq[ln]) < min_docs]
        rows.append((i, sep.join(kept) if kept else None,
                     len(lines), len(kept)))
    return pd.DataFrame(
        rows, columns=["doc_id", "clean_text", "n_lines", "n_kept"])


def _run(docs, min_docs, parts, num_partitions=5):
    t = pa.table({"doc_id": pa.array([d[0] for d in docs], pa.int64()),
                  "text": pa.array([d[1] for d in docs], pa.string())})
    ds = ray.data.from_arrow(t)
    if parts > 1:
        ds = ds.repartition(parts)
    out = remove_duplicate_lines(ds, min_docs=min_docs,
                                 num_partitions=num_partitions)
    return (out.to_pandas().sort_values("doc_id")
            .reset_index(drop=True))


def test_lines_hand_case():
    docs = [
        (1, "cookie banner\nunique text one\nfooter"),
        (2, "cookie banner\nanother body\nfooter"),
        (3, "totally unique\nlines here"),
        (4, None),                 # NULL text -> no output row
        (5, ""),                   # one empty line, unique -> kept
        (6, "cookie banner"),      # all lines removed -> NULL text
        (7, "dup inside\ndup inside\nfooter"),  # in-doc dup: 1 doc, kept
    ]
    got = _run(docs, 2, 1)
    exp = _python_oracle(docs, 2)
    pd.testing.assert_frame_equal(
        got.astype(exp.dtypes.to_dict()), exp)
    assert got.loc[got.doc_id == 6, "clean_text"].isna().all()
    assert got.loc[got.doc_id == 7, "n_kept"].item() == 2


def test_lines_duckdb_fuzz_partition_invariant():
    rng = np.random.default_rng(47)
    vocab = ["alpha beta", "common footer", "nav bar", "x y z",
             "hello world", "", "one", "data line"]
    docs = []
    for i in range(120):
        if rng.random() < 0.04:
            docs.append((i, None))
            continue
        k = int(rng.integers(1, 6))
        docs.append((i, "\n".join(
            str(rng.choice(vocab)) + ("" if rng.random() < 0.6
                                      else f" {i}")
            for _ in range(k))))
    con = duckdb.connect()
    con.register("docs", pd.DataFrame(docs, columns=["doc_id", "text"]))
    exp = con.sql("""
        WITH sp AS (
          SELECT doc_id, string_split(text, chr(10)) AS ls
          FROM docs WHERE text IS NOT NULL
        ), parts AS (
          SELECT doc_id, unnest(ls) AS line,
                 generate_subscripts(ls, 1) AS pos FROM sp
        ), freq AS (
          SELECT line, count(DISTINCT doc_id) AS dc
          FROM parts GROUP BY line
        ), kept AS (
          SELECT p.doc_id, p.pos, p.line
          FROM parts p JOIN freq f USING (line) WHERE f.dc < 3
        )
        SELECT sp.doc_id,
               string_agg(k.line, chr(10) ORDER BY k.pos) AS clean_text,
               CAST(len(sp.ls) AS BIGINT) AS n_lines,
               CAST(count(k.line) AS BIGINT) AS n_kept
        FROM sp LEFT JOIN kept k USING (doc_id)
        GROUP BY sp.doc_id, sp.ls
        ORDER BY sp.doc_id
    """).df().reset_index(drop=True)
    prev = None
    for parts in (1, 4, 9):
        got = _run(docs, 3, parts)
        pd.testing.assert_frame_equal(
            got.astype(exp.dtypes.to_dict()), exp)
        if prev is not None:
            assert got.equals(prev)
        prev = got


def test_lines_min_docs_guard():
    import pytest

    t = pa.table({"doc_id": pa.array([1], pa.int64()),
                  "text": pa.array(["a"], pa.string())})
    with pytest.raises(ValueError):
        remove_duplicate_lines(ray.data.from_arrow(t), min_docs=0)
