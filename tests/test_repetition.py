"""Repetition/quality signals (stages/repetition.py) vs brute-force python."""

from collections import Counter

import numpy as np
import pyarrow as pa
import ray

from featurebox_ray.stages.repetition import repetition_features

SF = "/root/testdata/sf0.001"


def _py_row(text: str):
    toks = (text or "").split()
    n = len(toks)
    d = len(set(toks))
    big = Counter(" ".join(toks[i:i + 2]) for i in range(n - 1))
    tri = Counter(" ".join(toks[i:i + 3]) for i in range(n - 2))
    return {
        "n_tokens": n,
        "dup_word_frac": float(np.float64(n - d) / n) if n else 0.0,
        "top_bigram_frac": (float(np.float64(max(big.values()))
                                  / (n - 1)) if n >= 2 else 0.0),
        "top_trigram_frac": (float(np.float64(max(tri.values()))
                                   / (n - 2)) if n >= 3 else 0.0),
        "mean_word_len": (float(np.float64(sum(len(t) for t in toks)) / n)
                          if n else 0.0),
    }


def _check(tbl: pa.Table):
    ds = ray.data.from_arrow(tbl)
    out = repetition_features(ds).to_pandas().set_index("doc_id")
    ids = tbl["doc_id"].to_pylist()
    texts = tbl["text"].to_pylist()
    for i, t in zip(ids, texts):
        want = _py_row(t)
        row = out.loc[i]
        for k, v in want.items():
            assert row[k] == v, (i, k, row[k], v)


def test_repetition_edge_cases():
    _check(pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        "text": pa.array([
            "a a a a",                      # all dup, one bigram repeated
            "one",                          # single token
            "",                             # empty
            "x y",                          # exactly two tokens
            "ab ab cd ab cd ef",            # mixed repeats
            "  spaced   out   tokens  ",    # whitespace runs
        ]),
    }))


def test_repetition_matches_bruteforce_sf0001():
    import pyarrow.parquet as pq
    _check(pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"]))


def test_repetition_null_text():
    tbl = pa.table({
        "doc_id": pa.array([10, 11], pa.int64()),
        "text": pa.array(["a b a", None]),
    })
    ds = ray.data.from_arrow(tbl)
    out = repetition_features(ds).to_pandas().set_index("doc_id")
    assert out.loc[11, "n_tokens"] == 0
    assert out.loc[11, "dup_word_frac"] == 0.0
    assert out.loc[10, "dup_word_frac"] == float(np.float64(1) / 3)
