"""Benchmark decontamination (stages/decontam.py) vs brute-force python."""

import numpy as np
import pyarrow as pa
import pytest
import ray

from featurebox_ray.stages.decontam import (batch_ngrams, bench_ngram_set,
                                            ngram_decontaminate)

SF = "/root/testdata/sf0.001"


def _py_ngrams(text: str, n: int):
    toks = text.split()
    return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}


def test_batch_ngrams_matches_python():
    texts = pa.array(["a b c d e f", "x y", "", "  p  q r s  ", None,
                      "one two three four"])
    grams, gram_doc = batch_ngrams(texts, 3)
    got = {}
    for g, d in zip(grams.to_pylist(), gram_doc.tolist()):
        got.setdefault(d, []).append(g)
    for i, t in enumerate(texts.to_pylist()):
        toks = (t or "").split()
        want = [" ".join(toks[j:j + 3]) for j in range(len(toks) - 2)]
        assert got.get(i, []) == want, i


def test_decontaminate_matches_bruteforce_sf0001():
    import pyarrow.parquet as pq

    N = 5
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    ids = t["doc_id"].to_pylist()
    texts = t["text"].to_pylist()
    bench_grams = set()
    for d, x in zip(ids, texts):
        if d % 97 == 0:
            bench_grams |= _py_ngrams(x, N)
    want = {d: len(_py_ngrams(x, N) & bench_grams)
            for d, x in zip(ids, texts)}

    docs = ray.data.read_parquet(f"{SF}/documents.parquet",
                                 columns=["doc_id", "text"])
    bench = docs.filter(
        lambda r: r["doc_id"] % 97 == 0)
    out = ngram_decontaminate(docs, bench, n=N).to_pandas()
    got = dict(zip(out["doc_id"].astype(int), out["n_hits"].astype(int)))
    assert got == want
    # benchmark members self-hit everything they have
    assert all(got[d] > 0 for d in ids if d % 97 == 0 and len(
        texts[ids.index(d)].split()) >= N)


def test_decontaminate_planted_and_short_docs():
    bench_tbl = pa.table({
        "doc_id": pa.array([0], pa.int64()),
        "text": pa.array(["alpha beta gamma delta epsilon zeta"]),
    })
    corpus_tbl = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array([
            # contains exactly one bench 5-gram window twice -> distinct=1
            "x alpha beta gamma delta epsilon y alpha beta gamma delta "
            "epsilon z",
            "totally unrelated words here and there today",
            "alpha beta gamma",              # < n tokens: no grams
            "beta gamma delta epsilon zeta"  # a different bench 5-gram
        ]),
    })
    corpus = ray.data.from_arrow(corpus_tbl)
    ref = bench_ngram_set(ray.data.from_arrow(bench_tbl), n=5)
    out = ngram_decontaminate(corpus, ref, n=5).to_pandas()
    got = dict(zip(out["doc_id"].astype(int), out["n_hits"].astype(int)))
    assert got == {1: 1, 2: 0, 3: 0, 4: 1}


def test_decontaminate_empty_bench():
    corpus = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["a b c d e f", "g h i j k l"]),
    }))
    bench = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "text": pa.array([], pa.string()),
    }))
    out = ngram_decontaminate(corpus, bench, n=5).to_pandas()
    assert out["n_hits"].tolist() == [0, 0]
