"""Marginal-novelty curve (stages/tfidf.py:novelty_curve)."""

import numpy as np
import pyarrow as pa
import ray

from featurebox_ray.stages.tfidf import novelty_curve


def test_novelty_curve_vs_serial():
    rng = np.random.default_rng(21)
    vocab = [f"w{i}" for i in range(120)]
    n = 400
    texts = [" ".join(rng.choice(vocab,
                                 size=rng.integers(0, 12)).tolist())
             for _ in range(n)]
    texts[7] = None
    ids = np.arange(n, dtype=np.int64)
    rng.shuffle(ids)
    t = pa.table({"doc_id": pa.array(ids),
                  "text": pa.array(texts, pa.string())})
    # serial reference
    first = {}
    for did, tx in zip(ids, texts):
        for w in (tx or "").split():
            if w not in first or did < first[w]:
                first[w] = did
    B = 50
    want = {}
    for w, d in first.items():
        want[d // B] = want.get(d // B, 0) + 1
    for parts in (1, 4):
        got = novelty_curve(ray.data.from_arrow(t).repartition(3),
                            bucket_size=B,
                            num_partitions=parts).to_pandas()
        assert got["bucket"].tolist() == sorted(want)
        assert got["n_new_terms"].tolist() == [want[b] for b in
                                               sorted(want)]
        assert got["cum_new_terms"].tolist() == list(
            np.cumsum([want[b] for b in sorted(want)]))
        assert got["cum_new_terms"].iloc[-1] == len(first)


def test_novelty_curve_empty_and_all_null():
    t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "text": pa.array([None, "   "], pa.string())})
    got = novelty_curve(ray.data.from_arrow(t)).to_pandas()
    assert len(got) == 0
