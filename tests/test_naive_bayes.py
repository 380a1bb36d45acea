"""Multinomial Naive Bayes (stages/nb.py) — replay parity, planted
class recovery, prefit cross-scoring."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from _oracle_replays import replay_multinomial_nb
from featurebox_ray.stages.nb import (fit_multinomial_nb,
                                      multinomial_nb_predict)


def _corpus(seed=7, n=240):
    rng = np.random.default_rng(seed)
    themes = {"en": ["the", "cat", "dog", "house"],
              "fr": ["le", "chat", "chien", "maison"],
              "de": ["der", "katze", "hund", "haus"]}
    shared = ["x1", "x2", "x3"]
    ids, texts, labels = [], [], []
    for i in range(n):
        lab = ["en", "fr", "de"][i % 3]
        k = int(rng.integers(0, 8))
        ws = list(rng.choice(themes[lab] + shared, k)) if k else []
        ids.append(i)
        texts.append(" ".join(ws) if ws else
                     (None if rng.random() < 0.5 else ""))
        labels.append(None if rng.random() < 0.05 else lab)
    return ids, texts, labels


def test_nb_replay_parity_partition_invariant():
    ids, texts, labels = _corpus()
    exp = replay_multinomial_nb(ids, texts, labels, top_v=10,
                                add_k=1.0).sort_values(
        "doc_id").reset_index(drop=True)
    t = pa.table({"doc_id": pa.array(ids, pa.int64()),
                  "text": pa.array(texts, pa.string()),
                  "lang": pa.array(labels, pa.string())})
    prev = None
    for parts in (1, 5, 11):
        ds = ray.data.from_arrow(t)
        if parts > 1:
            ds = ds.repartition(parts)
        got = (multinomial_nb_predict(ds, top_v=10, add_k=1.0,
                                      num_partitions=4)
               .to_pandas().sort_values("doc_id")
               .reset_index(drop=True))
        pd.testing.assert_frame_equal(got, exp, check_exact=True)
        if prev is not None:
            assert got.equals(prev)
        prev = got


def test_nb_recovers_planted_classes():
    # long unambiguous docs must classify correctly
    ids = list(range(60))
    texts = (["the cat dog house the cat"] * 20
             + ["le chat chien maison le chat"] * 20
             + ["der katze hund haus der katze"] * 20)
    labels = ["en"] * 20 + ["fr"] * 20 + ["de"] * 20
    t = pa.table({"doc_id": pa.array(ids, pa.int64()),
                  "text": pa.array(texts, pa.string()),
                  "lang": pa.array(labels, pa.string())})
    got = (multinomial_nb_predict(ray.data.from_arrow(t), top_v=32)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert got.pred.tolist() == labels


def test_nb_prefit_cross_scoring():
    # fit on train, score a disjoint corpus (decontamination shape)
    ids, texts, labels = _corpus(seed=11)
    train = pa.table({"doc_id": pa.array(ids, pa.int64()),
                      "text": pa.array(texts, pa.string()),
                      "lang": pa.array(labels, pa.string())})
    model = fit_multinomial_nb(ray.data.from_arrow(train), top_v=16)
    test = pa.table({"doc_id": pa.array([1000, 1001], pa.int64()),
                     "text": pa.array(["le chat chien", "der hund"],
                                      pa.string()),
                     "lang": pa.array([None, None], pa.string())})
    got = (multinomial_nb_predict(ray.data.from_arrow(test),
                                  model=model)
           .to_pandas().sort_values("doc_id"))
    assert got.pred.tolist() == ["fr", "de"]
