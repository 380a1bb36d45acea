"""next_latency (stages/funnel.py) and weighted_jaccard
(stages/tfidf.py)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from featurebox_ray.stages.funnel import next_latency
from featurebox_ray.stages.tfidf import weighted_jaccard


def test_next_latency_hand_case():
    rows = [
        (1, 10, "a"), (1, 20, "b"), (1, 25, "a"), (1, 25, "b"),
        (1, 40, "b"),
        # a@10 -> b@20 (lat 10); a@25 -> b@40 (strict: b@25 excluded)
        (2, 5, "a"),                      # unmatched
        (3, 7, "b"),                      # no a rows -> no output row
    ]
    t = pa.table({
        "u": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.int64()),
        "eid": pa.array(list(range(len(rows))), pa.int64()),
        "ty": pa.array([r[2] for r in rows], pa.string())})
    prev = None
    for parts in (1, 3):
        ds = ray.data.from_arrow(t)
        if parts > 1:
            ds = ds.repartition(parts)
        df = (next_latency(ds, key_col="u", ts_col="ts",
                           seq_col="eid", type_col="ty",
                           a_type="a", b_type="b",
                           num_partitions=4)
              .to_pandas().sort_values("u").reset_index(drop=True))
        assert list(df.u) == [1, 2]
        r1 = df.iloc[0]
        # latencies [10, 15] -> disc median = element at
        # ceil(0.5*2)-1 = 0 -> 10
        assert (r1.n_a, r1.n_matched, r1.med_latency) == (2, 2, 10)
        r2 = df.iloc[1]
        assert (r2.n_a, r2.n_matched) == (1, 0)
        assert pd.isna(r2.med_latency)
        if prev is not None:
            pd.testing.assert_frame_equal(df, prev, check_exact=True)
        prev = df


def test_weighted_jaccard_hand_and_invariance():
    docs = pa.table({
        "src": pa.array(["A", "A", "B", "C"]),
        "text": pa.array(["x x y", "z", "x y y", None])})
    # A: x2 y1 z1 (tot 4); B: x1 y2 (tot 3)
    # min: x1 + y1 = 2; max = 4 + 3 - 2 = 5
    prev = None
    for parts in (1, 3):
        ds = ray.data.from_arrow(docs)
        if parts > 1:
            ds = ds.repartition(parts)
        df = (weighted_jaccard(ds, group_col="src",
                               text_col="text", num_partitions=4)
              .to_pandas().sort_values(["g_a", "g_b"])
              .reset_index(drop=True))
        assert len(df) == 1          # C has no tokens
        r = df.iloc[0]
        assert (r.g_a, r.g_b, r.sum_min, r.sum_max) == ("A", "B",
                                                        2, 5)
        assert r.wjac == 2.0 / 5.0
        if prev is not None:
            pd.testing.assert_frame_equal(df, prev, check_exact=True)
        prev = df


def test_weighted_jaccard_fuzz_vs_serial():
    rng = np.random.default_rng(23)
    vocab = [f"w{i}" for i in range(30)]
    srcs, texts = [], []
    for _ in range(200):
        srcs.append(f"s{rng.integers(4)}")
        texts.append(" ".join(rng.choice(vocab,
                                         rng.integers(1, 20))))
    from collections import Counter

    bags = {}
    for s, tx in zip(srcs, texts):
        bags.setdefault(s, Counter()).update(tx.split())
    exp = {}
    ks = sorted(bags)
    for i, a in enumerate(ks):
        for b in ks[i + 1:]:
            mn = sum((bags[a] & bags[b]).values())
            mx = sum(bags[a].values()) + sum(bags[b].values()) - mn
            exp[(a, b)] = (mn, mx)
    ds = ray.data.from_arrow(pa.table({
        "src": pa.array(srcs), "text": pa.array(texts)}))
    df = weighted_jaccard(ds.repartition(5), group_col="src",
                          text_col="text",
                          num_partitions=4).to_pandas()
    got = {(r.g_a, r.g_b): (r.sum_min, r.sum_max)
           for r in df.itertuples()}
    assert got == exp
