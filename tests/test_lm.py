"""Bigram LM perplexity scoring (stages/lm.py)."""

import numpy as np
import pyarrow as pa
import ray

from featurebox_ray.stages.lm import (bigram_lm_perplexity, fit_bigram_lm,
                                      score_bigrams)


def _ds(rows, n_parts=3):
    t = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    })
    return ray.data.from_arrow(t).repartition(n_parts)


def _serial_replay(rows, top_v, add_k):
    """Independent serial recomputation: Counter vocab/bigrams, per-doc
    sequential scalar accumulation (matches reduceat's left-to-right)."""
    from collections import Counter

    tok = {i: (t or "").split() for i, t in rows}
    counts = Counter(w for ws in tok.values() for w in ws)
    vocab = sorted(sorted(counts), key=lambda w: (-counts[w], w))[:top_v]
    slot = {w: i for i, w in enumerate(sorted(vocab))}
    V = len(vocab)
    n_slots = V + 1
    bi = Counter()
    for ws in tok.values():
        ss = [slot.get(w, V) for w in ws]
        for u, v in zip(ss, ss[1:]):
            bi[(u, v)] += 1
    ctx = Counter()
    for (u, _), c in bi.items():
        ctx[u] += c
    out = {}
    for i, ws in tok.items():
        ss = [slot.get(w, V) for w in ws]
        nb = max(len(ss) - 1, 0)
        ps = np.array([
            (np.float64(bi.get((u, v), 0)) + add_k) /
            (np.float64(ctx.get(u, 0)) + add_k * n_slots)
            for u, v in zip(ss, ss[1:])], np.float64)
        # the documented per-doc reduction op is np.add.reduceat (its
        # slice result depends only on the slice contents — verified in
        # test_log2_exp2_elementwise_deterministic's sibling below)
        acc = (np.add.reduceat(np.log2(ps), [0])[0] if nb
               else np.float64(0.0))
        ppl = float(np.exp2(-(acc / nb))) if nb else None
        out[i] = (nb, float(acc), ppl)
    return out


def test_lm_hand_case_and_replay_bitexact():
    rows = [
        (1, "the cat sat on the mat"),
        (2, "the cat sat"),
        (3, "zzz qqq zzz"),
        (4, "one"),               # single token -> 0 bigrams
        (5, ""),                  # empty -> 0 bigrams
        (6, None),                # null text -> 0 bigrams
    ]
    got = (bigram_lm_perplexity(_ds(rows), top_v=4, add_k=0.5)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert list(got["doc_id"]) == [1, 2, 3, 4, 5, 6]
    want = _serial_replay(rows, top_v=4, add_k=0.5)
    for _, r in got.iterrows():
        nb, lp, ppl = want[r["doc_id"]]
        assert r["n_bigrams"] == nb
        assert r["logprob"] == lp          # bit-exact
        if ppl is None:
            assert r["n_bigrams"] == 0 and np.isnan(r["ppl"])
        else:
            assert r["ppl"] == ppl


def test_lm_partition_invariance_fuzz():
    rng = np.random.default_rng(11)
    vocab = [f"w{i:02d}" for i in range(30)]
    rows = [(i, " ".join(rng.choice(vocab,
                                    size=int(rng.integers(0, 40)))))
            for i in range(120)]
    base = None
    for parts in (1, 4, 9):
        got = (bigram_lm_perplexity(_ds(rows, parts), top_v=12,
                                    add_k=0.25, num_partitions=3)
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        if base is None:
            base = got
        else:
            assert got["n_bigrams"].equals(base["n_bigrams"])
            # bit-exact under any block structure
            assert np.array_equal(got["logprob"].to_numpy(),
                                  base["logprob"].to_numpy())
            assert np.array_equal(got["ppl"].to_numpy(),
                                  base["ppl"].to_numpy(), equal_nan=True)
    want = _serial_replay(rows, top_v=12, add_k=0.25)
    for _, r in base.iterrows():
        assert r["logprob"] == want[r["doc_id"]][1]


def test_lm_quality_signal():
    # corpus-like docs score lower perplexity than shuffled gibberish
    common = "the quick brown fox jumps over the lazy dog"
    rows = [(i, common) for i in range(20)]
    rows.append((100, common))
    rows.append((101, "dog the over fox quick lazy jumps brown the"))
    # alternating OOV: every bigram has an in-vocab context with a large
    # total but an unseen continuation (a single all-OOV doc would
    # self-train a high UNK->UNK transition — the classic artifact)
    rows.append((102, "the xq the zz the yy the qq"))
    got = {r["doc_id"]: r["ppl"] for r in
           bigram_lm_perplexity(_ds(rows), top_v=16, add_k=0.5)
           .to_pandas().to_dict("records")}
    assert got[100] < got[101]
    assert got[100] < got[102]


def test_log2_exp2_elementwise_deterministic():
    # the bit-exactness contract of stages/lm.py rests on this host
    # property: vectorized log2/exp2 equal their scalar applications
    rng = np.random.default_rng(3)
    x = rng.random(4096) * 0.98 + 0.01
    assert np.array_equal(np.log2(x),
                          np.array([np.log2(v) for v in x]))
    y = rng.random(4096) * 20 - 10
    assert np.array_equal(np.exp2(y),
                          np.array([np.exp2(v) for v in y]))
    # reduceat positional invariance: a slice's reduction depends only
    # on the slice contents, not its position in the enclosing array
    big = rng.random(10000)
    r_in_place = np.add.reduceat(big, [0, 17, 4000])[1]
    r_isolated = np.add.reduceat(big[17:4000].copy(), [0])[0]
    assert r_in_place == r_isolated


def test_lm_cross_scoring_prefit_model():
    train = [(i, "a b c a b c a b") for i in range(10)]
    model = fit_bigram_lm(_ds(train), top_v=8)
    target = [(1, "a b c"), (2, "c b a")]
    got = (bigram_lm_perplexity(_ds(target, 1), model=model, add_k=0.5)
           .to_pandas().sort_values("doc_id"))
    # "a b" and "b c" are trained transitions; "c b"/"b a" are not
    assert got.iloc[0]["ppl"] < got.iloc[1]["ppl"]
    # score_bigrams is shared by engine and replay: spot-check one value
    vterms, ps, pcnt, ctx = model
    n_slots = len(vterms) + 1
    lp = score_bigrams(np.array([0 * n_slots + 1]), ps, pcnt, ctx,
                       n_slots, 0.5)
    assert np.isfinite(lp).all()
