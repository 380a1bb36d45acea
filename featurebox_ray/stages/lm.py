"""Bigram language-model perplexity scoring — the KenLM-shaped quality
filter of the CCNet recipe (Wenzek et al. 2020): train an n-gram LM on
the corpus (here n=2 with add-k smoothing over an exact top-V
vocabulary + UNK), then score every document by per-token log2
probability and perplexity.  Low perplexity ⇒ the document looks like
the corpus; gibberish and boilerplate score high.

Physical plan (two passes, one keyed exchange, zero corpus shuffle):

1. **Vocabulary**: :func:`~featurebox_ray.stages.tfidf.top_terms`
   (``by="term_count"``) computes the exact global top-``top_v`` terms
   (deterministic ``(count desc, term asc)`` boundary).  Out-of-vocab
   tokens map to a single UNK id ``V``.
2. **Bigram counts**: per block, tokens map to vocab slots
   (``pc.index_in`` against the sorted vocab — one searchsorted-shaped
   lookup per batch) and adjacent within-document pairs encode as one
   int64 ``u*(V+1)+v``.  Per-block partial ``(pair, cnt)`` rows ride ONE
   pair-keyed exchange (the shuffle moves O(blocks × distinct-bigrams)
   tiny rows, never tokens).  Context counts need no second exchange:
   ``ctx(u) = Σ_v c(u,v)`` is a row-sum of the bigram table.
3. **Score pass** (streaming map): the fitted model — sorted pair ids,
   counts, context counts — broadcasts ONCE via ``ray.put`` (≤ (V+1)²
   int64 cells, ~0.5 MiB at V=256); each batch recomputes its bigrams
   and scores ``p(w_i|w_{i-1}) = (c(u,v) + k) / (ctx(u) + k·(V+1))``.

Exactness contract: counts are int64 (order-independent-exact); each
document's ``logprob = Σ log2 p`` reduces with ``np.add.reduceat`` over
the doc's own contiguous bigram slice — reduceat is positionally
invariant (a slice's sum depends only on the slice contents, verified
in tests), and ``np.log2`` / ``np.exp2`` are elementwise-deterministic
on this host — so the distributed result is BIT-IDENTICAL to a serial
replay applying the same reduction under any partitioning.  No SQL oracle (log2 of a rational is not expressible
exactly); the q112 fixture replays the arithmetic serially.

Scale notes (100 TB): the model broadcast is O(V²) worst-case — fine
for the quality-filter regime (V ≤ a few thousand); for open-vocab LMs
swap step 3's broadcast for the semi-join fetch shape of
``dedup.verify_jaccard_pairs`` (route doc bigrams to count partitions).
Training reads the corpus once, scoring once more — the same
two-tokenize trade as ``tfidf.tfidf_topk``.

Reference analog: none (the reference has no text pipeline); this is a
beyond-reference LLM-training-data operator alongside
``tfidf.corpus_freq_score`` (its integer-exact little sibling) and the
Gopher repetition signals.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .dedup import adjacent_token_indices, split_tokens
from .tfidf import top_terms


def _token_slots(texts, vterms) -> tuple[np.ndarray, np.ndarray]:
    """Tokenize ``texts`` and map each token to its vocab slot
    (position in the SORTED vocab array) or UNK = len(vterms).
    Returns (slots, per-row token counts)."""
    flat, off = split_tokens(pc.fill_null(texts, ""))
    counts = np.diff(off)
    if len(flat) == 0:
        return np.empty(0, np.int64), counts
    pos = pc.fill_null(pc.index_in(flat, value_set=vterms),
                       len(vterms)).to_numpy(zero_copy_only=False)
    return pos.astype(np.int64), counts


def _doc_bigrams(slots: np.ndarray, counts: np.ndarray,
                 n_slots: int) -> tuple[np.ndarray, np.ndarray]:
    """Adjacent within-document (u, v) pairs as ``u*n_slots + v`` in
    document order.  Returns (pair ids, per-row bigram counts)."""
    n_bi = np.maximum(counts - 1, 0)
    if len(slots) == 0:
        return np.empty(0, np.int64), n_bi
    sel = adjacent_token_indices(counts)
    pair = slots[sel] * n_slots + slots[sel + 1]
    return pair, n_bi


def fit_bigram_lm(ds, *, text_col: str = "text", top_v: int = 256,
                  num_partitions: int = 8, id_col: str = "doc_id"):
    """Train the corpus bigram model.  Returns ``(vterms, pair_sorted,
    pair_cnts, ctx)``: the sorted vocab array, sorted int64 bigram ids
    with their global counts, and per-context totals (length V+1,
    UNK last)."""
    import ray

    from .partition import materialized_block_refs, partitioned_map

    vocab_ds = top_terms(ds, id_col=id_col, text_col=text_col, k=top_v,
                         by="term_count", num_partitions=num_partitions)
    vblocks = [b for b in ray.get(materialized_block_refs(vocab_ds))
               if b.num_rows > 0]
    if vblocks:
        vocab = pa.concat_tables(vblocks, promote_options="default")
        vterms = vocab["term"].combine_chunks().take(
            pc.sort_indices(vocab["term"]))
    else:
        vterms = pa.array([], pa.string())
    n_slots = len(vterms) + 1  # + UNK

    def pair_partial(batch: pa.Table) -> pa.Table:
        slots, counts = _token_slots(batch[text_col].combine_chunks(),
                                     vterms)
        pair, _ = _doc_bigrams(slots, counts, n_slots)
        u, c = np.unique(pair, return_counts=True)
        return pa.table({"pair": pa.array(u, pa.int64()),
                         "cnt": pa.array(c.astype(np.int64))})

    def pair_combine(t: pa.Table) -> pa.Table:
        p = t["pair"].to_numpy(zero_copy_only=False)
        c = t["cnt"].to_numpy(zero_copy_only=False)
        u, inv = np.unique(p, return_inverse=True)
        sums = np.zeros(len(u), np.int64)
        np.add.at(sums, inv, c)
        return pa.table({"pair": pa.array(u, pa.int64()),
                         "cnt": pa.array(sums)})

    partials = ds.map_batches(pair_partial, batch_format="pyarrow",
                              zero_copy_batch=True, batch_size=None)
    pair_ds = partitioned_map(partials, pair_combine, key="pair",
                              sort_keys=["pair"],
                              num_partitions=num_partitions,
                              strategy="tasks")
    blocks = [b for b in ray.get(materialized_block_refs(pair_ds))
              if b.num_rows > 0]
    if blocks:
        pairs = pa.concat_tables(blocks, promote_options="default")
        pr = pairs["pair"].to_numpy(zero_copy_only=False)
        cn = pairs["cnt"].to_numpy(zero_copy_only=False)
        order = np.argsort(pr, kind="stable")
        pair_sorted, pair_cnts = pr[order], cn[order]
    else:
        pair_sorted = np.empty(0, np.int64)
        pair_cnts = np.empty(0, np.int64)
    ctx = np.zeros(n_slots, np.int64)
    np.add.at(ctx, pair_sorted // n_slots, pair_cnts)
    return vterms, pair_sorted, pair_cnts, ctx


def score_bigrams(pair: np.ndarray, pair_sorted: np.ndarray,
                  pair_cnts: np.ndarray, ctx: np.ndarray,
                  n_slots: int, add_k: float) -> np.ndarray:
    """log2 p(v|u) for each encoded bigram, add-k smoothed.  Shared by
    the distributed score pass and the serial replay so both sides run
    the IDENTICAL float expression."""
    if len(pair_sorted) == 0:
        c_uv = np.zeros(len(pair), np.float64)
    else:
        idx = np.searchsorted(pair_sorted, pair)
        idx_c = np.minimum(idx, len(pair_sorted) - 1)
        hit = pair_sorted[idx_c] == pair
        c_uv = np.where(hit, pair_cnts[idx_c], 0).astype(np.float64)
    c_u = ctx[pair // n_slots].astype(np.float64)
    p = (c_uv + add_k) / (c_u + add_k * n_slots)
    return np.log2(p)


def bigram_lm_perplexity(ds, *, id_col: str = "doc_id",
                         text_col: str = "text", top_v: int = 256,
                         add_k: float = 0.5, num_partitions: int = 8,
                         model=None):
    """Per-document bigram-LM log-probability and perplexity.

    Emits one row per input row: ``(id_col, n_bigrams:int64,
    logprob:float64, ppl:float64)``; documents with fewer than two
    tokens (including null text) get ``n_bigrams=0, logprob=0.0,
    ppl=NULL``.  ``ppl = 2^(-logprob / n_bigrams)``.

    ``model``: pass a prefitted :func:`fit_bigram_lm` tuple to score a
    different corpus than the one trained on (decontamination-style
    cross-scoring); default trains on ``ds`` itself.
    """
    import ray

    if model is None:
        model = fit_bigram_lm(ds, text_col=text_col, top_v=top_v,
                              num_partitions=num_partitions,
                              id_col=id_col)
    vterms, pair_sorted, pair_cnts, ctx = model
    n_slots = len(vterms) + 1
    model_ref = ray.put((vterms, pair_sorted, pair_cnts, ctx))

    def score(batch: pa.Table) -> pa.Table:
        vt, ps, pcnt, cx = ray.get(model_ref)
        slots, counts = _token_slots(batch[text_col].combine_chunks(), vt)
        pair, n_bi = _doc_bigrams(slots, counts, n_slots)
        logp = score_bigrams(pair, ps, pcnt, cx, n_slots, add_k)
        # per-document sequential sum (reduceat reduces left-to-right in
        # document token order -> partition-invariant, replayable)
        starts = np.concatenate([[0], np.cumsum(n_bi)[:-1]]).astype(
            np.int64)
        lp_doc = np.zeros(len(n_bi), np.float64)
        has = n_bi > 0
        if np.any(has):
            lp_doc[has] = np.add.reduceat(logp, starts[has])
        with np.errstate(divide="ignore", invalid="ignore"):
            ppl = np.exp2(-(lp_doc / n_bi))
        return pa.table({
            id_col: batch[id_col],
            "n_bigrams": pa.array(n_bi.astype(np.int64)),
            "logprob": pa.array(lp_doc),
            "ppl": pa.array(np.where(has, ppl, np.nan), pa.float64(),
                            mask=~has),
        })

    return ds.map_batches(score, batch_format="pyarrow",
                          zero_copy_batch=True)
