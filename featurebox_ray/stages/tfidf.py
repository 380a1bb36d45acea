"""Distributed TF-IDF — term-frequency × inverse-document-frequency over a
document table, with per-document top-k term extraction.

Three-stage shape (the classic two-pass text pipeline at scale):

1. **TF / partial-DF pass** (streaming map): tokenize each batch
   (``stages/dedup.split_tokens`` — Arrow C++ whitespace splitter), count
   terms per document (documents are rows, so TF is batch-local), and emit
   per-term partial document counts.
2. **DF aggregate** (the one keyed exchange): sum partial DFs per term —
   the shuffle moves ``(term, count)`` pairs, never documents.
3. **Score pass** (streaming map): the DF vocabulary broadcasts once
   (``ray.put`` of a sorted term array + counts; lookups are one
   ``searchsorted`` per batch) and each batch re-derives its TFs and picks
   its documents' top-k terms.

IDF here is the exact rational ``N / df`` (no logarithm): ``ln`` differs
in ulps between libm implementations, while ``tf * (N / df)`` is two IEEE
ops that DuckDB reproduces bit-exactly — the ranking is the same
monotone transform, and results value-hash end to end.

Scale notes (100 TB): the vocabulary broadcast is O(distinct terms); for
open-vocabulary corpora cap it (min-DF prune inside stage 2 — terms with
df=1 can never rank above a repeated term within the same doc) or swap
stage 3's broadcast for the semi-join fetch shape of
``dedup.verify_jaccard_pairs``.  Tokenization runs twice (stages 1 and 3)
to keep the exchange term-sized; materializing the tokenized table
instead would ship every token through the object store.

Reference analog: none (the reference has no text pipeline); this is a
beyond-reference LLM-data operator alongside dedup/ANN/text-analysis.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .dedup import adjacent_token_indices, split_tokens


def _doc_term_tf(batch: pa.Table, id_col: str, text_col: str):
    """(doc_ids, terms, tf) for every distinct (doc, term) pair in the
    batch — vectorized: tokenize, lexsort (row, term), run-length."""
    texts = batch[text_col].combine_chunks()
    flat, off = split_tokens(texts)
    n_rows = batch.num_rows
    if len(flat) == 0:
        return (np.empty(0, np.int64), flat, np.empty(0, np.int64))
    row_ids = np.repeat(np.arange(n_rows), np.diff(off))
    # dictionary-encode tokens once; runs of equal (row, code) give TF
    dct = pc.dictionary_encode(flat)
    codes = dct.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((codes, row_ids))
    r_s, c_s = row_ids[order], codes[order]
    new_run = np.ones(len(r_s), bool)
    new_run[1:] = (r_s[1:] != r_s[:-1]) | (c_s[1:] != c_s[:-1])
    starts = np.flatnonzero(new_run)
    tf = np.diff(np.concatenate([starts, [len(r_s)]]))
    doc_idx = r_s[starts]
    docs = batch[id_col].combine_chunks().take(
        pa.array(doc_idx, pa.int64()))
    terms = dct.dictionary.take(pa.array(c_s[starts], pa.int64()))
    return docs, terms, tf.astype(np.int64)


def tfidf_topk(ds, *, id_col: str = "doc_id", text_col: str = "text",
               k: int = 3, num_partitions: int = 8,
               n_docs: int | None = None):
    """Top-k terms per document by ``tf * (N / df)``, ties broken by
    ascending term.  Returns ``(id_col, term, tf:int64, tfidf:float64)``.

    ``n_docs``: pass the corpus row count when ``ds`` ends in expensive
    lazy stages — the default ``ds.count()`` is metadata-cheap on a
    parquet read but executes the full chain on a mapped dataset (the
    same hazard as ``.schema()``, see bench.py's flagship probe).
    """
    import ray

    from .partition import materialized_block_refs, partitioned_map

    if n_docs is None:
        n_docs = ds.count()

    def df_partial(batch: pa.Table) -> pa.Table:
        _, terms, _ = _doc_term_tf(batch, id_col, text_col)
        # every (doc, term) pair is distinct -> per-term pair count is
        # this batch's document frequency
        dct = pc.dictionary_encode(terms) if len(terms) else None
        if dct is None:
            return pa.table({"term": pa.array([], pa.string()),
                             "df": pa.array([], pa.int64())})
        counts = np.bincount(
            dct.indices.to_numpy(zero_copy_only=False),
            minlength=len(dct.dictionary))
        return pa.table({"term": dct.dictionary,
                         "df": pa.array(counts.astype(np.int64))})

    def df_combine(t: pa.Table) -> pa.Table:
        dct = pc.dictionary_encode(t["term"].combine_chunks())
        sums = np.zeros(len(dct.dictionary), np.int64)
        np.add.at(sums, dct.indices.to_numpy(zero_copy_only=False),
                  t["df"].to_numpy(zero_copy_only=False))
        return pa.table({"term": dct.dictionary, "df": pa.array(sums)})

    partials = ds.map_batches(df_partial, batch_format="pyarrow",
                              zero_copy_batch=True)
    df_ds = partitioned_map(partials, df_combine, key="term",
                            sort_keys=["term"],
                            num_partitions=num_partitions,
                            strategy="tasks")
    blocks = [b for b in ray.get(materialized_block_refs(df_ds))
              if b.num_rows > 0]
    if not blocks:
        empty = pa.schema([(id_col, pa.int64()), ("term", pa.string()),
                           ("tf", pa.int64()), ("tfidf", pa.float64())])
        return ray.data.from_arrow(empty.empty_table())
    vocab = pa.concat_tables(blocks, promote_options="default")
    # vocabulary sorted by term (Arrow bytewise = DuckDB binary collation):
    # `index_in` positions double as the ascending-term tie-break key
    vocab = vocab.take(pc.sort_indices(vocab["term"]))
    vterms = vocab["term"].combine_chunks()
    vdfs = vocab["df"].to_numpy(zero_copy_only=False).astype(np.float64)
    vocab_ref = ray.put((vterms, vdfs))

    def score(batch: pa.Table) -> pa.Table:
        vterms_, vdfs_ = ray.get(vocab_ref)
        docs, terms, tf = _doc_term_tf(batch, id_col, text_col)
        if len(tf) == 0:
            return pa.table({id_col: docs, "term": terms,
                             "tf": pa.array([], pa.int64()),
                             "tfidf": pa.array([], pa.float64())})
        pos = pc.index_in(terms, value_set=vterms_).to_numpy(
            zero_copy_only=False).astype(np.int64)
        df = vdfs_[pos]
        tfidf = tf.astype(np.float64) * (float(n_docs) / df)
        # top-k per doc by (tfidf desc, term asc = vocab pos asc); docs
        # are contiguous after the lexsort
        doc_np = docs.to_numpy(zero_copy_only=False)
        order = np.lexsort((pos, -tfidf, doc_np))
        d_s = doc_np[order]
        starts = np.flatnonzero(
            np.concatenate([[True], d_s[1:] != d_s[:-1]]))
        run_id = np.cumsum(
            np.concatenate([[0], (d_s[1:] != d_s[:-1]).astype(np.int64)]))
        rank = np.arange(len(d_s)) - starts[run_id]
        sel = order[rank < k]
        sel_arr = pa.array(sel, pa.int64())
        return pa.table({
            id_col: docs.take(sel_arr),
            "term": terms.take(sel_arr),
            "tf": pa.array(tf[sel], pa.int64()),
            "tfidf": pa.array(tfidf[sel], pa.float64()),
        })

    return ds.map_batches(score, batch_format="pyarrow",
                          zero_copy_batch=True)


def top_terms(ds, *, id_col: str = "doc_id", text_col: str = "text",
              k: int = 10, by: str = "doc_freq", num_partitions: int = 8):
    """Exact global heavy hitters: the ``k`` most frequent terms in the
    corpus, by document frequency (``by="doc_freq"``, counts each doc
    once per term) or total occurrences (``by="term_count"``).

    Classic exact distributed top-k — no Misra-Gries/count-min error
    bound needed because counts fully aggregate before any truncation:

    1. per-block partial ``(term, count)`` rows (vectorized run-length);
    2. ONE term-keyed exchange sums partials per term (the shuffle moves
       O(blocks × vocab) tiny rows, never tokens);
    3. each partition emits its LOCAL top-k (sound: per-term counts are
       already global after step 2, so the global top-k is a subset of
       the union of partition-local top-ks);
    4. the ≤ k × partitions survivors meet in one final partition for
       the global pick.

    Deterministic total order ``(count desc, term asc)`` — the LIMIT
    boundary is stable and SQL replays it bit-exactly.  Returns
    ``(term:string, cnt:int64)``.

    ``doc_freq`` assumes one row per document (the document-table
    contract shared with :func:`tfidf_topk`): (doc, term) pairs dedupe
    within a block, so a doc_id duplicated ACROSS blocks counts once
    per row, where SQL ``count(DISTINCT doc_id)`` counts once globally.
    Run :func:`~featurebox_ray.stages.dedup.exact_dedup` first if the
    corpus may contain duplicate ids.
    """
    from .partition import partitioned_map

    if by not in ("doc_freq", "term_count"):
        raise ValueError("by must be 'doc_freq' or 'term_count'")

    def partial(batch: pa.Table) -> pa.Table:
        if by == "doc_freq":
            _, terms, _ = _doc_term_tf(batch, id_col, text_col)
            if len(terms) == 0:
                return pa.table({"term": pa.array([], pa.string()),
                                 "cnt": pa.array([], pa.int64())})
            dct = pc.dictionary_encode(terms)
            counts = np.bincount(
                dct.indices.to_numpy(zero_copy_only=False),
                minlength=len(dct.dictionary))
        else:
            flat, _ = split_tokens(batch[text_col].combine_chunks())
            if len(flat) == 0:
                return pa.table({"term": pa.array([], pa.string()),
                                 "cnt": pa.array([], pa.int64())})
            dct = pc.dictionary_encode(flat)
            counts = np.bincount(
                dct.indices.to_numpy(zero_copy_only=False),
                minlength=len(dct.dictionary))
        return pa.table({"term": dct.dictionary,
                         "cnt": pa.array(counts.astype(np.int64))})

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True, batch_size=None)
    return _exact_topk_exchange(partials, k=k,
                                num_partitions=num_partitions)


def _exact_topk_exchange(partials, *, k: int, num_partitions: int):
    """Shared tail of the exact heavy-hitters plan: sum ``(term, cnt)``
    partials per term on one keyed exchange, partition-local top-k
    (sound post-summation), one final global pick under the
    deterministic ``(count desc, term asc)`` order."""
    from .partition import partitioned_map

    def sum_local_topk(t: pa.Table) -> pa.Table:
        dct = pc.dictionary_encode(t["term"].combine_chunks())
        sums = np.zeros(len(dct.dictionary), np.int64)
        np.add.at(sums, dct.indices.to_numpy(zero_copy_only=False),
                  t["cnt"].to_numpy(zero_copy_only=False))
        # local top-k by (count desc, term asc); dictionary order is not
        # sorted, so rank terms bytewise first
        term_rank = pc.sort_indices(dct.dictionary)  # positions by term
        inv = np.empty(len(dct.dictionary), np.int64)
        inv[term_rank.to_numpy(zero_copy_only=False)] = np.arange(
            len(dct.dictionary))
        order = np.lexsort((inv, -sums))[:k]
        return pa.table({
            "term": dct.dictionary.take(pa.array(order, pa.int64())),
            "cnt": pa.array(sums[order]),
        })

    local = partitioned_map(partials, sum_local_topk, key="term",
                            sort_keys=["term"],
                            num_partitions=num_partitions,
                            strategy="tasks")

    def global_topk(t: pa.Table) -> pa.Table:
        # survivors are already fully summed; just order and cut
        sums = t["cnt"].to_numpy(zero_copy_only=False)
        term_rank = pc.sort_indices(t["term"].combine_chunks())
        inv = np.empty(t.num_rows, np.int64)
        inv[term_rank.to_numpy(zero_copy_only=False)] = np.arange(
            t.num_rows)
        order = np.lexsort((inv, -sums))[:k]
        return t.take(pa.array(order, pa.int64()))

    return partitioned_map(local, global_topk, key="term",
                           sort_keys=["term"], num_partitions=1,
                           strategy="tasks")


def top_bigrams(ds, *, id_col: str = "doc_id", text_col: str = "text",
                k: int = 20, num_partitions: int = 8):
    """Exact global top-k adjacent word bigrams — corpus collocation
    analysis (boilerplate detection, common-phrase mining) on the same
    exact heavy-hitters plan as :func:`top_terms`: per-block partial
    ``(bigram, cnt)`` rows (vectorized: adjacency mask over the token
    offsets + one ``binary_join_element_wise``), one term-keyed exchange,
    local-then-global top-k under ``(count desc, bigram asc)``.

    Returns ``(bigram:string, cnt:int64)``.  The bigram string is the
    two tokens joined by a single space — exactly SQL's
    ``array_to_string(list_slice(tokens, i, i+1), ' ')``, so the oracle
    replays it 1:1 (the q26/q84 gram convention).
    """

    def partial(batch: pa.Table) -> pa.Table:
        texts = pc.fill_null(batch[text_col].combine_chunks(), "")
        flat, off = split_tokens(texts)
        empty = pa.table({"term": pa.array([], pa.string()),
                          "cnt": pa.array([], pa.int64())})
        if len(flat) < 2:
            return empty
        counts = np.diff(off)
        sel = adjacent_token_indices(counts)
        if len(sel) == 0:
            return empty
        a = flat.take(pa.array(sel, pa.int64()))
        b = flat.take(pa.array(sel + 1, pa.int64()))
        grams = pc.binary_join_element_wise(a, b, " ")
        dct = pc.dictionary_encode(grams)
        cnt = np.bincount(dct.indices.to_numpy(zero_copy_only=False),
                          minlength=len(dct.dictionary))
        return pa.table({"term": dct.dictionary.cast(pa.string()),
                         "cnt": pa.array(cnt.astype(np.int64))})

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True, batch_size=None)
    out = _exact_topk_exchange(partials, k=k,
                               num_partitions=num_partitions)

    def rename(t: pa.Table) -> pa.Table:
        return t.rename_columns(["bigram", "cnt"])

    return out.map_batches(rename, batch_format="pyarrow",
                           zero_copy_batch=True)


def corpus_freq_score(ds, *, id_col: str = "doc_id",
                      text_col: str = "text", top_v: int = 512,
                      num_partitions: int = 8):
    """Corpus-frequency familiarity scoring — the integer-exact core of
    the CCNet/KenLM quality-filter recipe (Wenzek et al. 2020): docs
    whose tokens are common in the corpus score high, gibberish scores
    low.  Instead of a log-probability LM score (libm ulps differ across
    engines), the score is pure int64 counting, so it is exact under any
    summation order AND replayable in SQL:

    1. :func:`top_terms` computes the exact global top-``top_v``
       vocabulary with total occurrence counts (term-keyed exchange of
       per-block partials; the shuffle moves O(blocks × vocab) rows);
    2. the tiny ``(term, count)`` vocabulary is ``ray.put`` ONCE and
       every score task reads it from the object store — no shuffle
       touches the documents themselves;
    3. per block, ``pc.index_in`` maps tokens to vocab slots and two
       bincount/add.at passes produce per-doc ``n_tokens``,
       ``n_invocab`` (tokens found in the vocabulary) and ``fam_sum``
       (sum of the corpus counts of in-vocab tokens, int64).

    Zero-token (and null-text) documents emit nothing, matching SQL
    ``unnest``.  Downstream filters use e.g. ``n_invocab / n_tokens``
    (OOV rate) or ``fam_sum / n_tokens`` (mean familiarity).

    Reference analog: none; added-for-100-TB corpus cleaning alongside
    the Gopher repetition signals (stages/repetition.py).
    """
    import ray

    from .partition import materialized_block_refs

    vocab_ds = top_terms(ds, id_col=id_col, text_col=text_col, k=top_v,
                         by="term_count", num_partitions=num_partitions)
    blocks = [b for b in ray.get(materialized_block_refs(vocab_ds))
              if b.num_rows > 0]
    out_schema = pa.schema([(id_col, pa.int64()),
                            ("n_tokens", pa.int64()),
                            ("n_invocab", pa.int64()),
                            ("fam_sum", pa.int64())])
    if not blocks:
        return ray.data.from_arrow(out_schema.empty_table())
    vocab = pa.concat_tables(blocks, promote_options="default")
    vterms = vocab["term"].combine_chunks()
    vcnts = vocab["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
    vocab_ref = ray.put((vterms, vcnts))

    def score(batch: pa.Table) -> pa.Table:
        vterms_, vcnts_ = ray.get(vocab_ref)
        texts = pc.fill_null(batch[text_col].combine_chunks(), "")
        flat, off = split_tokens(texts)
        n = batch.num_rows
        counts = np.diff(off)
        if len(flat) == 0:
            # preserve the caller's id type (out_schema fixes int64 only
            # for the vocab-empty early return, where no batch exists)
            return pa.table({
                id_col: batch[id_col].combine_chunks().slice(0, 0),
                "n_tokens": pa.array([], pa.int64()),
                "n_invocab": pa.array([], pa.int64()),
                "fam_sum": pa.array([], pa.int64())})
        pos = pc.fill_null(pc.index_in(flat, value_set=vterms_), -1
                           ).to_numpy(zero_copy_only=False).astype(np.int64)
        row_ids = np.repeat(np.arange(n), counts)
        iv = pos >= 0
        fam = np.zeros(n, np.int64)
        np.add.at(fam, row_ids[iv], vcnts_[pos[iv]])
        niv = np.bincount(row_ids[iv], minlength=n).astype(np.int64)
        keep = counts > 0
        ids = batch[id_col].combine_chunks().filter(pa.array(keep))
        return pa.table({
            id_col: ids,
            "n_tokens": pa.array(counts[keep].astype(np.int64)),
            "n_invocab": pa.array(niv[keep]),
            "fam_sum": pa.array(fam[keep]),
        })

    return ds.map_batches(score, batch_format="pyarrow",
                          zero_copy_batch=True)
