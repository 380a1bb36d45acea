"""Exact-substring duplicate-span detection (stages/substr.py)."""

import numpy as np
import pyarrow as pa
import pytest
import ray

from featurebox_ray.stages.substr import dup_spans


def _ds(rows, n_parts=3):
    t = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    })
    return ray.data.from_arrow(t).repartition(n_parts)


def _collect(ds):
    return sorted(ds.to_pandas().itertuples(index=False, name=None))


def test_dup_spans_hand_case():
    # docs 1 and 2 share the 10-token run "a b c d e f g h i j";
    # doc 3 repeats its own 4-gram twice (same-doc repeats count);
    # doc 4 is unique and short docs emit nothing.
    shared = "a b c d e f g h i j"
    rows = [
        (1, f"{shared} unique1 tail1 x y z"),
        (2, f"pre1 pre2 {shared} tail2"),
        (3, "p q r s gap1 gap2 p q r s"),
        (4, "totally different words with no duplicate gram here ok"),
        (5, "tiny doc"),
    ]
    got = _collect(dup_spans(_ds(rows), k=4, min_count=2,
                             num_partitions=4))
    # shared 10-token run = 7 dup 4-grams -> one merged span of 10 tokens
    assert (1, 1, 11, 10) in got
    assert (2, 3, 13, 10) in got
    # doc 3: "p q r s" at positions 1 and 7 -> two disjoint spans
    assert (3, 1, 5, 4) in got and (3, 7, 11, 4) in got
    assert not [r for r in got if r[0] in (4, 5)]


def test_dup_spans_adjacent_merge_and_modes():
    # positions whose intervals touch (s == prev e) merge into one span
    rows = [
        (1, "w1 w2 a b c X a b c w3"),  # "a b c" twice (k=3)
        (2, "z a b c z2 z3 z4 z5"),
    ]
    got = _collect(dup_spans(_ds(rows, 2), k=3, min_count=2,
                             num_partitions=3))
    assert (1, 3, 6, 3) in got and (1, 7, 10, 3) in got
    assert (2, 2, 5, 3) in got

    # poly mode produces identical spans (hash family differs only)
    a = _collect(dup_spans(_ds(rows, 2), k=3, hash_mode="md5"))
    b = _collect(dup_spans(_ds(rows, 2), k=3, hash_mode="poly"))
    assert a == b

    with pytest.raises(ValueError, match="hash_mode"):
        dup_spans(_ds(rows), hash_mode="sha9")


def test_dup_spans_partition_invariance_fuzz():
    rng = np.random.default_rng(73)
    vocab = [f"t{i}" for i in range(30)]
    docs = []
    for i in range(60):
        n = int(rng.integers(0, 40))
        docs.append((i, " ".join(rng.choice(vocab, size=n))))
    a = _collect(dup_spans(_ds(docs, 2), k=5, num_partitions=3))
    b = _collect(dup_spans(_ds(docs, 7), k=5, num_partitions=8))
    assert a == b
    c = _collect(dup_spans(_ds(docs, 7), k=5, num_partitions=8,
                           hash_mode="poly"))
    assert a == c
    # serial replay: count 5-grams globally, mark docs, merge intervals
    from collections import Counter
    grams = Counter()
    per_doc = {}
    for i, txt in docs:
        toks = txt.split()
        gs = [" ".join(toks[j:j + 5]) for j in range(len(toks) - 4)]
        per_doc[i] = gs
        grams.update(gs)
    want = []
    for i, gs in per_doc.items():
        spans = []
        for j, g in enumerate(gs):
            if grams[g] >= 2:
                s, e = j + 1, j + 6
                if spans and s <= spans[-1][1]:
                    spans[-1][1] = e
                else:
                    spans.append([s, e])
        want += [(i, s, e, e - s) for s, e in spans]
    assert a == sorted(want)


def test_dup_token_stats_matches_serial_and_duckdb():
    from featurebox_ray.stages.substr import dup_token_stats

    shared = "a b c d e f g h i j"
    rows = [
        (1, f"{shared} unique1 tail1 x y z"),   # 15 tokens, 10 dup
        (2, f"pre1 pre2 {shared} tail2"),       # 13 tokens, 10 dup
        (3, "p q r s gap1 gap2 p q r s"),       # 10 tokens, 8 dup
        (4, "no duplicated grams in here at all truly"),
        (5, ""),                                 # zero tokens -> no row
    ]
    got = {r["doc_id"]: r for r in
           dup_token_stats(_ds(rows), k=4, min_count=2,
                           num_partitions=3).to_pandas()
           .to_dict("records")}
    assert set(got) == {1, 2, 3, 4}
    assert (got[1]["n_tokens"], got[1]["dup_tokens"]) == (15, 10)
    assert (got[2]["n_tokens"], got[2]["dup_tokens"]) == (13, 10)
    assert (got[3]["n_tokens"], got[3]["dup_tokens"]) == (10, 8)
    assert (got[4]["n_tokens"], got[4]["dup_tokens"]) == (8, 0)
    assert got[1]["dup_frac"] == 10.0 / 15.0
    assert got[4]["dup_frac"] == 0.0

    # fuzz vs serial replay + md5/poly/partitioning invariance
    import numpy as np
    rng = np.random.default_rng(101)
    vocab = [f"t{i}" for i in range(25)]
    docs = [(i, " ".join(rng.choice(vocab, size=int(rng.integers(0, 35)))))
            for i in range(50)]
    a = (dup_token_stats(_ds(docs, 2), k=5, num_partitions=3)
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    b = (dup_token_stats(_ds(docs, 7), k=5, num_partitions=8,
                         hash_mode="poly")
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert a.equals(b)
    from collections import Counter
    grams = Counter()
    per_doc = {}
    for i, txt in docs:
        toks = txt.split()
        gs = [" ".join(toks[j:j + 5]) for j in range(len(toks) - 4)]
        per_doc[i] = (len(toks), gs)
    for _, (nt, gs) in per_doc.items():
        grams.update(gs)
    for _, r in a.iterrows():
        nt, gs = per_doc[r["doc_id"]]
        spans = []
        for j, g in enumerate(gs):
            if grams[g] >= 2:
                s_, e_ = j + 1, j + 6
                if spans and s_ <= spans[-1][1]:
                    spans[-1][1] = e_
                else:
                    spans.append([s_, e_])
        dup = sum(e_ - s_ for s_, e_ in spans)
        assert (r["n_tokens"], r["dup_tokens"]) == (nt, dup)
        assert r["dup_frac"] == dup / nt


def test_normalize_text_and_canon_dedup():
    from featurebox_ray.stages.dedup import exact_dedup
    from featurebox_ray.stages.text import normalize_text

    rows = [
        (1, "Hello   World"),
        (2, "hello world"),          # same canonical form as 1
        (3, "  HELLO WORLD  "),      # and again
        (4, "different text"),
        (5, None),
    ]
    ds = _ds(rows, 2)
    canon = normalize_text(ds, text_col="text", out_col="norm_text")
    got = canon.to_pandas().set_index("doc_id")
    assert got.loc[1, "norm_text"] == "hello world"
    assert got.loc[3, "norm_text"] == "hello world"
    assert got.loc[4, "norm_text"] == "different text"
    assert got.loc[5, "norm_text"] is None

    kept = (exact_dedup(canon, text_col="norm_text", id_col="doc_id",
                        num_partitions=3).to_pandas())
    # min-id representative per canonical form survives
    assert sorted(kept["doc_id"]) == [1, 4, 5]


def test_exact_dedup_keeps_all_null_texts():
    from featurebox_ray.stages.dedup import exact_dedup

    rows = [(1, "same text"), (2, "same text"), (3, None), (4, None),
            (5, None)]
    kept = exact_dedup(_ds(rows, 2), text_col="text", id_col="doc_id",
                       num_partitions=3).to_pandas()
    # one survivor per real text; ALL null-text rows kept
    assert sorted(kept["doc_id"]) == [1, 3, 4, 5]
