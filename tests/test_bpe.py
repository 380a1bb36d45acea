"""BPE merge training (stages/bpe.py) vs an independent python replay."""

from collections import Counter

import pyarrow as pa
import ray

from featurebox_ray.stages.bpe import END, bpe_train, merge_loop

SF = "/root/testdata/sf0.001"


def _py_bpe(word_counts: Counter, num_merges: int):
    """Independent dict-based replay (different code path from
    stages/bpe.merge_loop)."""
    vocab = {tuple(w) + (END,): c for w, c in word_counts.items()}
    out = []
    for rank in range(num_merges):
        pc_: Counter = Counter()
        for sym, c in vocab.items():
            for a, b in zip(sym, sym[1:]):
                pc_[(a, b)] += c
        if not pc_:
            break
        best_cnt = max(pc_.values())
        best = min(p for p, c in pc_.items() if c == best_cnt)
        out.append((rank, best[0], best[1], best_cnt))
        nv = {}
        for sym, c in vocab.items():
            ns, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and (sym[i], sym[i + 1]) == best:
                    ns.append(best[0] + best[1])
                    i += 2
                else:
                    ns.append(sym[i])
                    i += 1
            nv[tuple(ns)] = nv.get(tuple(ns), 0) + c
        vocab = nv
    return out


def test_bpe_classic_textbook_example():
    # Sennrich's example vocabulary
    wc = Counter()
    for w, c in [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]:
        wc[w] += c
    words, counts = zip(*wc.items())
    merges = merge_loop(list(words), list(counts), 4)
    assert merges == _py_bpe(wc, 4)
    # first merge must be the famous ('e','s') with count 9
    assert merges[0][1:] == ("e", "s", 9)


def test_bpe_train_matches_replay_sf0001():
    import pyarrow.parquet as pq
    t = pq.read_table(f"{SF}/documents.parquet", columns=["text"])
    wc = Counter()
    for x in t["text"].to_pylist():
        wc.update((x or "").split())
    want = _py_bpe(wc, 15)

    docs = ray.data.read_parquet(f"{SF}/documents.parquet",
                                 columns=["doc_id", "text"])
    got_t = bpe_train(docs, num_merges=15, num_partitions=4)
    got = list(zip(got_t["merge_rank"].to_pylist(),
                   got_t["left"].to_pylist(),
                   got_t["right"].to_pylist(),
                   got_t["pair_count"].to_pylist()))
    assert got == want


def test_bpe_empty_corpus():
    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1], pa.int64()),
        "text": pa.array([""]),
    }))
    out = bpe_train(docs, num_merges=5)
    assert out.num_rows == 0
