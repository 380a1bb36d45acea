"""BPE merge training (stages/bpe.py) vs the independent replay
(_oracle_replays.replay_bpe_merges — the q75 fixture implementation)."""

import pyarrow as pa
import ray

from _oracle_replays import replay_bpe_merges
from featurebox_ray.stages.bpe import merge_loop, bpe_train

SF = "/root/testdata/sf0.001"


def _rows(df):
    return list(df.itertuples(index=False, name=None))


def test_bpe_classic_textbook_example():
    # Sennrich's example vocabulary, expanded to raw text
    text = " ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6
                    + ["widest"] * 3)
    want = _rows(replay_bpe_merges([text], 4))
    words = ["low", "lower", "newest", "widest"]
    merges = merge_loop(words, [5, 2, 6, 3], 4)
    assert merges == want
    # first merge must be the famous ('e','s') with count 9
    assert merges[0][1:] == ("e", "s", 9)


def test_bpe_train_matches_replay_sf0001():
    import pyarrow.parquet as pq
    t = pq.read_table(f"{SF}/documents.parquet", columns=["text"])
    want = _rows(replay_bpe_merges(t["text"].to_pylist(), 15))

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
