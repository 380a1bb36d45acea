"""Cleaning chain (pipelines/cleaning.py) vs brute-force python."""

from collections import Counter

import numpy as np
import pyarrow as pa
import ray

from featurebox_ray.pipelines.cleaning import clean_corpus

SF = "/root/testdata/sf0.001"


def _py_clean(ids, texts, *, n=5, min_tokens=20, max_dw=0.5,
              max_tb=0.125, max_tt=0.0625):
    first = {}
    for d, x in zip(ids, texts):
        if x not in first or d < first[x]:
            first[x] = d
    surv = {first[x] for x in first}
    bench = set()
    for d, x in zip(ids, texts):
        if d % 97 == 0:
            toks = x.split()
            bench |= {" ".join(toks[i:i + n])
                      for i in range(len(toks) - n + 1)}
    kept = {}
    for d, x in zip(ids, texts):
        if d not in surv:
            continue
        toks = x.split()
        nt = len(toks)
        if nt < min_tokens:
            continue
        dw = np.float64(nt - len(set(toks))) / nt
        big = Counter(zip(toks, toks[1:]))
        tb = np.float64(max(big.values())) / (nt - 1) if nt >= 2 else 0.0
        tri = Counter(zip(toks, toks[1:], toks[2:]))
        tt = np.float64(max(tri.values())) / (nt - 2) if nt >= 3 else 0.0
        hits = len({" ".join(toks[i:i + n])
                    for i in range(nt - n + 1)} & bench)
        if dw <= max_dw and tb <= max_tb and tt <= max_tt and hits == 0:
            kept[d] = nt
    return kept


def test_clean_corpus_matches_bruteforce_sf0001():
    import pyarrow.parquet as pq
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    ids, texts = t["doc_id"].to_pylist(), t["text"].to_pylist()
    want = _py_clean(ids, texts)

    docs = ray.data.read_parquet(f"{SF}/documents.parquet",
                                 columns=["doc_id", "text"])

    def keep_bench(b: pa.Table) -> pa.Table:
        arr = b["doc_id"].to_numpy(zero_copy_only=False)
        return b.filter(pa.array(arr % 97 == 0))

    bench = ray.data.read_parquet(
        f"{SF}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(keep_bench, batch_format="pyarrow", zero_copy_batch=True)
    out = clean_corpus(docs, bench, num_partitions=4).to_pandas()
    got = dict(zip(out["doc_id"].astype(int), out["n_tokens"].astype(int)))
    assert got == want
    assert 0 < len(got) < len(ids)  # the filter actually discriminates


def test_clean_corpus_drops_exact_duplicates():
    base = "many distinct tokens " + " ".join(f"w{i}" for i in range(30))
    tbl = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([base, base, base + " extra"]),
    })
    empty_bench = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "text": pa.array([], pa.string()),
    }))
    out = clean_corpus(ray.data.from_arrow(tbl), empty_bench,
                       num_partitions=2).to_pandas()
    assert sorted(out["doc_id"].tolist()) == [1, 3]  # 2 is an exact dup
