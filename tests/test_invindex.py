"""Inverted index (stages/invindex.py) vs brute-force python."""

import pyarrow as pa
import ray

from featurebox_ray.stages.invindex import inverted_index

SF = "/root/testdata/sf0.001"


def _py_index(ids, texts, min_df=1):
    post = {}
    for d, x in zip(ids, texts):
        for w in set((x or "").split()):
            post.setdefault(w, []).append(d)
    return {t: (len(ps), ",".join(str(i) for i in sorted(ps)))
            for t, ps in post.items() if len(ps) >= min_df}


def _run(ds, **kw):
    out = inverted_index(ds, **kw).to_pandas()
    return {r.term: (int(r.df), r.postings) for r in out.itertuples()}


def test_inverted_index_matches_bruteforce_sf0001():
    import pyarrow.parquet as pq
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    want = _py_index(t["doc_id"].to_pylist(), t["text"].to_pylist())
    ds = ray.data.read_parquet(f"{SF}/documents.parquet",
                               columns=["doc_id", "text"])
    for parts in (3, 8):
        assert _run(ds, num_partitions=parts) == want


def test_inverted_index_min_df_prunes_hapax():
    tbl = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["shared rare1", "shared rare2", "shared"]),
    })
    want = _py_index([1, 2, 3],
                     ["shared rare1", "shared rare2", "shared"], min_df=2)
    got = _run(ray.data.from_arrow(tbl), num_partitions=2, min_df=2)
    assert got == want == {"shared": (3, "1,2,3")}


def test_inverted_index_repeated_term_counts_doc_once():
    tbl = pa.table({
        "doc_id": pa.array([9], pa.int64()),
        "text": pa.array(["dup dup dup other"]),
    })
    got = _run(ray.data.from_arrow(tbl), num_partitions=1)
    assert got == {"dup": (1, "9"), "other": (1, "9")}
