"""Count-min sketch term estimates (stages/sketch.py)."""

import hashlib

import numpy as np
import pyarrow as pa
import pytest
import ray

from featurebox_ray.stages.sketch import HASH_HEX_DIGITS, \
    cms_term_estimates


def _ds(texts, n_parts=3):
    t = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    return ray.data.from_arrow(t).repartition(n_parts)


def test_cms_overestimates_and_serial_replay():
    rng = np.random.default_rng(29)
    vocab = [f"w{i}" for i in range(60)]
    texts = [" ".join(rng.choice(vocab, size=int(rng.integers(1, 40))))
             for _ in range(50)]
    depth, width, qk = 3, 64, 10  # narrow width forces collisions
    got = (cms_term_estimates(_ds(texts), depth=depth, width=width,
                              query_k=qk, num_partitions=2)
           .to_pandas().sort_values("term").reset_index(drop=True))
    assert len(got) == qk
    assert (got["cms_est"] >= got["exact_cnt"]).all()

    # serial replay: identical md5 buckets, identical min
    from collections import Counter
    cnt = Counter(w for t in texts for w in t.split())
    mat = np.zeros((depth, width), np.int64)
    for term, c in cnt.items():
        for j in range(depth):
            b = int(hashlib.md5(f"{j} {term}".encode())
                    .hexdigest()[:HASH_HEX_DIGITS], 16) % width
            mat[j, b] += c
    for _, r in got.iterrows():
        assert r["exact_cnt"] == cnt[r["term"]]
        want = min(mat[j, int(hashlib.md5(f'{j} {r["term"]}'.encode())
                              .hexdigest()[:HASH_HEX_DIGITS], 16) % width]
                   for j in range(depth))
        assert r["cms_est"] == want

    # partition invariance
    again = (cms_term_estimates(_ds(texts, 7), depth=depth, width=width,
                                query_k=qk, num_partitions=5)
             .to_pandas().sort_values("term").reset_index(drop=True))
    assert got.equals(again)

    # a roomy sketch is exact for every queried term
    roomy = cms_term_estimates(_ds(texts), depth=4, width=4096,
                               query_k=qk).to_pandas()
    assert (roomy["cms_est"] == roomy["exact_cnt"]).all()

    with pytest.raises(ValueError, match="positive"):
        cms_term_estimates(_ds(texts), depth=0)
