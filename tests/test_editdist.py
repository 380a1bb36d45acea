"""PassJoin edit-distance join (stages/editdist.py) vs brute force."""

import numpy as np
import pyarrow as pa
import pytest
import ray

from featurebox_ray.stages.editdist import (_seg_bounds, batch_levenshtein,
                                            edit_distance_join)


def _ref_lev(a, b):
    m, n = len(a), len(b)
    dp = list(range(n + 1))
    for i in range(1, m + 1):
        prev, dp[0] = dp[0], i
        for j in range(1, n + 1):
            cur = min(dp[j] + 1, dp[j - 1] + 1,
                      prev + (a[i - 1] != b[j - 1]))
            prev, dp[j] = dp[j], cur
    return dp[n]


def test_batch_levenshtein_fuzz():
    rng = np.random.default_rng(2)
    A, B = [], []
    for _ in range(300):
        A.append("".join(rng.choice(list("abc"), rng.integers(0, 14))))
        B.append("".join(rng.choice(list("abc"), rng.integers(0, 14))))
    got = batch_levenshtein(pa.array(A, pa.string()),
                            pa.array(B, pa.string()))
    assert got.tolist() == [_ref_lev(a, b) for a, b in zip(A, B)]


def test_seg_bounds_tile_exactly():
    for d in (1, 2, 3):
        for n in range(d + 1, 40):
            covered = 0
            prev_end = 0
            for i in range(d + 1):
                p, L = _seg_bounds(np.array([n]), i, d)
                assert int(p[0]) == prev_end
                prev_end = int(p[0]) + int(L[0])
                covered += int(L[0])
            assert covered == n


def _corpus(rng, n_base=100, d=2):
    base = ["".join(rng.choice(list("abcdefgh"), rng.integers(6, 28)))
            for _ in range(n_base)]
    docs = list(base)
    for i in range(0, n_base // 2, 3):
        s = list(base[i])
        op = rng.integers(0, 3)
        if op == 0:
            s[rng.integers(len(s))] = "z"
        elif op == 1:
            s.insert(int(rng.integers(len(s))), "q")
        else:
            del s[rng.integers(len(s))]
        docs.append("".join(s))
    return docs


@pytest.mark.parametrize("d", [1, 2])
def test_edit_distance_join_matches_bruteforce(d):
    rng = np.random.default_rng(7 + d)
    docs = _corpus(rng, d=d)
    t = pa.table({"doc_id": pa.array(range(len(docs)), pa.int64()),
                  "s": pa.array(docs)})
    want = set()
    for i in range(len(docs)):
        for j in range(i + 1, len(docs)):
            if min(len(docs[i]), len(docs[j])) >= d + 1:
                dd = _ref_lev(docs[i], docs[j])
                if dd <= d:
                    want.add((i, j, dd))
    got = edit_distance_join(ray.data.from_arrow(t).repartition(4),
                             id_col="doc_id", str_col="s", d=d,
                             num_partitions=4).to_pandas()
    gset = set(zip(got.id_a.astype(int), got.id_b.astype(int),
                   got.dist.astype(int)))
    assert gset == want


def test_edit_distance_join_guards_and_short_strings():
    t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "s": pa.array(["ab", "ab", "abcdef"])})
    # strings shorter than d+1 are excluded -> no pairs from "ab"
    got = edit_distance_join(ray.data.from_arrow(t), id_col="doc_id",
                             str_col="s", d=2,
                             num_partitions=2).to_pandas()
    assert len(got) == 0

    with pytest.raises(ValueError, match="d must"):
        edit_distance_join(ray.data.from_arrow(t), id_col="doc_id",
                           str_col="s", d=0)

    long = pa.table({"doc_id": pa.array([1], pa.int64()),
                     "s": pa.array(["x" * 300])})
    with pytest.raises(Exception, match="max_len"):
        edit_distance_join(ray.data.from_arrow(long), id_col="doc_id",
                           str_col="s", d=2, max_len=64).to_pandas()
