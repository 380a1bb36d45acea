"""Embedding diversity (stages/cohesion.py:group_embedding_diversity)
vs a brute-force pairwise replay; partition invariance."""

import numpy as np
import pyarrow as pa
import ray

from featurebox_ray.stages.cohesion import (group_embedding_diversity,
                                            quantize_half_up)


def _brute(x, g, quant_bits):
    out = {}
    for gv in sorted(set(g)):
        q = quantize_half_up(x[np.asarray(g) == gv], quant_bits)\
            .astype(np.int64)
        n = len(q)
        if n < 2:
            out[gv] = (n, None)
            continue
        num = 0
        for i in range(n):
            for j in range(n):
                if i != j:
                    d = q[i] - q[j]
                    num += int((d * d).sum())
        out[gv] = (n, float(num) / float(n * (n - 1))
                   / float(1 << (2 * quant_bits)))
    return out


def test_embed_diversity_matches_bruteforce_partition_invariant():
    rng = np.random.default_rng(292)
    n, d = 120, 5
    x = rng.normal(0, 1, (n, d)).astype(np.float32).astype(np.float64)
    g = list(rng.integers(0, 4, n))
    g[0] = 9                      # singleton group -> NULL mean_d2
    exp = _brute(x, g, 8)
    # tight group must read as less diverse than a spread one
    vecs = [row.tolist() for row in x]
    t = pa.table({
        "label": pa.array(g, pa.int64()),
        "embedding": pa.array(vecs, pa.list_(pa.float32()))})
    prev = None
    for parts in (1, 6):
        ds = ray.data.from_arrow(t)
        if parts > 1:
            ds = ds.repartition(parts)
        got = group_embedding_diversity(ds, group_col="label",
                                        quant_bits=8).to_pandas()
        rows = {int(r.label): (int(r.n),
                               None if np.isnan(r.mean_d2)
                               else float(r.mean_d2))
                for r in got.itertuples()}
        assert rows == exp
        if prev is not None:
            assert rows == prev
        prev = rows
    assert rows[9] == (1, None)
