"""embedding_period_drift (stages/cohesion.py) — serial replay fuzz
with missing sides, zero vectors, NULLs, at 2 partitionings."""

import numpy as np
import pyarrow as pa
import ray

from featurebox_ray.stages.cohesion import (embedding_period_drift,
                                            quantize_half_up)


def test_embedding_period_drift_fuzz_vs_replay():
    rng = np.random.default_rng(315)
    n, dim = 600, 6
    V = rng.normal(size=(n, dim))
    labels = rng.integers(0, 5, n).astype(object)
    labels[::47] = None
    # label 4: only in the first half (missing side -> NULL)
    ids = np.arange(n, dtype=np.int64)
    labels[(ids > n // 2) & (labels == 4)] = 0
    vecs = list(V)
    vecs[13] = None                        # NULL vector drops
    t = pa.table({
        "vec_id": pa.array(ids),
        "embedding": pa.array(
            [None if v is None else list(map(float, v))
             for v in vecs], pa.list_(pa.float64())),
        "label": pa.array(list(labels), pa.int64()),
    })
    # serial replay with exact ints; the cut is over SURVIVING ids
    # (prep drops null label/vector rows before the span reduce)
    surv = [int(ids[i]) for i in range(n)
            if labels[i] is not None and vecs[i] is not None]
    cut = min(surv) + (max(surv) - min(surv)) * 1 // 2
    agg = {}
    for i in range(n):
        if labels[i] is None or vecs[i] is None:
            continue
        side = 1 if ids[i] > cut else 0
        q = quantize_half_up(np.asarray(vecs[i])[None, :], 10)[0]
        e = agg.setdefault((int(labels[i]), side),
                           [0, np.zeros(dim, object)])
        e[0] += 1
        e[1] = e[1] + q.astype(object)
    want = {}
    for L in sorted({k for k, _ in agg}):
        a, b = agg.get((L, 0)), agg.get((L, 1))
        nb = a[0] if a else 0
        na = b[0] if b else 0
        if not a or not b:
            want[L] = (nb, na, None)
            continue
        dot = int(sum(x * y for x, y in zip(a[1], b[1])))
        u2 = int(sum(x * x for x in a[1]))
        v2 = int(sum(x * x for x in b[1]))
        val = float(dot * dot) / float(u2 * v2)
        want[L] = (nb, na, -val if dot < 0 else val)
    prev = None
    for parts in (1, 5):
        ds = ray.data.from_arrow(t)
        if parts > 1:
            ds = ds.repartition(parts)
        out = embedding_period_drift(ds, quant_bits=10)
        got = {int(r["label"]): (int(r["n_before"]),
                                 int(r["n_after"]),
                                 r["cos2_signed"])
               for r in out.to_pylist()}
        assert set(got) == set(want)
        for L in want:
            assert got[L][:2] == want[L][:2], L
            if want[L][2] is None:
                assert got[L][2] is None, L
            else:
                assert got[L][2] == want[L][2], L
        if prev is not None:
            assert got == prev
        prev = got
