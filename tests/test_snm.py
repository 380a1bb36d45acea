"""Sorted-neighborhood near-dup (stages/snm.py) vs a serial replay."""

import numpy as np
import pyarrow as pa
import pytest
import ray

from featurebox_ray.stages.snm import snm_neardup


def _serial(ids, texts, lens, window, tau100):
    rows = [(l, i, t) for i, t, l in zip(ids, texts, lens)
            if len(t.split()) > 0]
    rows.sort()
    out = {}
    for a in range(len(rows)):
        for b in range(a + 1, min(a + window + 1, len(rows))):
            ta = set(rows[a][2].split())
            tb = set(rows[b][2].split())
            ni = len(ta & tb)
            u = len(ta | tb)
            if 100 * ni >= tau100 * u:
                out[(rows[a][1], rows[b][1])] = float(ni) / float(u)
    return out


def _make_corpus(seed=3, n=80):
    rng = np.random.default_rng(seed)
    vocab = [f"w{i}" for i in range(30)]
    texts, ids, lens = [], [], []
    base = " ".join(rng.choice(vocab, 12))
    for i in range(n):
        if i % 3 == 0:          # planted near-dup family
            t = base + (" extra" if i % 6 == 0 else "")
        elif i % 7 == 0:
            t = ""              # zero-token doc: dropped pre-rank
        else:
            t = " ".join(rng.choice(vocab, int(rng.integers(3, 15))))
        texts.append(t)
        ids.append(i)
        lens.append(len(t))
    return ids, texts, lens


@pytest.mark.parametrize("window", [1, 4, 200])
def test_snm_matches_serial_replay(window):
    ids, texts, lens = _make_corpus()
    expect = _serial(ids, texts, lens, window, 60)
    t = pa.table({"doc_id": pa.array(ids, pa.int64()),
                  "text": pa.array(texts),
                  "n_chars": pa.array(lens, pa.int64())})
    for parts in (1, 7):
        ds = ray.data.from_arrow(t)
        if parts > 1:
            ds = ds.repartition(parts)
        res = snm_neardup(ds, sort_cols=["n_chars"], window=window,
                          tau100=60, num_partitions=5).to_pandas()
        got = {(r.id_a, r.id_b): r.jaccard for r in res.itertuples()}
        assert got == expect  # bit-exact pairs + similarity


def test_snm_rejects_bad_params():
    with pytest.raises(ValueError):
        snm_neardup(None, window=0)
    with pytest.raises(ValueError):
        snm_neardup(None, tau100=0)
