"""Learning curve (stages/regress.py:learning_curve) vs the serial
replay; monotone-improvement sanity on a planted linear model;
partition invariance."""

import numpy as np
import pyarrow as pa
import ray

from _oracle_replays import replay_learning_curve
from featurebox_ray.stages.regress import learning_curve


def test_learning_curve_matches_replay_partition_invariant():
    rng = np.random.default_rng(277)
    n, d = 1500, 5
    x = rng.uniform(-1, 1, (n, d)).astype(np.float32)
    w = rng.uniform(-2, 2, d)
    y = x.astype(np.float64) @ w + 0.5 + rng.normal(0, 0.3, n)
    ids = np.arange(n)
    vecs = [row.astype(np.float64).tolist() for row in x]
    ylist = list(y)
    idlist = [int(i) for i in ids]
    vecs[3] = None
    ylist[7] = None
    idlist[11] = None
    exp = replay_learning_curve(vecs, ylist, idlist,
                                n_train_buckets=5, quant_bits=10,
                                y_scale=10000, coef_bits=14,
                                lam_num=1, lam_den=1000)
    t = pa.table({
        "embedding": pa.array(vecs, pa.list_(pa.float32())),
        "label": pa.array(ylist, pa.float64()),
        "vid": pa.array(idlist, pa.int64()),
    })
    prev = None
    for parts in (1, 6):
        ds = ray.data.from_arrow(t)
        if parts > 1:
            ds = ds.repartition(parts)
        got = learning_curve(ds, id_col="vid", n_train_buckets=5,
                             quant_bits=10, y_scale=10000,
                             coef_bits=14, lam_num=1,
                             lam_den=1000).to_pandas()
        rows = [tuple(r) for r in
                zip(got.k, got.n_train, got.n_test, got.rmse,
                    got.r2)]
        assert [(int(a), int(b), int(c), float(dd), float(e))
                for a, b, c, dd, e in rows] == exp
        if prev is not None:
            assert rows == prev
        prev = rows
    # sanity: more data should not make the planted fit much worse;
    # the full-data point must be a good fit
    assert got.r2.iloc[-1] > 0.9
    assert got.rmse.iloc[-1] <= got.rmse.iloc[0] + 1e-9
    assert got.n_train.is_monotonic_increasing
