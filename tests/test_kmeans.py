"""Distributed k-means (stages/kmeans.py) vs the serial reference —
bit-exactness under re-partitioning is the module's contract.
"""

import numpy as np
import pyarrow as pa
import ray

from featurebox_ray.stages.kmeans import (_iterate_serial, assign,
                                          kmeans_cluster_stats, kmeans_fit,
                                          quantize)


def _mkds(x_raw, ids, parts):
    t = pa.table({"vec_id": pa.array(ids, pa.int64()),
                  "embedding": pa.array([row.tolist() for row in x_raw],
                                        pa.list_(pa.float32()))})
    return ray.data.from_arrow(t).repartition(parts)


def test_kmeans_bitexact_vs_serial_and_partitions():
    rng = np.random.default_rng(21)
    n, d, k, iters = 400, 16, 5, 4
    x_raw = rng.normal(size=(n, d)).astype(np.float32)
    ids = np.arange(n)

    x = quantize(x_raw.astype(np.float64), 10)
    cents_s, a_s = _iterate_serial(x, k, iters)

    for parts in (2, 7):
        cents_e, labels = kmeans_fit(_mkds(x_raw, ids, parts), k=k,
                                     iters=iters, quant_bits=10,
                                     batch_size=64)
        assert (cents_e == cents_s).all()          # bit-exact centroids
        got = labels.to_pandas().sort_values("vec_id")
        assert (got["cluster"].to_numpy() == a_s).all()


def test_kmeans_stats_matches_serial():
    rng = np.random.default_rng(22)
    n, d, k = 300, 8, 4
    x_raw = rng.normal(size=(n, d)).astype(np.float32)
    ids = rng.permutation(n * 3)[:n]
    order = np.argsort(ids)
    x = quantize(x_raw.astype(np.float64), 10)[order]

    _, a = _iterate_serial(x, k, 3)
    got = kmeans_cluster_stats(_mkds(x_raw[order], ids[order], 5), k=k,
                               iters=3, quant_bits=10, stat_dims=2
                               ).to_pandas().sort_values("cluster")
    n_want = np.bincount(a, minlength=k)
    assert (got["n"].to_numpy() == n_want).all()
    idw = np.zeros(k, np.int64)
    np.add.at(idw, a, np.sort(ids))
    assert (got["id_sum"].to_numpy() == idw).all()
    xxw = np.zeros(k)
    np.add.at(xxw, a, (x ** 2).sum(axis=-1))
    assert (got["xx_sum"].to_numpy() == xxw).all()  # exact dyadic sums


def test_kmeans_empty_cluster_keeps_centroid():
    # all points identical -> everything lands in cluster 0 (first-min
    # tie); clusters 1/2 must keep their init centroids, not go NaN
    x_raw = np.ones((30, 4), np.float32)
    cents, labels = kmeans_fit(_mkds(x_raw, np.arange(30), 3), k=3,
                               iters=2, quant_bits=10)
    assert np.isfinite(cents).all()
    assert (labels.to_pandas()["cluster"] == 0).all()


def test_assign_tie_break_lowest_cluster():
    x = np.array([[0.0, 0.0]])
    cents = np.array([[1.0, 0.0], [-1.0, 0.0]])  # equidistant
    assert assign(x, cents)[0] == 0
