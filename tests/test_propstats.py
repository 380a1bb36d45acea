"""PropertyStats kernel parity vs a literal per-row oracle implementing the
reference semantics (featurebox/featurizers/extrastats.py:20-349), including
the edge cases SURVEY.md §7.6 calls out."""

import numpy as np
import pytest

from featurebox_ray.functions import propstats as ps


def _ref_std(row, w=None):
    if len(row) == 1:
        return 0.0
    if w is None:
        return np.std(row)
    W = np.sum(w)
    beta = W / (W ** 2 - np.sum(np.power(w, 2)))
    m = np.average(row, weights=w)
    return np.sqrt(beta * np.dot((row - m) ** 2, w))


def _ref_skew(row, w=None):
    if len(row) == 1:
        return 0.0
    m = np.average(row, weights=w)
    d = row - m
    if w is None:
        u2, u3 = np.mean(d ** 2), np.mean(d ** 3)
    else:
        W = np.sum(w)
        u2, u3 = np.dot(w, d ** 2) / W, np.dot(w, d ** 3) / W
    if np.isclose(u3, 0):
        return 0.0
    return u3 / u2 ** 1.5


def _ref_kurt(row, w=None):
    if len(row) == 1:
        return 0.0
    m = np.average(row, weights=w)
    d2 = (row - m) ** 2
    if w is None:
        u2, u4 = np.mean(d2), np.mean(d2 ** 2)
        return 0.0 if np.isclose(u4, 0) else u4 / u2 ** 2
    W = np.sum(w)
    u2, u4 = np.dot(w, d2), np.dot(w, d2 ** 2)
    return 0.0 if np.isclose(u4, 0) else u4 / u2 ** 2 * W


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(3)
    X = rng.normal(2.0, 1.5, (200, 6))
    X = np.abs(X) + 0.1  # positive, for geometric/harmonic means
    W = rng.uniform(0.5, 3.0, (200, 6))
    return X, W


@pytest.mark.parametrize("weighted", [False, True])
def test_moments(data, weighted):
    X, W = data
    w = W if weighted else None
    for i in range(0, 200, 17):
        row = X[i]
        wr = W[i] if weighted else None
        assert np.isclose(ps.mean(X, w)[i], np.average(row, weights=wr))
        assert np.isclose(ps.std_dev(X, w)[i], _ref_std(row, wr))
        assert np.isclose(ps.skewness(X, w)[i], _ref_skew(row, wr))
        assert np.isclose(ps.kurtosis(X, w)[i], _ref_kurt(row, wr))
        assert np.isclose(
            ps.avg_dev(X, w)[i],
            np.average(np.abs(row - np.average(row, weights=wr)), weights=wr),
        )


def test_nan_propagation_min_max_range():
    X = np.array([[1.0, 2.0, 3.0], [1.0, np.nan, 3.0]])
    assert ps.minimum(X)[0] == 1.0 and np.isnan(ps.minimum(X)[1])
    assert ps.maximum(X)[0] == 3.0 and np.isnan(ps.maximum(X)[1])
    assert ps.prange(X)[0] == 2.0 and np.isnan(ps.prange(X)[1])


def test_single_element_zero():
    X = np.array([[5.0], [7.0]])
    assert np.all(ps.std_dev(X) == 0)
    assert np.all(ps.skewness(X) == 0)
    assert np.all(ps.kurtosis(X) == 0)


def test_holder_means(data):
    X, W = data
    # p=0 geometric, p=-1 harmonic, p=2 quadratic — vs explicit formulas
    gm = np.exp(np.mean(np.log(X), axis=1))
    assert np.allclose(ps.holder_mean(X, None, 0), gm)
    hm = X.shape[1] / np.sum(1.0 / X, axis=1)
    assert np.allclose(ps.holder_mean(X, None, -1), hm)
    qm = np.sqrt(np.mean(X ** 2, axis=1))
    assert np.allclose(ps.holder_mean(X, None, 2), qm)
    # weighted geometric: prod(x^(w/W))
    Wsum = W.sum(axis=1, keepdims=True)
    wg = np.prod(np.power(X, W / Wsum), axis=1)
    assert np.allclose(ps.holder_mean(X, W, 0), wg)
    # weighted harmonic
    wh = W.sum(axis=1) / np.sum(W / X, axis=1)
    assert np.allclose(ps.holder_mean(X, W, -1), wh)


def test_mode_tiebreak_and_weighted():
    X = np.array([[3.0, 1.0, 3.0, 1.0, 2.0], [5.0, 5.0, 5.0, 1.0, 1.0]])
    # ties at count 2 for {1,3} -> min=1
    assert ps.mode(X).tolist() == [1.0, 5.0]
    Xw = np.array([[4.0, 9.0, 2.0]])
    w = np.array([[2.0, 1.0, 2.0]])
    # max weight 2 shared by values {4, 2} -> min = 2
    assert ps.mode(Xw, w)[0] == 2.0


def test_geom_std_dev(data):
    X, W = data
    i = 5
    row, w = X[i], W[i]
    gm = np.prod(np.power(row, w / w.sum()))
    beta = w.sum() / (w.sum() ** 2 - np.sum(w ** 2))
    dev = np.log(row / gm)
    ref = np.sqrt(np.exp(beta * np.dot(w, dev ** 2)))
    assert np.isclose(ps.geom_std_dev(X, W)[i], ref)


def test_calc_stat_dispatch(data):
    X, W = data
    assert np.allclose(ps.calc_stat(X, "holder_mean::2"), ps.holder_mean(X, None, 2))
    assert np.allclose(ps.calc_stat(X, "quantile::0.25"), np.quantile(X, 0.25, axis=1))
    assert np.allclose(ps.calc_stat(X, "mean", W), ps.mean(X, W))


def test_sorted_flatten_eigenvalues_reference_parity(data):
    """Parity rows for the last three PropertyStats kernels
    (extrastats.py:299-349): sorted = row-wise np.sort, flatten =
    np.array(...).flatten(), eigenvalues = eigvals/eigvalsh with
    optional sort."""
    X, _W = data
    assert np.array_equal(ps.sorted_(X), np.sort(X, axis=1))
    # 1-D input promotes to one row, same as every other kernel
    assert np.array_equal(ps.sorted_(X[0]), np.sort(X[0])[None, :])
    assert np.array_equal(ps.flatten(X), X.flatten())
    assert ps.flatten([[1, 2], [3, 4]]).tolist() == [1.0, 2.0, 3.0, 4.0]

    rng = np.random.default_rng(5)
    M = rng.normal(size=(6, 6))
    S = M + M.T
    # general matrix -> np.linalg.eigvals (possibly complex)
    assert np.allclose(sorted(ps.eigenvalues(M).real),
                       sorted(np.linalg.eigvals(M).real))
    # symmetric path -> eigvalsh; sort flag orders ascending
    es = ps.eigenvalues(S, symm=True, sort=True)
    assert np.allclose(es, np.sort(np.linalg.eigvalsh(S)))
    # name-dispatch parity with the reference's getattr calc_stat
    assert np.array_equal(ps.calc_stat(X, "sorted"), np.sort(X, axis=1))
    assert np.array_equal(ps.calc_stat(X, "flatten"), X.flatten())
    assert np.allclose(sorted(ps.calc_stat(S, "eigenvalues").real),
                       sorted(np.linalg.eigvals(S).real))
