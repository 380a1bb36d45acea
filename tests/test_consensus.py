"""SUM-style consensus ranking + S_Dbw validity (ref selection/sum.py,
sdw.py analogs)."""

import itertools

import numpy as np

from featurebox_ray.selection.consensus import (
    consensus_ranking, pareto_front, s_dbw, score_matrix)


def test_pareto_front():
    #             s0   s1   s2   s3
    S = np.array([[0.9, 0.8, 0.5, 0.6],
                  [0.7, 0.9, 0.4, 0.7]])
    front = set(pareto_front(S))
    assert front == {0, 1}  # s2 dominated by all; s3 dominated by s0


def test_consensus_finds_planted():
    rng = np.random.default_rng(13)
    X = rng.normal(size=(200, 5))
    y = X[:, 0] - 0.5 * X[:, 2] + rng.normal(0, 0.1, 200)
    subsets = list(itertools.combinations(range(5), 2))
    S = score_matrix(X, y, subsets)
    ranked = consensus_ranking(S, subsets)
    assert ranked[0][0] == (0, 2)
    assert ranked[0][1] > 0.9


def test_s_dbw_prefers_true_clustering():
    rng = np.random.default_rng(3)
    a = rng.normal(0, 0.3, (60, 2))
    b = rng.normal(5, 0.3, (60, 2))
    X = np.vstack([a, b])
    good = np.array([0] * 60 + [1] * 60)
    bad = np.tile([0, 1], 60)
    assert s_dbw(X, good) < s_dbw(X, bad)
