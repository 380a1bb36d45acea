"""MultiEgo (reference MutilplyEgo parity shape), BackForwardCV per-fold
selection, and Gabriel-graph neighbor stats (count_voronoinn analog)."""

import numpy as np
import pytest

from featurebox_ray.selection.search import (
    BackForwardCV, MultiEgo, pareto_front_points)
from featurebox_ray.stages.voronoi import gabriel_edges, neighbor_type_stats

rng = np.random.default_rng(3)


def test_pareto_front_points_reference_rule():
    Y = np.array([[1.0, 1.0], [2.0, 0.5], [0.5, 2.0], [0.4, 0.4],
                  [2.0, 2.0]])
    front = set(pareto_front_points(Y).tolist())
    # (2,2) dominates everything except nothing dominates it; (1,1),(2,.5),
    # (.5,2) are all dominated by (2,2); reference rule keeps only points
    # not beaten in EVERY objective
    assert 4 in front
    assert 3 not in front
    # equal points are both on the front
    Y2 = np.array([[1.0, 1.0], [1.0, 1.0]])
    assert set(pareto_front_points(Y2).tolist()) == {0, 1}


def test_multiego_planted_two_objectives():
    """Two objectives maximized at opposite corners: the EI ranking must
    surface grid points near the training Pareto front, and Pi must be ~0
    for points strictly dominated by it."""
    n = 120
    X = rng.uniform(-1, 1, size=(n, 2))
    Y = np.column_stack([X[:, 0], X[:, 1]])  # y0 = x0, y1 = x1
    g = np.linspace(-1, 1, 11)
    grid = np.stack(np.meshgrid(g, g), -1).reshape(-1, 2)
    me = MultiEgo(n_models=8, seed=0)
    rank = me.fit_predict(X, Y, grid)
    assert rank.shape == (len(grid),)
    assert me.mean_.shape == (len(grid), 2)
    assert me.pi_.min() >= 0 and me.pi_.max() <= 1
    assert np.all(me.ei_ >= 0)
    # a deep-dominated grid point (-1,-1) has ~zero probability of
    # jointly beating the front
    corner = int(np.argmin(np.abs(grid + 1).sum(axis=1)))
    assert me.pi_[corner] < 0.2
    # Ei = L * Pi exactly
    assert np.allclose(me.ei_, me.l_ * me.pi_)


def test_backforward_cv_per_fold_selection():
    n = 300
    X = rng.normal(size=(n, 6))
    y = 3.0 * X[:, 1] - 2.0 * X[:, 4] + rng.normal(0, 0.05, n)
    b = BackForwardCV(cv=4, seed=0).fit(X, y)
    assert len(b.support_cv) == 4
    assert len(b.score_cv) == 4
    assert set(b.support_) >= {1, 4}
    assert b.score_ > 0.95
    assert b.score_ == max(b.score_cv)
    # refit model predicts well
    from featurebox_ray.selection.models import r2_score

    assert r2_score(y, b.predict(X)) > 0.95


# ---------------------------------------------------------------------------
# Gabriel graph
# ---------------------------------------------------------------------------


def test_gabriel_edges_known_configurations():
    # 3 collinear points: (0,0)-(2,0) circle contains (1,0) -> not an edge
    P = np.array([[0.0, 0.0], [1.0, 0.0], [2.0, 0.0]])
    ii, jj = gabriel_edges(P)
    edges = set(zip(ii.tolist(), jj.tolist()))
    assert edges == {(0, 1), (1, 2)}
    # unit square: the other two corners lie exactly ON each diagonal's
    # circle — the strict-interior rule therefore keeps the diagonals
    # (cocircular degenerate case); all 6 pairs are edges
    P = np.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0], [1.0, 1.0]])
    ii, jj = gabriel_edges(P)
    assert len(ii) == 6
    # a slightly inset point breaks the diagonal
    P2 = np.array([[0.0, 0.0], [1.0, 1.0], [0.5, 0.49]])
    ii, jj = gabriel_edges(P2)
    assert (0, 1) not in set(zip(ii.tolist(), jj.tolist()))
    # brute-force definition check on random points
    Q = rng.normal(size=(30, 2))
    ii, jj = gabriel_edges(Q)
    got = set(zip(ii.tolist(), jj.tolist()))
    want = set()
    for i in range(30):
        for j in range(i + 1, 30):
            mid = (Q[i] + Q[j]) / 2
            r2 = np.sum((Q[i] - Q[j]) ** 2) / 4
            ok = True
            for k in range(30):
                if k in (i, j):
                    continue
                if np.sum((Q[k] - mid) ** 2) < r2:
                    ok = False
                    break
            if ok:
                want.add((i, j))
    assert got == want


def test_neighbor_type_stats_normalization():
    P = np.array([[0.0, 0.0], [1.0, 0.0], [2.0, 0.0]])
    types = np.array(["a", "b", "a"], dtype=object)
    stats = neighbor_type_stats(P, types)
    # edges (0,1) and (1,2), both type pair (a,b), dist 1 -> w = 0.5 each
    assert set(stats) == {("a", "b")}
    assert stats[("a", "b")] == pytest.approx((0.5 + 0.5) / 3)


def test_voronoi_parallelism_invariance_and_empty():
    """Same output at different partition counts (hash layout must not
    leak into results); empty input yields an empty typed table."""
    import pandas as pd
    import ray

    from featurebox_ray.stages.voronoi import add_voronoi_features

    ev = ray.data.read_parquet("/root/testdata/sf0.001/events.parquet",
                               columns=["event_id", "user_id", "ts",
                                        "event_type", "value"])
    key = ["user_id", "type_a", "type_b"]

    def norm(ds):
        return (ds.to_pandas().sort_values(key).reset_index(drop=True))

    a = norm(add_voronoi_features(ev, num_partitions=4))
    b = norm(add_voronoi_features(ev, num_partitions=16))
    pd.testing.assert_frame_equal(a, b)

    empty = add_voronoi_features(ev.filter(expr="user_id < 0"),
                                 num_partitions=4)
    assert empty.count() == 0
    # Ray's to_pandas drops the schema for fully-empty datasets; the
    # dataset-level schema keeps the typed columns
    sch = empty.schema()
    assert sch is None or list(sch.names) == ["user_id", "type_a",
                                              "type_b", "w"]


def test_radius_neighbors_kernel_hand_case():
    """Reference Neighborizer semantics on a hand-checked point set:
    multiplicity counts per (type, rounded distance)."""
    from featurebox_ray.stages.neighbor import radius_neighbors

    # collinear points at ranks 0..3, equal values: distances = rank gaps
    P = np.array([[0.0, 0.0], [1.0, 0.0], [2.0, 0.0], [3.0, 0.0]])
    types = np.array(["a", "b", "b", "a"], dtype=object)
    si, st, sd, sm = radius_neighbors(P, types, r_max=2.0, round_nd=4)
    rows = {(int(i), t, float(d)): int(m)
            for i, t, d, m in zip(si, st, sd, sm)}
    # site 0: neighbors 1 (b, d=1), 2 (b, d=2) -> (b,1):1, (b,2):1
    assert rows[(0, "b", 1.0)] == 1 and rows[(0, "b", 2.0)] == 1
    # site 1: neighbors 0 (a,1), 2 (b,1), 3 (a,2)
    assert rows[(1, "a", 1.0)] == 1 and rows[(1, "b", 1.0)] == 1
    assert rows[(1, "a", 2.0)] == 1
    # multiplicity: two same-type neighbors at the same rounded distance
    P2 = np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 0.0]])
    t2 = np.array(["x", "y", "y"], dtype=object)
    si, st, sd, sm = radius_neighbors(P2, t2, r_max=1.5, round_nd=4)
    r2 = {(int(i), t, float(d)): int(m)
          for i, t, d, m in zip(si, st, sd, sm)}
    assert r2[(0, "y", 1.0)] == 2


def test_radius_neighbors_parallelism_invariance():
    import pandas as pd
    import ray

    from featurebox_ray.stages.neighbor import add_radius_neighbors

    ev = ray.data.read_parquet("/root/testdata/sf0.001/events.parquet",
                               columns=["event_id", "user_id", "ts",
                                        "event_type", "value"])
    key = ["user_id", "event_id", "n_type", "dist"]

    def norm(ds):
        return ds.to_pandas().sort_values(key).reset_index(drop=True)

    a = norm(add_radius_neighbors(ev, num_partitions=4))
    b = norm(add_radius_neighbors(ev, num_partitions=16))
    pd.testing.assert_frame_equal(a, b)
    assert len(a) > 0
