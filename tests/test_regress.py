"""Per-group OLS line fit (stages/regress.py) vs numpy / serial replay."""

import numpy as np
import pyarrow as pa
import pytest
import ray

from featurebox_ray.stages.regress import group_linfit


def _serial(groups, xs, ys):
    out = {}
    for g in sorted(set(groups)):
        x = [int(a) for a, gg in zip(xs, groups) if gg == g]
        y = [int(b) for b, gg in zip(ys, groups) if gg == g]
        n, sx, sy = len(x), sum(x), sum(y)
        sxy = sum(a * b for a, b in zip(x, y))
        sxx = sum(a * a for a in x)
        den = n * sxx - sx * sx
        if den == 0:
            out[g] = (n, None, None)
        else:
            slope = float(n * sxy - sx * sy) / float(den)
            out[g] = (n, slope, (float(sy) - slope * float(sx)) / float(n))
    return out


def test_group_linfit_matches_replay_and_numpy():
    rng = np.random.default_rng(5)
    groups = rng.choice(["a", "b", "c"], 400).tolist()
    xs = rng.integers(0, 1000, 400).astype(np.int64)
    ys = (3 * xs + rng.integers(-50, 50, 400)).astype(np.int64)
    t = pa.table({"g": pa.array(groups), "x": pa.array(xs),
                  "y": pa.array(ys)})
    expect = _serial(groups, xs, ys)

    for parts in (1, 7):
        ds = ray.data.from_arrow(t)
        if parts > 1:
            ds = ds.repartition(parts)
        got = group_linfit(ds, key_col="g", x_col="x",
                           y_col="y").to_pandas().set_index("g")
        for g, (n, slope, intercept) in expect.items():
            assert got.loc[g, "n"] == n
            assert got.loc[g, "slope"] == slope          # bit-exact
            assert got.loc[g, "intercept"] == intercept  # bit-exact
            # sanity vs numpy polyfit (approximate)
            m = [i for i, gg in enumerate(groups) if gg == g]
            coef = np.polyfit(xs[m].astype(float), ys[m].astype(float), 1)
            assert abs(coef[0] - slope) < 1e-6
            assert abs(coef[1] - intercept) < 1e-3


def test_group_linfit_degenerate_and_nulls():
    t = pa.table({
        "g": pa.array(["one", "one", "flat", "flat", None, "one"]),
        "x": pa.array([5, 5, 1, 2, 3, None], pa.int64()),
        "y": pa.array([10, 20, 7, None, 9, 11], pa.int64()),
    })
    got = group_linfit(ray.data.from_arrow(t), key_col="g", x_col="x",
                       y_col="y").to_pandas().set_index("g")
    # "one": both valid rows share x=5 -> den == 0 -> NULL fit
    assert got.loc["one", "n"] == 2
    assert np.isnan(got.loc["one", "slope"])
    # "flat": one valid row (null y dropped) -> den == 0
    assert got.loc["flat", "n"] == 1
    assert np.isnan(got.loc["flat", "intercept"])
    assert set(got.index) == {"one", "flat"}  # null key dropped


def test_group_linfit_type_guard():
    t = pa.table({"g": ["a"], "x": pa.array([1.5]), "y": pa.array([2])})
    with pytest.raises(Exception, match="int64"):
        group_linfit(ray.data.from_arrow(t), key_col="g", x_col="x",
                     y_col="y").to_pandas()


def test_group_corr_matches_replay_and_numpy():
    import math

    from featurebox_ray.stages.regress import group_corr
    rng = np.random.default_rng(9)
    groups = rng.choice(["a", "b"], 300).tolist()
    xs = rng.integers(0, 500, 300).astype(np.int64)
    ys = (2 * xs + rng.integers(0, 200, 300)).astype(np.int64)
    t = pa.table({"g": pa.array(groups), "x": pa.array(xs),
                  "y": pa.array(ys)})
    got = (group_corr(ray.data.from_arrow(t).repartition(5), key_col="g",
                      x_col="x", y_col="y")
           .to_pandas().set_index("g"))
    for g in ("a", "b"):
        m = [i for i, gg in enumerate(groups) if gg == g]
        n = len(m)
        sx, sy = int(xs[m].sum()), int(ys[m].sum())
        sxy = int((xs[m] * ys[m]).sum())
        sxx, syy = int((xs[m] ** 2).sum()), int((ys[m] ** 2).sum())
        want = float(n * sxy - sx * sy) / math.sqrt(
            float(n * sxx - sx * sx) * float(n * syy - sy * sy))
        assert got.loc[g, "r"] == want  # bit-exact
        ref = np.corrcoef(xs[m].astype(float), ys[m].astype(float))[0, 1]
        assert abs(got.loc[g, "r"] - ref) < 1e-10


def test_group_corr_constant_side_null():
    from featurebox_ray.stages.regress import group_corr
    t = pa.table({"g": pa.array(["c"] * 4),
                  "x": pa.array([7, 7, 7, 7], pa.int64()),
                  "y": pa.array([1, 2, 3, 4], pa.int64())})
    got = group_corr(ray.data.from_arrow(t), key_col="g", x_col="x",
                     y_col="y").to_pandas()
    assert np.isnan(got["r"].iloc[0])


def test_group_moments_serial_replay_bitexact():
    import math

    from featurebox_ray.stages.regress import group_moments

    rng = np.random.default_rng(13)
    n = 500
    t = pa.table({
        "g": pa.array([None if i % 41 == 0 else int(v) for i, v in
                       enumerate(rng.integers(0, 6, n))], pa.int64()),
        "y": pa.array([None if i % 37 == 0 else int(v) for i, v in
                       enumerate(rng.integers(-50, 400, n))], pa.int64()),
    })
    for parts in (1, 4, 9):
        got = (group_moments(ray.data.from_arrow(t).repartition(parts),
                             key_col="g", y_col="y")
               .to_pandas().sort_values("g").reset_index(drop=True))
        # serial replay with the same fixed op order
        import collections
        acc = collections.defaultdict(lambda: [0, 0, 0, 0, 0])
        gs = t["g"].to_pylist()
        ys = t["y"].to_pylist()
        for g, y in zip(gs, ys):
            if g is None or y is None:
                continue
            a = acc[g]
            a[0] += 1
            a[1] += y
            a[2] += y * y
            a[3] += y ** 3
            a[4] += y ** 4
        assert len(got) == len(acc)
        for _, r in got.iterrows():
            cnt, s1, s2, s3, s4 = acc[r["g"]]
            assert r["n"] == cnt
            assert r["mean"] == float(s1) / float(cnt)
            m2 = cnt * s2 - s1 * s1
            assert r["var_pop"] == float(m2) / float(cnt * cnt)
            if m2 == 0:
                assert np.isnan(r["skew"])
            else:
                a3 = cnt * cnt * s3 - 3 * cnt * s1 * s2 + 2 * s1 ** 3
                a4 = (cnt ** 3 * s4 - 4 * cnt * cnt * s1 * s3
                      + 6 * cnt * s1 * s1 * s2 - 3 * s1 ** 4)
                assert r["skew"] == float(a3) / (float(m2)
                                                 * math.sqrt(float(m2)))
                assert r["kurt_excess"] == (float(a4)
                                            / (float(m2) * float(m2))
                                            - 3.0)


def test_group_moments_sanity_vs_scipy_free_formulas():
    from featurebox_ray.stages.regress import group_moments

    rng = np.random.default_rng(7)
    y = rng.integers(0, 1000, 2000)
    t = pa.table({"g": pa.array(np.zeros(len(y), np.int64)),
                  "y": pa.array(y.astype(np.int64))})
    got = group_moments(ray.data.from_arrow(t).repartition(5),
                        key_col="g", y_col="y").to_pandas().iloc[0]
    yf = y.astype(np.float64)
    mu = yf.mean()
    m2 = ((yf - mu) ** 2).mean()
    m3 = ((yf - mu) ** 3).mean()
    m4 = ((yf - mu) ** 4).mean()
    assert abs(got["mean"] - mu) < 1e-9
    assert abs(got["var_pop"] - m2) < 1e-6
    assert abs(got["skew"] - m3 / m2 ** 1.5) < 1e-9
    assert abs(got["kurt_excess"] - (m4 / m2 ** 2 - 3)) < 1e-9


def test_group_moments_guards():
    import pytest

    from featurebox_ray.stages.regress import group_moments

    # zero-variance group -> NULL skew/kurt
    t = pa.table({"g": pa.array([1, 1, 2], pa.int64()),
                  "y": pa.array([5, 5, 7], pa.int64())})
    got = (group_moments(ray.data.from_arrow(t), key_col="g", y_col="y")
           .to_pandas().sort_values("g").reset_index(drop=True))
    assert np.isnan(got["skew"]).all()
    assert got["var_pop"].tolist() == [0.0, 0.0]
    # overflow guard
    big = pa.table({"g": pa.array([1, 1], pa.int64()),
                    "y": pa.array([60_000, 60_001], pa.int64())})
    with pytest.raises(Exception, match="quantize"):
        group_moments(ray.data.from_arrow(big), key_col="g",
                      y_col="y").to_pandas()
    # dtype guard
    f = pa.table({"g": pa.array([1], pa.int64()),
                  "y": pa.array([1.5], pa.float64())})
    with pytest.raises(Exception, match="int64"):
        group_moments(ray.data.from_arrow(f), key_col="g",
                      y_col="y").to_pandas()


def test_group_auc_duckdb_and_pairwise_replay():
    import duckdb

    from featurebox_ray.stages.regress import group_auc

    rng = np.random.default_rng(47)
    n = 400
    t = pa.table({
        "g": pa.array([None if i % 37 == 0 else int(v) for i, v in
                       enumerate(rng.integers(0, 5, n))], pa.int64()),
        "y": pa.array([None if i % 41 == 0 else int(v) for i, v in
                       enumerate(rng.integers(0, 2, n))], pa.int64()),
        # small score range -> heavy ties
        "s": pa.array([None if i % 43 == 0 else int(v) for i, v in
                       enumerate(rng.integers(0, 12, n))], pa.int64()),
    })
    con = duckdb.connect()
    con.register("t", t)
    want = con.execute("""
        WITH e AS (SELECT g, y, s FROM t
                   WHERE g IS NOT NULL AND y IS NOT NULL
                     AND s IS NOT NULL),
        r AS (SELECT g, y,
                     2 * rank() OVER (PARTITION BY g ORDER BY s)
                       + count(*) OVER (PARTITION BY g, s) - 1 AS two_r
              FROM e),
        a AS (SELECT g, CAST(sum(y) AS HUGEINT) AS npos,
                     CAST(count(*) - sum(y) AS HUGEINT) AS nneg,
                     CAST(sum(CASE WHEN y = 1 THEN two_r ELSE 0 END)
                          AS HUGEINT) AS s2
              FROM r GROUP BY g)
        SELECT g, CAST(npos AS BIGINT) AS n_pos,
               CAST(nneg AS BIGINT) AS n_neg,
               CASE WHEN npos = 0 OR nneg = 0 THEN NULL ELSE
                 CAST(s2 - npos * (npos + 1) AS DOUBLE)
                   / CAST(2 * npos * nneg AS DOUBLE)
               END AS auc
        FROM a ORDER BY g
    """).fetch_arrow_table()
    for parts, np_ in ((1, 2), (4, 3), (9, 7)):
        got = (group_auc(ray.data.from_arrow(t).repartition(parts),
                         key_col="g", label_col="y", score_col="s",
                         num_partitions=np_)
               .to_pandas().sort_values("g").reset_index(drop=True))
        assert got["g"].tolist() == want["g"].to_pylist()
        for c in ("n_pos", "n_neg", "auc"):
            gv = [None if isinstance(v, float) and v != v else v
                  for v in got[c].tolist()]
            assert gv == want[c].to_pylist(), (c, parts, np_)
    # independent pairwise replay: AUC = P(s_pos > s_neg) + 0.5 P(=)
    gs, ys, ss = (t["g"].to_pylist(), t["y"].to_pylist(),
                  t["s"].to_pylist())
    rows = [(g, y, s) for g, y, s in zip(gs, ys, ss)
            if g is not None and y is not None and s is not None]
    for _, r in (group_auc(ray.data.from_arrow(t), key_col="g",
                           label_col="y", score_col="s")
                 .to_pandas().iterrows()):
        pos = [s for g, y, s in rows if g == r["g"] and y == 1]
        neg = [s for g, y, s in rows if g == r["g"] and y == 0]
        if not pos or not neg:
            assert np.isnan(r["auc"])
            continue
        wins = sum((p > q) + 0.5 * (p == q) for p in pos for q in neg)
        assert abs(r["auc"] - wins / (len(pos) * len(neg))) < 1e-12


def test_group_auc_guards():
    import pytest

    from featurebox_ray.stages.regress import group_auc

    perfect = pa.table({
        "g": pa.array([0] * 6, pa.int64()),
        "y": pa.array([0, 0, 0, 1, 1, 1], pa.int64()),
        "s": pa.array([1, 2, 3, 10, 11, 12], pa.int64()),
    })
    got = group_auc(ray.data.from_arrow(perfect), key_col="g",
                    label_col="y", score_col="s").to_pandas()
    assert got["auc"].tolist() == [1.0]
    f = pa.table({"g": pa.array([0], pa.int64()),
                  "y": pa.array([1], pa.int64()),
                  "s": pa.array([0.5], pa.float64())})
    with pytest.raises(Exception, match="int64"):
        group_auc(ray.data.from_arrow(f), key_col="g", label_col="y",
                  score_col="s").to_pandas()


def test_group_weighted_stats_duckdb_and_replay():
    import duckdb

    from featurebox_ray.stages.regress import group_weighted_stats

    rng = np.random.default_rng(53)
    n = 400
    t = pa.table({
        "g": pa.array([None if i % 31 == 0 else int(v) for i, v in
                       enumerate(rng.integers(0, 5, n))], pa.int64()),
        "y": pa.array([None if i % 37 == 0 else int(v) for i, v in
                       enumerate(rng.integers(-200, 300, n))],
                      pa.int64()),
        # includes zero weights; one group gets only zero weights below
        "w": pa.array([0 if v == 9 else int(v) for v in
                       rng.integers(0, 10, n)], pa.int64()),
    })
    con = duckdb.connect()
    con.register("t", t)
    want = con.execute("""
        WITH e AS (SELECT g, y, w FROM t
                   WHERE g IS NOT NULL AND y IS NOT NULL
                     AND w IS NOT NULL),
        s AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
                     CAST(sum(w) AS HUGEINT) AS sw,
                     CAST(sum(w * y) AS HUGEINT) AS swy,
                     CAST(sum(w * y * y) AS HUGEINT) AS swyy
              FROM e GROUP BY g)
        SELECT g, n, CAST(sw AS BIGINT) AS sum_w,
               CASE WHEN sw = 0 THEN NULL ELSE
                 CAST(swy AS DOUBLE) / CAST(sw AS DOUBLE) END AS wmean,
               CASE WHEN sw = 0 THEN NULL ELSE
                 CAST(sw * swyy - swy * swy AS DOUBLE)
                   / CAST(sw * sw AS DOUBLE) END AS wvar
        FROM s ORDER BY g
    """).fetch_arrow_table()
    for parts in (1, 4, 9):
        got = (group_weighted_stats(
            ray.data.from_arrow(t).repartition(parts),
            key_col="g", y_col="y", w_col="w")
            .to_pandas().sort_values("g").reset_index(drop=True))
        assert got["g"].tolist() == want["g"].to_pylist()
        for c in ("n", "sum_w", "wmean", "wvar"):
            gv = [None if isinstance(v, float) and v != v else v
                  for v in got[c].tolist()]
            assert gv == want[c].to_pylist(), (c, parts)
    # frequency-weight sanity: integer weights == row replication
    rep_y = [y for y, w, g in zip(t["y"].to_pylist(),
                                  t["w"].to_pylist(),
                                  t["g"].to_pylist())
             if g == 2 and y is not None for _ in range(w)]
    row = (group_weighted_stats(ray.data.from_arrow(t), key_col="g",
                                y_col="y", w_col="w").to_pandas())
    r2 = row[row["g"] == 2].iloc[0]
    assert abs(r2["wmean"] - np.mean(rep_y)) < 1e-9
    assert abs(r2["wvar"] - np.var(rep_y)) < 1e-6


def test_group_spearman_duckdb_and_scipy_free_replay():
    import duckdb

    from featurebox_ray.stages.regress import group_spearman

    rng = np.random.default_rng(97)
    n = 400
    t = pa.table({
        "g": pa.array([None if i % 41 == 0 else int(v) for i, v in
                       enumerate(rng.integers(0, 5, n))], pa.int64()),
        # small ranges -> heavy ties in both columns
        "x": pa.array([None if i % 37 == 0 else int(v) for i, v in
                       enumerate(rng.integers(0, 15, n))], pa.int64()),
        "y": pa.array([None if i % 43 == 0 else int(v) for i, v in
                       enumerate(rng.integers(0, 10, n))], pa.int64()),
    })
    con = duckdb.connect()
    con.register("t", t)
    want = con.execute("""
        WITH e AS (SELECT g, x, y FROM t
                   WHERE g IS NOT NULL AND x IS NOT NULL
                     AND y IS NOT NULL),
        r AS (SELECT g,
                     2 * rank() OVER (PARTITION BY g ORDER BY x)
                       + count(*) OVER (PARTITION BY g, x) - 1 AS a,
                     2 * rank() OVER (PARTITION BY g ORDER BY y)
                       + count(*) OVER (PARTITION BY g, y) - 1 AS b
              FROM e),
        s AS (SELECT g, CAST(count(*) AS HUGEINT) AS n,
                     CAST(sum(a) AS HUGEINT) AS sa,
                     CAST(sum(b) AS HUGEINT) AS sb,
                     CAST(sum(a * b) AS HUGEINT) AS sab,
                     CAST(sum(a * a) AS HUGEINT) AS saa,
                     CAST(sum(b * b) AS HUGEINT) AS sbb
              FROM r GROUP BY g)
        SELECT g, CAST(n AS BIGINT) AS n,
               CASE WHEN n * saa - sa * sa = 0
                      OR n * sbb - sb * sb = 0 THEN NULL ELSE
                 CAST(n * sab - sa * sb AS DOUBLE)
                 / (sqrt(CAST(n * saa - sa * sa AS DOUBLE))
                    * sqrt(CAST(n * sbb - sb * sb AS DOUBLE)))
               END AS rho
        FROM s ORDER BY g
    """).fetch_arrow_table()
    for parts, np_ in ((1, 2), (4, 3), (9, 7)):
        got = (group_spearman(ray.data.from_arrow(t).repartition(parts),
                              key_col="g", x_col="x", y_col="y",
                              num_partitions=np_)
               .to_pandas().sort_values("g").reset_index(drop=True))
        assert got["g"].tolist() == want["g"].to_pylist()
        assert got["n"].tolist() == want["n"].to_pylist()
        gv = [None if isinstance(v, float) and v != v else v
              for v in got["rho"].tolist()]
        assert gv == want["rho"].to_pylist(), (parts, np_)
    # monotone-transform invariance: rho(x, x^3-ish order) == 1
    mono = pa.table({
        "g": pa.array([0] * 50, pa.int64()),
        "x": pa.array(np.arange(50, dtype=np.int64)),
        "y": pa.array((np.arange(50, dtype=np.int64) ** 3)),
    })
    got = group_spearman(ray.data.from_arrow(mono), key_col="g",
                         x_col="x", y_col="y").to_pandas()
    assert abs(got["rho"].iloc[0] - 1.0) < 1e-12
