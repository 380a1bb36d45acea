"""Chi-square term keyness (stages/tfidf.py:chi2_keyness) vs a DuckDB
replay; hand-checked planted key term; partition invariance."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from featurebox_ray.stages.tfidf import chi2_keyness

ORACLE = r"""
    WITH toks AS (
      SELECT g, unnest(regexp_extract_all(coalesce(txt, ''),
                                          '\S+')) AS term
      FROM docs WHERE g IS NOT NULL),
    st AS (SELECT g, term, CAST(count(*) AS BIGINT) AS a
           FROM toks GROUP BY 1, 2),
    tt AS (SELECT term, CAST(sum(a) AS BIGINT) AS ab
           FROM st GROUP BY term),
    sg AS (SELECT g, CAST(sum(a) AS BIGINT) AS asum
           FROM st GROUP BY g),
    nn AS (SELECT CAST(sum(a) AS BIGINT) AS n FROM st),
    sc AS (SELECT st.g, st.term, st.a,
                  (CAST(st.a * (nn.n - sg.asum)
                        - (tt.ab - st.a) * sg.asum AS DOUBLE)
                   / CAST(sg.asum * (nn.n - sg.asum) AS DOUBLE)
                   * CAST(st.a * (nn.n - sg.asum)
                          - (tt.ab - st.a) * sg.asum AS DOUBLE)
                   / CAST(tt.ab * (nn.n - tt.ab) AS DOUBLE))
                  * CAST(nn.n AS DOUBLE) AS chi2
           FROM st JOIN tt USING (term) JOIN sg USING (g)
           CROSS JOIN nn
           WHERE st.a >= {mc} AND st.a * nn.n > tt.ab * sg.asum),
    r AS (SELECT g, term, a AS cnt, chi2,
                 row_number() OVER (PARTITION BY g
                                    ORDER BY chi2 DESC, term ASC)
                   AS rk
          FROM sc)
    SELECT g, term, cnt, chi2 FROM r WHERE rk <= {k}
    ORDER BY g, rk
"""


def test_chi2_keyness_duckdb_fuzz_partition_invariant():
    rng = np.random.default_rng(907)
    words = [f"w{i}" for i in range(30)]
    texts, gs = [], []
    for _ in range(400):
        g = None if rng.random() < 0.03 else f"s{rng.integers(0, 4)}"
        gs.append(g)
        body = list(rng.choice(words, rng.integers(0, 12)))
        # plant a skewed key term per source
        if g == "s0" and rng.random() < 0.6:
            body += ["KEY0"] * int(rng.integers(1, 4))
        if g == "s1" and rng.random() < 0.3:
            body += ["KEY1"]
        texts.append(None if rng.random() < 0.05
                     else " ".join(body))
    pdf = pd.DataFrame({"g": gs, "txt": texts})
    con = duckdb.connect()
    con.register("docs", pdf)
    exp = con.sql(ORACLE.format(mc=3, k=8)).df().reset_index(drop=True)
    t = pa.table({"g": pa.array(gs, pa.string()),
                  "txt": pa.array(texts, pa.string())})
    prev = None
    for parts in (1, 7):
        ds = ray.data.from_arrow(t)
        if parts > 1:
            ds = ds.repartition(parts)
        got = chi2_keyness(ds, group_col="g", text_col="txt", k=8,
                           min_count=3, num_partitions=5).to_pandas()
        got = got.sort_values(
            ["g", "chi2", "term"],
            ascending=[True, False, True]).reset_index(drop=True)
        pd.testing.assert_frame_equal(
            got.astype(exp.dtypes.to_dict()), exp, check_exact=True)
        if prev is not None:
            assert got.equals(prev)
        prev = got


def test_chi2_keyness_planted_top_term():
    # "hot" dominates source a and is absent elsewhere -> its top term
    texts_a = ["hot hot hot filler"] * 6
    texts_b = ["cold filler words here"] * 6
    t = pa.table({
        "g": ["a"] * 6 + ["b"] * 6,
        "txt": texts_a + texts_b})
    got = chi2_keyness(ray.data.from_arrow(t), group_col="g",
                       text_col="txt", k=2, min_count=2).to_pandas()
    a_rows = got[got["g"] == "a"].sort_values(
        "chi2", ascending=False)
    assert a_rows.iloc[0]["term"] == "hot"
    assert a_rows.iloc[0]["cnt"] == 18
    # "filler" appears in both at equal per-source rate on the a side
    # (6 of 24 vs 6 of 24): not over-represented, never emitted
    assert "filler" not in set(got["term"])
