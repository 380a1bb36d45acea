"""Shuffle-free exact heavy hitters (stages/tfidf.py:topk_two_pass)
vs top_terms and DuckDB; soundness-gate behavior on tiny summaries."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray

from featurebox_ray.stages.tfidf import top_terms, topk_two_pass


def _corpus(n_docs=400, seed=282):
    # Zipfian-ish: token i appears with weight 1/(i+1)
    rng = np.random.default_rng(seed)
    vocab = np.array([f"tok{i:03d}" for i in range(300)])
    p = 1.0 / np.arange(1, 301)
    p /= p.sum()
    docs = [" ".join(rng.choice(vocab, size=rng.integers(5, 40),
                                p=p))
            for _ in range(n_docs)]
    return pd.DataFrame({"text": docs})


def test_matches_duckdb_and_exchange_topk():
    pdf = _corpus()
    con = duckdb.connect()
    con.register("d", pdf)
    exp = con.sql(r"""
        WITH tok AS (SELECT unnest(regexp_extract_all(text, '\S+'))
                         AS term FROM d)
        SELECT term, CAST(count(*) AS BIGINT) AS cnt
        FROM tok GROUP BY term ORDER BY cnt DESC, term LIMIT 12
    """).df().reset_index(drop=True)
    ds = ray.data.from_arrow(
        pa.Table.from_pandas(pdf, preserve_index=False)).repartition(6)
    got = topk_two_pass(ds, k=12, summary_width=120).to_pandas()
    pd.testing.assert_frame_equal(got, exp)
    # identical result to the exchange-based operator
    et = (top_terms(ds.map_batches(
        lambda b: b.append_column(
            "doc_id", pa.array(np.arange(b.num_rows))),
        batch_format="pyarrow"), k=12, by="term_count")
        .to_pandas().reset_index(drop=True))
    pd.testing.assert_frame_equal(got, et)


def test_soundness_gate_raises_on_too_narrow_summary():
    # near-uniform corpus + narrow width: the k-th lower bound cannot beat
    # the accumulated error bound -> must raise, never silently wrong
    rng = np.random.default_rng(283)
    vocab = [f"w{i}" for i in range(50)]
    docs = [" ".join(rng.choice(vocab, size=20)) for _ in range(200)]
    ds = ray.data.from_arrow(
        pa.table({"text": pa.array(docs)})).repartition(8)
    with pytest.raises(ValueError, match="summary_width"):
        topk_two_pass(ds, k=10, summary_width=12)
