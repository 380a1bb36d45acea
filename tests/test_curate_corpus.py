"""Composed curation chain (pipelines/cleaning.py:curate_corpus) —
end-to-end equals the step-by-step composition, partition-invariant."""

import functools

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray

from featurebox_ray.pipelines.cleaning import curate_corpus
from featurebox_ray.stages.rank import budget_select
from featurebox_ray.stages.sample import temperature_rebalance
from featurebox_ray.stages.text import gopher_quality_fn


def _docs(seed=137, n=400):
    rng = np.random.default_rng(seed)
    words = ["the", "cat", "and", "runs", "with", "of", "x#y", "...",
             "a", "be", "to", "that", "have", "word"]
    rows = []
    for i in range(n):
        k = int(rng.integers(0, 20))
        rows.append((i, f"s{rng.integers(0, 4)}",
                     " ".join(rng.choice(words, k)) if k else None))
    return pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "source": pa.array([r[1] for r in rows], pa.string()),
        "text": pa.array([r[2] for r in rows], pa.string()),
    })


def test_curate_equals_stepwise_and_partition_invariant():
    t = _docs()
    prev = None
    for parts in (1, 6):
        ds = ray.data.from_arrow(t)
        if parts > 1:
            ds = ds.repartition(parts)
        got = (curate_corpus(ds, min_words=3, min_stop_hits=1,
                             alpha=0.5, token_budget=600)
               .to_pandas().sort_values("doc_id")
               .reset_index(drop=True))
        if prev is not None:
            assert got.equals(prev)
        prev = got

    # step-by-step composition must give the identical result
    fn = functools.partial(gopher_quality_fn, min_words=3,
                           min_stop_hits=1)
    scored = ray.data.from_arrow(t).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True)
    kept = scored.map_batches(
        lambda b: b.filter(b["gq_keep"].combine_chunks())
        .select(["doc_id", "source", "gq_n_words"]),
        batch_format="pyarrow", zero_copy_batch=True)
    mixed = temperature_rebalance(kept, group_col="source",
                                  key_col="doc_id", alpha=0.5)
    keyed = mixed.map_batches(
        lambda b: b.append_column(
            "__neg_id", pc.negate(b["doc_id"].combine_chunks())),
        batch_format="pyarrow", zero_copy_batch=True)
    manual = (budget_select(keyed,
                            order_cols=["gq_n_words", "__neg_id"],
                            cost_col="gq_n_words", budget=600,
                            descending=True)
              .drop_columns(["__neg_id"]).to_pandas()
              .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(prev, manual)
    # the budget is honored and stages actually pruned something
    assert prev.cum_cost.max() <= 600
    assert len(prev) < t.num_rows
