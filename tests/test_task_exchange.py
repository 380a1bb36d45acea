"""The task-based two-stage exchange must produce identical results to the
groupby-based shuffle (it replaces Ray Data's Sort op in the flagship)."""

import numpy as np
import ray

from featurebox_ray.pipelines.transcript import fused_features_backfill
from featurebox_ray.stages.scalar import add_scalar_features
from featurebox_ray.stages.window import WindowSpec, add_window_features


def _df(ds):
    return ds.to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)


def test_tasks_strategy_equals_groupby(tiny_dir):
    base = add_scalar_features(ray.data.read_parquet(f"{tiny_dir}/transcripts"))
    a = _df(add_window_features(base, WindowSpec(), num_partitions=8,
                                strategy="groupby"))
    b = _df(add_window_features(base, WindowSpec(), num_partitions=8,
                                strategy="tasks"))
    assert len(a) == len(b)
    for c in a.columns:
        if a[c].dtype == object or str(a[c].dtype).startswith("datetime"):
            assert (a[c].fillna("∅").values == b[c].fillna("∅").values).all(), c
        elif a[c].dtype == bool:
            assert (a[c].values == b[c].values).all(), c
        else:
            assert np.allclose(a[c].astype(float), b[c].astype(float),
                               equal_nan=True), c


def test_tasks_strategy_fused(tiny_dir):
    base = add_scalar_features(ray.data.read_parquet(f"{tiny_dir}/transcripts"))
    ft = ray.data.read_parquet(f"{tiny_dir}/feature_table")
    a = _df(fused_features_backfill(base, ft, WindowSpec(),
                                    right_cols=["f_score", "f_label"],
                                    num_partitions=8, strategy="groupby"))
    b = _df(fused_features_backfill(base, ft, WindowSpec(),
                                    right_cols=["f_score", "f_label"],
                                    num_partitions=8, strategy="tasks"))
    assert len(a) == len(b)
    assert np.allclose(a["f_score"].values, b["f_score"].values, equal_nan=True)
    assert (a["f_label"].fillna("∅").values == b["f_label"].fillna("∅").values).all()


def test_tasks_strategy_partition_count_invariance(tiny_dir):
    base = add_scalar_features(ray.data.read_parquet(f"{tiny_dir}/transcripts"))
    a = _df(add_window_features(base, WindowSpec(), num_partitions=3,
                                strategy="tasks"))
    b = _df(add_window_features(base, WindowSpec(), num_partitions=17,
                                strategy="tasks"))
    for c in ("session_id", "roll5_mean_text_len", "win_t3600s_sum_text_len"):
        assert np.allclose(a[c].astype(float), b[c].astype(float), equal_nan=True), c
