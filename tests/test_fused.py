"""Fused single-shuffle flagship must equal the staged pipeline."""

import numpy as np
import ray

from featurebox_ray.pipelines.transcript import fused_features_backfill
from featurebox_ray.stages.asof import asof_join
from featurebox_ray.stages.scalar import add_scalar_features
from featurebox_ray.stages.window import WindowSpec, add_window_features


def test_fused_equals_staged(tiny_dir):
    base = add_scalar_features(ray.data.read_parquet(f"{tiny_dir}/transcripts"))
    ft = ray.data.read_parquet(f"{tiny_dir}/feature_table")

    staged = add_window_features(base, WindowSpec(), num_partitions=8)
    staged = asof_join(staged, ft, key="conv_id", ts_col="ts",
                       right_cols=["f_score", "f_label"], num_partitions=8)
    a = staged.to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)

    fused = fused_features_backfill(
        base, ft, WindowSpec(), right_cols=["f_score", "f_label"],
        num_partitions=8)
    b = fused.to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)

    assert len(a) == len(b)
    assert sorted(a.columns) == sorted(b.columns)
    for c in a.columns:
        if a[c].dtype == object or str(a[c].dtype).startswith("datetime"):
            assert (a[c].fillna("∅").values == b[c].fillna("∅").values).all(), c
        elif a[c].dtype == bool:
            assert (a[c].values == b[c].values).all(), c
        else:
            assert np.allclose(a[c].astype(float).values,
                               b[c].astype(float).values, equal_nan=True), c
