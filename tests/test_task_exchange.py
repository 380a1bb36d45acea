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


def test_auto_join_dispatch_and_equivalence():
    import duckdb
    import pyarrow as pa

    from featurebox_ray.stages.join import auto_join

    rng = np.random.default_rng(73)
    left = pa.table({
        "k": pa.array(rng.integers(0, 40, 300), pa.int64()),
        "lv": pa.array(np.arange(300), pa.int64()),
    })
    # right side with duplicate keys, a NULL value on a matched key,
    # and keys absent from the left
    right = pa.table({
        "k": pa.array([0, 0, 1, 2, 99], pa.int64()),
        "rv": pa.array([10, 11, None, 12, 13], pa.int64()),
    })
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    for how in ("inner", "left"):
        want = con.execute(f"""
            SELECT l.k, l.lv, r.rv FROM l {how.upper()} JOIN r USING (k)
            ORDER BY lv, rv NULLS FIRST
        """).fetch_arrow_table()
        for thresh in (10, 0):  # 10 -> broadcast path, 0 -> hash path
            got = (auto_join(ray.data.from_arrow(left).repartition(3),
                             ray.data.from_arrow(right), on="k",
                             how=how, broadcast_threshold_rows=thresh,
                             num_partitions=4)
                   .to_pandas()
                   .sort_values(["lv", "rv"], na_position="first")
                   .reset_index(drop=True))
            assert len(got) == want.num_rows, (how, thresh)
            for c in ("k", "lv", "rv"):
                gv = [None if isinstance(v, float) and v != v else int(v)
                      for v in got[c].tolist()]
                assert gv == want[c].to_pylist(), (c, how, thresh)
