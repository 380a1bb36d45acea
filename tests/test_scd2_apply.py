"""scd2_apply (stages/scd.py) — all four merge cases hand-checked;
contract guards; partition invariance."""

import pandas as pd
import pyarrow as pa
import pytest
import ray

from featurebox_ray.stages.scd import scd2_apply

TS = 1000


def _dim(rows):
    return pa.table({
        "k": pa.array([r[0] for r in rows], pa.int64()),
        "state": pa.array([r[1] for r in rows], pa.string()),
        "valid_from": pa.array([r[2] for r in rows], pa.int64()),
        "valid_to": pa.array([r[3] for r in rows], pa.int64()),
        "n_rows": pa.array([r[4] for r in rows], pa.int64())})


def _snap(rows):
    return pa.table({
        "k": pa.array([r[0] for r in rows], pa.int64()),
        "st": pa.array([r[1] for r in rows], pa.string())})


def _run(dim, snap, parts=1) -> pd.DataFrame:
    d = ray.data.from_arrow(dim)
    s = ray.data.from_arrow(snap)
    if parts > 1:
        d = d.repartition(parts)
        s = s.repartition(parts)
    out = scd2_apply(d, s, key_col="k", state_col="st",
                     snap_ts=TS, num_partitions=4,
                     key_type=pa.int64())
    return (out.to_pandas()
            .sort_values(["k", "valid_from", "state"])
            .reset_index(drop=True))


def test_four_merge_cases():
    dim = _dim([
        (1, "a", 0, 50, 3),     # history row, passes through
        (1, "b", 50, None, 2),  # open, snapshot says 'b' -> keep
        (2, "x", 0, None, 1),   # open, snapshot says 'y' -> close+open
        (3, "z", 0, None, 4),   # open, absent from snapshot -> close
    ])
    snap = _snap([(1, "b"), (2, "y"), (9, "new")])  # 9 brand new
    prev = None
    for parts in (1, 3):
        df = _run(dim, snap, parts)
        rows = {(r.k, r.state): (r.valid_from,
                                 None if pd.isna(r.valid_to)
                                 else int(r.valid_to), r.n_rows)
                for r in df.itertuples()}
        assert rows[(1, "a")] == (0, 50, 3)
        assert rows[(1, "b")] == (50, None, 2)      # unchanged open
        assert rows[(2, "x")] == (0, TS, 1)         # closed
        assert rows[(2, "y")] == (TS, None, 0)      # new open
        assert rows[(3, "z")] == (0, TS, 4)         # soft delete
        assert rows[(9, "new")] == (TS, None, 0)    # brand new key
        assert len(df) == 6
        if prev is not None:
            pd.testing.assert_frame_equal(df, prev, check_exact=True)
        prev = df


def test_guards():
    dim = _dim([(1, "a", 0, None, 1), (1, "b", 5, None, 1)])
    snap = _snap([(1, "a")])
    with pytest.raises(Exception, match="multiple open"):
        _run(dim, snap)
    dim2 = _dim([(1, "a", 0, None, 1)])
    snap2 = _snap([(1, "a"), (1, "b")])
    with pytest.raises(Exception, match="duplicate snapshot"):
        _run(dim2, snap2)


def test_null_dim_state_raises():
    dim = pa.table({
        "k": pa.array([1], pa.int64()),
        "state": pa.array([None], pa.string()),
        "valid_from": pa.array([0], pa.int64()),
        "valid_to": pa.array([None], pa.int64()),
        "n_rows": pa.array([1], pa.int64())})
    snap = _snap([(1, "a")])
    with pytest.raises(Exception, match="NULL dim state"):
        _run(dim, snap)
