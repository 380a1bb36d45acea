"""Checkpoint/resume determinism (FIXTURES F5.4)."""

import glob
import os
import shutil

import numpy as np
import pytest
import ray

from featurebox_ray.stages.scalar import add_scalar_features
from featurebox_ray.stages.window import WindowSpec, window_kernel
from featurebox_ray.state.checkpoint import (
    finished_partitions, run_partitioned_checkpointed)


def _mkds(d):
    return add_scalar_features(ray.data.read_parquet(f"{d}/transcripts"))


def _run(d, out):
    spec = WindowSpec()
    return run_partitioned_checkpointed(
        _mkds(d), lambda t: window_kernel(t, spec), out,
        key="conv_id", sort_keys=["conv_id", "ts", "turn_idx"],
        num_partitions=8, input_desc="test")


def test_kill_resume_byte_identical(tiny_dir, tmp_path):
    out = str(tmp_path / "ckpt")
    m1 = _run(tiny_dir, out)
    assert len(m1) == 8
    h1 = {m["partition"]: m["feature_hash"] for m in m1}
    total1 = sum(m["rows"] for m in m1)

    # simulated crash: drop 3 partitions
    for pid in (1, 4, 6):
        for f in glob.glob(f"{out}/part-{pid:05d}.parquet") + glob.glob(
                f"{out}/_manifest/part-{pid:05d}.json"):
            os.remove(f)
    assert len(finished_partitions(out)) == 5

    m2 = _run(tiny_dir, out)
    h2 = {m["partition"]: m["feature_hash"] for m in m2}
    assert h1 == h2  # byte-stable resume
    assert sum(m["rows"] for m in m2) == total1
    back = ray.data.read_parquet(out, file_extensions=["parquet"])
    assert back.count() == total1


def test_manifest_invalidated_by_row_mismatch(tiny_dir, tmp_path):
    out = str(tmp_path / "ckpt2")
    _run(tiny_dir, out)
    # corrupt one partition file (truncate) -> manifest row-count check fails
    target = sorted(glob.glob(f"{out}/part-*.parquet"))[0]
    import pyarrow.parquet as pq

    t = pq.read_table(target)
    pq.write_table(t.slice(0, max(1, t.num_rows // 2)), target)
    done = finished_partitions(out)
    assert len(done) == 7  # corrupted partition no longer counts as finished


def test_param_change_invalidates_stale_layout(tiny_dir, tmp_path):
    """Re-running with a different num_partitions must NOT mix partitions
    bucketed under the old layout with new ones (ADVICE: stale crc32 % P
    buckets silently duplicate/drop rows)."""
    out = str(tmp_path / "ckpt3")
    m1 = _run(tiny_dir, out)
    total = sum(m["rows"] for m in m1)

    spec = WindowSpec()
    m2 = run_partitioned_checkpointed(
        _mkds(tiny_dir), lambda t: window_kernel(t, spec), out,
        key="conv_id", sort_keys=["conv_id", "ts", "turn_idx"],
        num_partitions=4, input_desc="test")
    assert len(m2) == 4  # old 8-way parts were invalidated, not merged
    assert sum(m["rows"] for m in m2) == total
    back = ray.data.read_parquet(out, file_extensions=["parquet"])
    assert back.count() == total


def test_fragment_level_resume_prunes_input(tiny_dir, tmp_path):
    """Resume over a same-layout partitioned input reads only the files of
    missing partitions."""
    from featurebox_ray.state.checkpoint import partitioned_input_files

    stage1 = str(tmp_path / "stage1")
    spec = WindowSpec()
    run_partitioned_checkpointed(
        _mkds(tiny_dir), lambda t: window_kernel(t, spec), stage1,
        key="conv_id", sort_keys=["conv_id", "ts", "turn_idx"],
        num_partitions=8, input_desc="test")

    stage2 = str(tmp_path / "stage2")
    ident = lambda t: t
    m1 = run_partitioned_checkpointed(
        None, ident, stage2, key="conv_id",
        sort_keys=["conv_id", "ts", "turn_idx"], num_partitions=8,
        input_desc="stage1", input_partitioned_dir=stage1)
    total = sum(m["rows"] for m in m1)
    assert len(m1) == 8

    # crash: drop partitions 2 and 5 from stage2
    for pid in (2, 5):
        os.remove(f"{stage2}/part-{pid:05d}.parquet")
        os.remove(f"{stage2}/_manifest/part-{pid:05d}.json")

    # the prune helper selects exactly the 2 missing files
    files = partitioned_input_files(stage1, [2, 5])
    assert [os.path.basename(f) for f in files] == [
        "part-00002.parquet", "part-00005.parquet"]

    m2 = run_partitioned_checkpointed(
        None, ident, stage2, key="conv_id",
        sort_keys=["conv_id", "ts", "turn_idx"], num_partitions=8,
        input_desc="stage1", input_partitioned_dir=stage1)
    assert sum(m["rows"] for m in m2) == total
    assert {m["partition"] for m in m2} == set(range(8))


def test_empty_partitions_recorded_and_resume_is_idempotent(tiny_dir, tmp_path):
    """Partitions with zero input rows get zero-row manifests at run
    completion, so (a) a completed run's resume is a no-op even with a
    partitioned input, (b) finished_partitions reports the full layout."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from featurebox_ray.state.checkpoint import finished_partitions

    # single-conversation input: with 8 partitions, 7 hash empty
    src = str(tmp_path / "src")
    os.makedirs(src, exist_ok=True)
    n = 50
    pq.write_table(pa.table({
        "conv_id": pa.array(["only_conv"] * n),
        "turn_idx": pa.array(list(range(n))),
        "ts": pa.array([float(i) for i in range(n)]),
        "text_len": pa.array([1.0] * n),
    }), f"{src}/part-00000.parquet")

    out = str(tmp_path / "out")
    ident = lambda t: t
    m1 = run_partitioned_checkpointed(
        ray.data.read_parquet(src), ident, out, key="conv_id",
        sort_keys=["conv_id", "ts"], num_partitions=8, input_desc="one")
    assert len(m1) == 8  # 1 data + 7 recorded-empty
    assert sum(1 for m in m1 if m["rows"] > 0) == 1
    assert finished_partitions(out) == set(range(8))

    # re-invocation with a partitioned input dir whose only part file is
    # already done: must be a clean no-op, not FileNotFoundError
    out2 = str(tmp_path / "out2")
    m2 = run_partitioned_checkpointed(
        None, ident, out2, key="conv_id", sort_keys=["conv_id", "ts"],
        num_partitions=8, input_desc="chained", input_partitioned_dir=out)
    m3 = run_partitioned_checkpointed(
        None, ident, out2, key="conv_id", sort_keys=["conv_id", "ts"],
        num_partitions=8, input_desc="chained", input_partitioned_dir=out)
    assert sum(m["rows"] for m in m3) == sum(m["rows"] for m in m2) == n


def test_resume_classifies_upstream_empty_partitions(tiny_dir, tmp_path):
    """Wedge regression: a downstream resume whose only missing
    partitions are upstream-recorded-empty must complete (classify them
    empty), not raise FileNotFoundError forever."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = str(tmp_path / "src")
    os.makedirs(src, exist_ok=True)
    pq.write_table(pa.table({
        "conv_id": pa.array(["c"] * 20),
        "turn_idx": pa.array(list(range(20))),
        "ts": pa.array([float(i) for i in range(20)]),
    }), f"{src}/part-00000.parquet")

    up = str(tmp_path / "up")
    ident = lambda t: t
    run_partitioned_checkpointed(
        ray.data.read_parquet(src), ident, up, key="conv_id",
        sort_keys=["conv_id", "ts"], num_partitions=4, input_desc="src")

    down = str(tmp_path / "down")
    run_partitioned_checkpointed(
        None, ident, down, key="conv_id", sort_keys=["conv_id", "ts"],
        num_partitions=4, input_desc="up", input_partitioned_dir=up)
    # crash simulation: drop the manifest of an upstream-EMPTY partition
    empties = [p for p in range(4)
               if not os.path.exists(f"{up}/part-{p:05d}.parquet")]
    assert empties  # single conv -> 3 empty partitions
    os.remove(f"{down}/_manifest/part-{empties[0]:05d}.json")
    m = run_partitioned_checkpointed(
        None, ident, down, key="conv_id", sort_keys=["conv_id", "ts"],
        num_partitions=4, input_desc="up", input_partitioned_dir=up)
    assert {mm["partition"] for mm in m} == set(range(4))
    assert sum(mm["rows"] for mm in m) == 20


def test_unfinished_upstream_raises_not_silent_loss(tiny_dir, tmp_path):
    """A downstream resume over a PARTIALLY-finished upstream checkpoint
    must fail loudly: recording the upstream's unfinished partitions as
    empty would be permanent silent data loss."""
    up = str(tmp_path / "up")
    down = str(tmp_path / "down")
    _run(tiny_dir, up)
    # simulate an upstream crash: partitions 2 and 5 unfinished
    for pid in (2, 5):
        for f in glob.glob(f"{up}/part-{pid:05d}.parquet") + glob.glob(
                f"{up}/_manifest/part-{pid:05d}.json"):
            os.remove(f)

    spec = WindowSpec()
    with pytest.raises(FileNotFoundError, match="not finished"):
        run_partitioned_checkpointed(
            _mkds(tiny_dir), lambda t: window_kernel(t, spec), down,
            key="conv_id", sort_keys=["conv_id", "ts", "turn_idx"],
            num_partitions=8, input_desc="test",
            input_partitioned_dir=up)
    # no manifest may claim a partition finished after the refusal
    assert not any(m for m in finished_partitions(down)
                   if m in (2, 5)) or not os.path.isdir(down)


def test_kernel_id_change_invalidates(tiny_dir, tmp_path):
    """Same layout + different kernel_id => stale partitions invalidated
    (old-kernel and new-kernel outputs never mix in one directory)."""
    out = str(tmp_path / "ckpt")
    spec = WindowSpec()

    def go(kid, kern):
        return run_partitioned_checkpointed(
            _mkds(tiny_dir), kern, out,
            key="conv_id", sort_keys=["conv_id", "ts", "turn_idx"],
            num_partitions=8, input_desc="test", kernel_id=kid)

    m1 = go("spec-v1", lambda t: window_kernel(t, spec))
    cols1 = set(m1[0]["columns"])

    def kern2(t):
        out_t = window_kernel(t, spec)
        import pyarrow as pa
        return out_t.append_column("extra", pa.nulls(out_t.num_rows))

    m2 = go("spec-v2", kern2)
    assert all("extra" in m["columns"] for m in m2 if m["rows"])
    assert cols1 != set(m2[0]["columns"]) or not m2[0]["rows"]
