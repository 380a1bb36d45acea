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
