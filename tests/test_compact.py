"""Small-file compaction (stages/compact.py) — plan shape, content
invariance, refusal semantics."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray

from featurebox_ray.stages.compact import (compact_fragments,
                                           plan_compaction)
from featurebox_ray.stages.profile import table_checksum


def _shatter(d, n_files=12, rows=200):
    rng = np.random.default_rng(284)
    os.makedirs(d)
    for i in range(n_files):
        pq.write_table(pa.table({
            "k": pa.array(rng.integers(0, 1000, rows)),
            "s": pa.array([f"r{j}" for j in range(rows)]),
        }), f"{d}/frag-{i:03d}.parquet")


def test_plan_and_compact_content_invariant(tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    _shatter(src)
    one = os.path.getsize(f"{src}/frag-000.parquet")
    plan = plan_compaction(src, target_bytes=3 * one + one // 2)
    # next-fit over equal sizes -> groups of 3 (last may be
    # short), deterministic order
    assert all(len(g) <= 3 for g in plan)
    assert sum(len(g) for g in plan) == 12
    assert plan[0][0].endswith("frag-000.parquet")
    man = compact_fragments(src, out, target_bytes=3 * one + one // 2)
    assert man.num_rows == len(plan)
    assert sum(man["rows"].to_pylist()) == 12 * 200
    before = table_checksum(ray.data.read_parquet(src),
                            cols=["k", "s"]).to_pandas()
    after = table_checksum(ray.data.read_parquet(out),
                           cols=["k", "s"]).to_pandas()
    assert before.equals(after)
    n_out = len([f for f in os.listdir(out)
                 if f.endswith(".parquet")])
    assert n_out == len(plan) < 12


def test_compact_refuses_nonempty_output(tmp_path):
    src = str(tmp_path / "src2")
    out = str(tmp_path / "out2")
    _shatter(src, n_files=2)
    os.makedirs(out)
    open(f"{out}/stale", "w").close()
    with pytest.raises(ValueError, match="not empty"):
        compact_fragments(src, out)


def test_oversized_fragment_gets_own_bin(tmp_path):
    d = str(tmp_path / "big")
    os.makedirs(d)
    pq.write_table(pa.table({"k": pa.array(range(10000))}),
                   f"{d}/a.parquet")
    pq.write_table(pa.table({"k": pa.array(range(5))}),
                   f"{d}/b.parquet")
    plan = plan_compaction(d, target_bytes=10)
    assert plan == [[f"{d}/a.parquet"], [f"{d}/b.parquet"]]
