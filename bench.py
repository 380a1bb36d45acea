"""Benchmark harness.

Default: run the headline pipelines over $GRAFT_SF_DIR (default
/root/testdata/sf0.1) with ray.init(address="local",
num_cpus=$RAY_GRAFT_CPUS or 32) and print ONE JSON line:

    {"metric": "...", "value": <headline sec>, "unit": "sec",
     "queries": {...}, "sf": ..., "num_cpus": N,
     "turns_per_sec": <flagship throughput>}

--scaling: run the flagship pipeline twice in fresh subprocesses at
num_cpus=8 and num_cpus=32 on the same input and report both throughputs +
scaling efficiency (BASELINE.md criterion).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

# Synthetic transcripts scale for the flagship turns/sec benchmark
BENCH_CONVS = int(os.environ.get("FBR_BENCH_CONVS", "60000"))
BENCH_SHARDS = 16


def _init_ray(num_cpus: int):
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus, include_dashboard=False)
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)


def _transcripts_dir() -> str:
    """Deterministic synthetic transcripts cached under /tmp (FIXTURES F1),
    shared by all bench runs (same seed -> same bytes)."""
    d = f"/tmp/fbr_bench/transcripts_{BENCH_CONVS}"
    marker = f"{d}/.done"
    if not os.path.exists(marker):
        from featurebox_ray.sources.synthetic import write_dataset

        os.makedirs(d, exist_ok=True)
        write_dataset(d, n_convs=BENCH_CONVS, n_shards=BENCH_SHARDS, seed=42,
                      mega_every=BENCH_CONVS // 4 or 1, mega_turns=2000)
        open(marker, "w").close()
    return d


def run_flagship(num_partitions: int = 64) -> dict:
    """Flagship transcript pipeline: read → scalar → window/session/lag →
    as-of backfill → write parquet.  Returns {turns, sec, turns_per_sec}."""
    import ray

    from featurebox_ray.stages.asof import asof_join
    from featurebox_ray.stages.scalar import add_scalar_features
    from featurebox_ray.stages.window import WindowSpec, add_window_features

    d = _transcripts_dir()
    out_dir = f"/tmp/fbr_bench/out_{os.getpid()}"
    t0 = time.time()
    ds = ray.data.read_parquet(f"{d}/transcripts")
    ds = add_scalar_features(ds)
    ds = add_window_features(ds, WindowSpec(), num_partitions=num_partitions)
    ds = asof_join(ds, ray.data.read_parquet(f"{d}/feature_table"),
                   key="conv_id", ts_col="ts",
                   right_cols=["f_score", "f_label"],
                   num_partitions=num_partitions)
    ds.write_parquet(out_dir)
    n = ray.data.read_parquet(out_dir).count()
    sec = time.time() - t0
    import shutil

    shutil.rmtree(out_dir, ignore_errors=True)
    return {"turns": n, "sec": round(sec, 2),
            "turns_per_sec": round(n / sec, 1)}


QUERY_NAMES = [
    "q01_pricing_summary", "q04_priority_revenue", "q06_sessionize",
    "q08_rolling_window", "q09_time_window", "q10_asof_backfill",
    "q11_session_stats", "q17_exact_dedup", "q20_ann_topk",
    "q22_minhash_neardup",
]


def run_queries(sf_dir: str) -> dict:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __ray_entry__ as e

    qs = e.queries()
    out = {}
    for name in QUERY_NAMES:
        t0 = time.time()
        res = qs[name](sf_dir)
        if hasattr(res, "count"):
            res.count()
        out[name] = round(time.time() - t0, 2)
    return out


def main_default():
    _init_ray(NUM_CPUS)
    flag = run_flagship()
    queries = run_queries(SF_DIR)
    total = round(flag["sec"] + sum(queries.values()), 2)
    print(json.dumps({
        "metric": "featurebox_ray end-to-end (flagship transcripts + headline queries)",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "flagship": flag,
        "turns_per_sec": flag["turns_per_sec"],
    }))
    import ray

    ray.shutdown()


def _scaling_child(num_cpus: int):
    _init_ray(num_cpus)
    flag = run_flagship()
    print("SCALING_RESULT " + json.dumps({"num_cpus": num_cpus, **flag}))
    import ray

    ray.shutdown()


def main_scaling():
    # ensure data exists before children race
    _transcripts_dir()
    results = {}
    for n in (8, 32):
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--scaling-child", str(n)],
            capture_output=True, text=True, timeout=3600,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        for line in p.stdout.splitlines():
            if line.startswith("SCALING_RESULT "):
                results[n] = json.loads(line[len("SCALING_RESULT "):])
        if n not in results:
            print(p.stdout[-2000:], file=sys.stderr)
            print(p.stderr[-2000:], file=sys.stderr)
            raise RuntimeError(f"scaling child num_cpus={n} failed")
    t8, t32 = results[8]["turns_per_sec"], results[32]["turns_per_sec"]
    eff = round(t32 / (t8 * 4), 3)
    print(json.dumps({
        "metric": "scaling efficiency N=8 -> 4N=32 (same input, fresh sessions)",
        "throughput_8": t8,
        "throughput_32": t32,
        "scaling_efficiency": eff,
        "detail": results,
    }))


if __name__ == "__main__":
    if "--scaling-child" in sys.argv:
        _scaling_child(int(sys.argv[sys.argv.index("--scaling-child") + 1]))
    elif "--scaling" in sys.argv:
        main_scaling()
    else:
        main_default()
