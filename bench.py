"""Bench harness — headline pipelines over $GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": "flagship_conversion_sec", "value": <sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": ..., "num_cpus": N,
   "docs": n, "docs_per_sec": rate}

``--scaling`` runs the headline job in fresh subprocesses at N and 4N
CPUs (default 2 and 8 — see BENCH/BASELINE.md for the hardware rationale)
on the same input, median of GRAFT_SCALING_REPS repetitions per level,
and reports throughput at both plus the scaling efficiency (the sandbox
proxy for the N vs 4N node cluster criterion); results are appended to
BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))


def _bench_once() -> dict:
    sys.path.insert(0, REPO)
    os.chdir(REPO)
    os.environ["PYTHONPATH"] = REPO + os.pathsep + os.environ.get("PYTHONPATH", "")
    ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    amplify = int(os.environ.get("GRAFT_AMPLIFY", "8"))
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")

    import ray

    ray.init(
        address="local",
        num_cpus=ncpu,
        include_dashboard=False,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    import pyarrow.parquet as pq

    import __ray_entry__ as em
    from docling_api_ray.config import PipelineConfig
    from docling_api_ray.pipelines.convert import flagship

    # warm the OS page cache so we measure compute+shuffle, not cold reads
    n_base = pq.read_table(os.path.join(sf_dir, "documents.parquet")).num_rows
    pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    pq.read_table(os.path.join(sf_dir, "events.parquet"))

    cfg = PipelineConfig(
        extract_tables_as_images=True,
        convert_concurrency=ncpu,
        convert_batch_size=512,
    )

    # untimed warm-up: spawns the worker pool + convert actors so the timed
    # section measures steady-state throughput, not process cold-start
    flagship(sf_dir, cfg, amplify=1).count()

    # ---- headline: flagship conversion, end-to-end incl. parquet sink ----
    out_dir = "/tmp/bench_out"
    shutil.rmtree(out_dir, ignore_errors=True)
    t0 = time.time()
    flagship(sf_dir, cfg, amplify=amplify).write_parquet(out_dir)
    headline = time.time() - t0
    ndocs = n_base * amplify

    # ---- query battery (each timed separately, consumed via count) ------
    qs = em.queries()
    bench_queries = [] if os.environ.get("GRAFT_HEADLINE_ONLY") else [
        "token_count",
        "quality_score",
        "lang_id",
        "html_extract",
        "dedup_exact",
        "dedup_minhash",
        "dedup_simhash",
        "knn_bruteforce",
        "knn_ivf",
        "events_hourly",
        "conversion_metrics",
    ]
    qt: dict[str, float] = {}
    for name in bench_queries:
        t0 = time.time()
        qs[name](sf_dir).count()
        qt[name] = round(time.time() - t0, 3)

    result = {
        "metric": "flagship_conversion_sec",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": qt,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "num_cpus": ncpu,
        "docs": ndocs,
        "docs_per_sec": round(ndocs / headline, 1),
    }
    ray.shutdown()
    return result


def _run_subprocess(ncpu: int) -> dict:
    # scaling runs need compute >> fixed overhead (~3-5 s of plan/actor-ramp
    # per pipeline) for the efficiency ratio to measure the engine rather
    # than the constant; 96×5000 docs ≈ 8-10 min of single-CPU work
    env = dict(
        os.environ,
        RAY_GRAFT_CPUS=str(ncpu),
        GRAFT_AMPLIFY=os.environ.get("GRAFT_SCALING_AMPLIFY", "96"),
        GRAFT_HEADLINE_ONLY="1",
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        check=True,
    ).stdout
    return json.loads(out.strip().splitlines()[-1])


def _scaling() -> None:
    # N vs 4N CPUs in fresh processes — the sandbox proxy for the N vs 4N
    # node criterion.  Default pair is (2, 8): measured on this container,
    # allocation-heavy python workloads scale near-linearly only up to
    # ~8-12 concurrent workers (pure busy loops reach 26×, but this
    # workload saturates memory bandwidth: task throughput peaks at 16
    # workers and REGRESSES at 32 — see BENCH/BASELINE.md).  Overridable:
    # GRAFT_SCALING_LO/HI=8/32 reproduces the saturated pair.
    lo = int(os.environ.get("GRAFT_SCALING_LO", "2"))
    hi = int(os.environ.get("GRAFT_SCALING_HI", "8"))
    reps = int(os.environ.get("GRAFT_SCALING_REPS", "3"))
    # median over repetitions per level: this container shares hardware
    # with other tenants and single runs jitter ±30%.  Median (not min)
    # avoids pairing a lucky run at one level with an unlucky one at the
    # other; every raw measurement is reported alongside.
    def med(ncpu: int) -> tuple[dict, list[float]]:
        runs = sorted(
            (_run_subprocess(ncpu) for _ in range(reps)),
            key=lambda r: r["value"],
        )
        return runs[len(runs) // 2], [r["value"] for r in runs]

    r_lo, raw_lo = med(lo)
    r_hi, raw_hi = med(hi)
    eff = (r_lo["value"] / r_hi["value"]) / (hi / lo)
    report = {
        "cpus_lo": lo,
        "cpus_hi": hi,
        "sec_lo": r_lo["value"],
        "sec_hi": r_hi["value"],
        "raw_secs_lo": raw_lo,
        "raw_secs_hi": raw_hi,
        "docs_per_sec_lo": r_lo["docs_per_sec"],
        "docs_per_sec_hi": r_hi["docs_per_sec"],
        "scaling_efficiency": round(eff, 3),
        "docs": r_hi["docs"],
        "sf": r_hi["sf"],
    }
    md = os.path.join(REPO, "BENCH", "BASELINE.md")
    os.makedirs(os.path.dirname(md), exist_ok=True)
    with open(md, "a") as f:
        f.write(
            f"\n| {time.strftime('%Y-%m-%d %H:%M')} | {report['docs']} docs "
            f"(sf{report['sf']}) | {report['sec_lo']}s @{lo}cpu "
            f"({report['docs_per_sec_lo']}/s) | {report['sec_hi']}s @{hi}cpu "
            f"({report['docs_per_sec_hi']}/s) | "
            f"{report['scaling_efficiency']} |"
        )
    print(json.dumps(report))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        _scaling()
    else:
        print(json.dumps(_bench_once()))
