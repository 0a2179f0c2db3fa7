"""Partition-granular checkpoint + resume (SURVEY.md §4; north_rule
"resumable from checkpoint with per-partition lineage + metrics").

The reference has no resume story — a crashed Celery batch task restarts
from scratch (§4 table, docker-compose.cpu.yml:17).  Here the input is
cut into deterministic doc_id-range partitions; each partition runs the
full streaming pipeline and commits atomically:

  out_dir/
    part=<i>/...parquet          (written to a tmp dir, then renamed)
    _manifest/part-<i>.json      (partition_id, input lineage, row/span/
                                  error counts, status)

A rerun lists the manifest, skips completed partitions, and processes
only the remainder — the anti-join of input partitions against the
manifest (J2 analog).  At 100 TB the partition unit would be the input
Lance fragment set; the mechanism is identical.

Partitions are processed as a sequence of small streaming jobs (each one
internally parallel across the cluster); the manifest commit is the only
driver-side synchronous step.
"""

from __future__ import annotations

import json
import os
import shutil
from dataclasses import dataclass

import pyarrow as pa
import pyarrow.dataset as pads
import pyarrow.parquet as pq

import ray.data

from docling_api_ray.config import DEFAULT_CONFIG, PipelineConfig
from docling_api_ray.pipelines.convert import convert_pipeline
from docling_api_ray.pipelines.metrics import MetricsAccumulator, counting_stage
from docling_api_ray.sources.testdata import synthesize_raw_batch


@dataclass(frozen=True)
class Partition:
    partition_id: int
    lo: int  # doc_id range [lo, hi)
    hi: int


def plan_partitions(documents_path: str, npartitions: int) -> list[Partition]:
    """Deterministic doc_id-range partitions from parquet metadata only
    (no data read)."""
    meta = pq.read_metadata(documents_path)
    n = meta.num_rows
    # doc_ids are dense 0..n-1 in the testdata; range planning keeps the
    # partition → input mapping reconstructible without reading data.
    step = max(1, (n + npartitions - 1) // npartitions)
    parts = []
    for i, lo in enumerate(range(0, n, step)):
        parts.append(Partition(i, lo, min(n, lo + step)))
    return parts


def _manifest_path(out_dir: str, pid: int) -> str:
    return os.path.join(out_dir, "_manifest", f"part-{pid}.json")


def completed_partitions(out_dir: str) -> set[int]:
    mdir = os.path.join(out_dir, "_manifest")
    if not os.path.isdir(mdir):
        return set()
    done = set()
    for fn in os.listdir(mdir):
        if fn.startswith("part-") and fn.endswith(".json"):
            try:
                with open(os.path.join(mdir, fn)) as f:
                    rec = json.load(f)
                if rec.get("status") == "done":
                    done.add(int(rec["partition_id"]))
            except (ValueError, KeyError, json.JSONDecodeError):
                continue  # torn write → partition treated as incomplete
    return done


def run_resumable(
    sf_dir: str,
    out_dir: str,
    config: PipelineConfig = DEFAULT_CONFIG,
    *,
    npartitions: int = 8,
    fail_after: int | None = None,
) -> list[dict]:
    """Run (or resume) the flagship pipeline partition-by-partition.

    ``fail_after=k`` aborts after k partitions (test hook for the
    kill/resume invariant).  Returns the manifest records of partitions
    completed in THIS call."""
    docs_path = os.path.join(sf_dir, "documents.parquet")
    parts = plan_partitions(docs_path, npartitions)
    os.makedirs(os.path.join(out_dir, "_manifest"), exist_ok=True)
    # partition-geometry guard: a manifest written under a different plan
    # (other npartitions value, or the input grew) must not be resumed —
    # bare partition_id matching would silently skip or duplicate ranges
    plan = {
        "input": docs_path,
        "npartitions": len(parts),
        "num_rows": parts[-1].hi if parts else 0,
    }
    plan_path = os.path.join(out_dir, "_manifest", "plan.json")
    done = completed_partitions(out_dir)
    if os.path.exists(plan_path):
        with open(plan_path) as f:
            prior = json.load(f)
        if prior != plan:
            raise ValueError(
                f"checkpoint plan mismatch: output dir was written with "
                f"{prior}, current run plans {plan}; use a fresh output "
                f"directory (or the same partition count and input)"
            )
    elif done:
        # manifests exist but no plan record (pre-plan-guard layout):
        # their geometry is unknown — refuse rather than resume blind
        raise ValueError(
            f"checkpoint dir {out_dir} has {len(done)} completed partition "
            "manifests but no plan.json; its partition geometry cannot be "
            "validated — use a fresh output directory"
        )
    else:
        tmp = plan_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(plan, f)
        os.replace(tmp, plan_path)
    committed: list[dict] = []
    n_processed = 0
    for part in parts:
        if part.partition_id in done:
            continue
        if fail_after is not None and n_processed >= fail_after:
            raise RuntimeError(f"injected failure after {fail_after} partitions")
        # row-range read with parquet predicate pushdown — only this
        # partition's rows leave storage
        ds = ray.data.read_parquet(
            docs_path,
            columns=["doc_id", "text"],
            filter=(pads.field("doc_id") >= part.lo)
            & (pads.field("doc_id") < part.hi),
        )
        raw = ds.map_batches(synthesize_raw_batch, batch_format="pyarrow")
        results = convert_pipeline(raw, config)
        # manifest counters fold on the stream between convert and sink —
        # committed partitions are never re-read from storage
        acc = MetricsAccumulator.remote()
        results = results.map_batches(
            counting_stage(acc), batch_format="pyarrow"
        )

        final_dir = os.path.join(out_dir, f"part={part.partition_id}")
        tmp_dir = final_dir + ".tmp"
        shutil.rmtree(tmp_dir, ignore_errors=True)
        shutil.rmtree(final_dir, ignore_errors=True)
        results.write_parquet(tmp_dir)
        os.replace(tmp_dir, final_dir)

        # lineage + metrics sidecar; the commit point for this partition.
        # row_count comes from the committed parquet FOOTERS (metadata
        # read only, no data re-read) — exact even under Ray task
        # retries; span/error counts come from the streaming accumulator
        # (exact on retry-free runs, upper bound otherwise — see
        # metrics.counting_stage).
        totals = ray.get(acc.totals.remote())
        totals["row_count"] = sum(
            pq.read_metadata(os.path.join(final_dir, f)).num_rows
            for f in os.listdir(final_dir)
            if f.endswith(".parquet")
        )
        rec = {
            "partition_id": part.partition_id,
            "input_ref": f"{docs_path}[doc_id {part.lo}:{part.hi})",
            **totals,
            "status": "done",
        }
        ray.kill(acc)
        tmp_manifest = _manifest_path(out_dir, part.partition_id) + ".tmp"
        with open(tmp_manifest, "w") as f:
            json.dump(rec, f)
        os.replace(tmp_manifest, _manifest_path(out_dir, part.partition_id))
        committed.append(rec)
        n_processed += 1
    return committed


def committed_partition_dirs(out_dir: str) -> list[str]:
    return sorted(
        os.path.join(out_dir, d)
        for d in os.listdir(out_dir)
        if d.startswith("part=") and not d.endswith(".tmp")
    )


def read_output_dataset(
    out_dir: str, *, columns: list[str] | None = None
) -> ray.data.Dataset:
    """All committed partitions as a STREAMING dataset — the consumption
    path for anything corpus-sized (--summary metrics, downstream
    pipelines).  Never concatenates on the driver.  (read_parquet expands
    a single directory but not a list of them, so list the files.)"""
    files = [
        os.path.join(d, f)
        for d in committed_partition_dirs(out_dir)
        for f in sorted(os.listdir(d))
        if f.endswith(".parquet")
    ]
    if not files:
        raise FileNotFoundError(
            f"no committed partitions under {out_dir} — the run committed "
            "nothing (or only .tmp dirs exist)"
        )
    return ray.data.read_parquet(files, columns=columns)


def read_output(out_dir: str) -> pa.Table:
    """All committed partitions as one Arrow table.  TEST HELPER ONLY —
    driver-resident by construction; use ``read_output_dataset`` for
    anything that scales with the corpus."""
    return pa.concat_tables(
        [pq.read_table(d) for d in committed_partition_dirs(out_dir)]
    )
