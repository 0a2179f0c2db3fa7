"""Job driver — the ``ray job submit`` entry point (SURVEY.md §3.4).

Replaces the reference's HTTP/Celery submission surface (route.py:72-87)
with a batch job:

    ray job submit -- python -m docling_api_ray.cli \
        --input /data/sf0.1 --output /out/run1 --partitions 64 --resume

Resumable by default: the output directory's partition manifest is
consulted and completed partitions are skipped (pipelines/checkpoint.py).
``--summary`` prints the per-format conversion metrics (G3) after the
run.  Owns its Ray session (guarded init) — library code never calls
ray.init.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _append_main(argv: list[str]) -> int:
    """``append`` subcommand — the end-to-end incremental-commit run
    (pipelines/append.py): triage the increment against the committed
    store's persisted indexes, convert survivors, commit partitions,
    append the dedup/IVF indexes.  Resumable: rerunning the same
    increment spec resumes at the first uncommitted stage/partition.

        python -m docling_api_ray.cli append --store /out/corpus \
            --input /data/documents.parquet --lo 0 --hi 300000 \
            [--embeddings /data/embeddings.parquet --ivf-k 64] \
            [--knn-threshold 0.99]
    """
    ap = argparse.ArgumentParser(prog="docling_api_ray.cli append")
    ap.add_argument("--store", required=True, help="committed store directory")
    ap.add_argument("--input", required=True, help="increment documents parquet")
    ap.add_argument("--lo", type=int, required=True)
    ap.add_argument("--hi", type=int, required=True)
    ap.add_argument("--embeddings", default=None)
    ap.add_argument("--ivf-k", type=int, default=0,
                    help="on first use of a fresh store: fix the IVF coarse "
                         "quantizer to the k smallest-vec_id increment "
                         "vectors (deterministic, the kmeans init discipline)")
    ap.add_argument("--partitions", type=int, default=8)
    ap.add_argument("--minhash-threshold", type=float, default=0.7)
    ap.add_argument("--knn-threshold", type=float, default=None)
    ap.add_argument("--num-cpus", type=int, default=None)
    args = ap.parse_args(argv)

    import ray

    if not ray.is_initialized():
        kwargs = dict(address=None, include_dashboard=False,
                      logging_level="ERROR")
        addr_env = os.environ.get("RAY_ADDRESS", "")
        if args.num_cpus and (not addr_env or addr_env == "local"):
            kwargs["num_cpus"] = args.num_cpus
        ray.init(**kwargs)

    from docling_api_ray.pipelines.append import init_store, run_append

    if not os.path.exists(os.path.join(args.store, "_manifest", "store.json")):
        centroids = None
        if args.ivf_k and args.embeddings:
            import numpy as np
            import pyarrow.parquet as pq

            head = pq.read_table(
                args.embeddings,
                columns=["vec_id", "embedding"],
                filters=[("vec_id", ">=", args.lo), ("vec_id", "<", args.hi)],
            ).to_pylist()
            head.sort(key=lambda r: r["vec_id"])
            centroids = np.asarray(
                [r["embedding"] for r in head[: args.ivf_k]], dtype=np.float64
            )
        init_store(args.store, centroids=centroids)

    rec = run_append(
        args.store,
        args.input,
        args.lo,
        args.hi,
        embeddings_path=args.embeddings,
        npartitions=args.partitions,
        minhash_threshold=args.minhash_threshold,
        knn_cos_threshold=args.knn_threshold,
    )
    print(json.dumps(rec, default=str))
    ray.shutdown()
    return 0


def _compact_main(argv: list[str]) -> int:
    """``compact`` subcommand — LSM-style store maintenance: merge the
    per-append dedup/IVF index leaves into one consolidated leaf each
    (pipelines/append.py compact_store); triage semantics are unchanged
    by construction."""
    ap = argparse.ArgumentParser(prog="docling_api_ray.cli compact")
    ap.add_argument("--store", required=True)
    ap.add_argument("--num-cpus", type=int, default=None)
    ap.add_argument(
        "--corpus", action="store_true",
        help="also compact corpus partitions (tombstone-aware rewrite "
             "into one consolidated append=-1 leaf)",
    )
    args = ap.parse_args(argv)

    import ray

    if not ray.is_initialized():
        kwargs = dict(address=None, include_dashboard=False,
                      logging_level="ERROR")
        addr_env = os.environ.get("RAY_ADDRESS", "")
        if args.num_cpus and (not addr_env or addr_env == "local"):
            kwargs["num_cpus"] = args.num_cpus
        ray.init(**kwargs)

    from docling_api_ray.pipelines.append import compact_store

    print(json.dumps(compact_store(args.store, include_corpus=args.corpus)))
    ray.shutdown()
    return 0


def main(argv: list[str] | None = None) -> int:
    if argv is None:
        argv = sys.argv[1:]
    if argv and argv[0] == "append":
        return _append_main(argv[1:])
    if argv and argv[0] == "compact":
        return _compact_main(argv[1:])
    ap = argparse.ArgumentParser(description="docling_api_ray batch driver")
    ap.add_argument("--input", required=True, help="sf_dir containing documents.parquet")
    ap.add_argument("--output", required=True, help="output directory (partitioned)")
    ap.add_argument("--partitions", type=int, default=8)
    ap.add_argument("--no-resume", action="store_true",
                    help="clear the output directory instead of resuming")
    ap.add_argument("--extract-tables", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="emit table PNG media (--no-extract-tables for the "
                         "reference default)")
    ap.add_argument("--image-scale", type=int, default=4, choices=range(1, 5))
    ap.add_argument("--num-cpus", type=int, default=None,
                    help="only for standalone runs; ignored under ray job submit")
    ap.add_argument("--summary", action="store_true")
    args = ap.parse_args(argv)

    import ray

    if not ray.is_initialized():
        # address=None → honor RAY_ADDRESS (the ray job submit runtime /
        # an existing cluster); falls back to a local instance otherwise.
        kwargs = dict(address=None, include_dashboard=False, logging_level="ERROR")
        addr_env = os.environ.get("RAY_ADDRESS", "")
        connecting = bool(addr_env) and addr_env != "local"
        if args.num_cpus and not connecting:
            # ray.init raises if num_cpus is passed while connecting to an
            # existing cluster — only apply it for standalone/local runs
            kwargs["num_cpus"] = args.num_cpus
        ray.init(**kwargs)

    from docling_api_ray.config import PipelineConfig
    from docling_api_ray.pipelines.checkpoint import run_resumable

    if args.no_resume:
        import shutil

        shutil.rmtree(args.output, ignore_errors=True)

    cfg = PipelineConfig(
        extract_tables_as_images=args.extract_tables,
        image_resolution_scale=args.image_scale,
    )
    committed = run_resumable(
        args.input, args.output, cfg, npartitions=args.partitions
    )
    out = {
        "committed_partitions": [r["partition_id"] for r in committed],
        "rows": sum(r["row_count"] for r in committed),
        "errors": sum(r["error_count"] for r in committed),
    }
    if args.summary:
        # streaming aggregate over the committed partitions — the output
        # table never concatenates on the driver; only the 8-row metrics
        # result materializes
        from docling_api_ray.pipelines.checkpoint import read_output_dataset
        from docling_api_ray.pipelines.metrics import conversion_metrics

        ds = read_output_dataset(
            args.output, columns=["format", "spans", "media", "error"]
        )
        metrics = conversion_metrics(ds).take_all()
        out["metrics"] = sorted(metrics, key=lambda r: r["format"])
    print(json.dumps(out, default=str))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
