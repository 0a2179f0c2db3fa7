"""Sources over the driver-generated parquet testdata (TESTDATA.md).

``raw_documents_dataset`` expands the ``documents`` table into the raw
binary upload shape the reference receives (filename + payload bytes,
route.py:25-38) via the deterministic derivation in ``sources/synth.py``
— a stateless ``map_batches`` so the expansion streams with the rest of
the pipeline.  ``amplify`` repeats the corpus with distinct doc_ids for
bench-scale loads (deterministic, no RNG).
"""

from __future__ import annotations

import os

import pyarrow as pa

import ray
import ray.data

from docling_api_ray.sources.synth import make_raw_document


def documents_path(sf_dir: str) -> str:
    return os.path.join(sf_dir, "documents.parquet")


def synthesize_raw_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, text) → (doc_id, filename, payload); drops every other
    column so only the raw upload shape flows downstream (prune early)."""
    doc_ids = batch["doc_id"].to_pylist()
    texts = batch["text"].to_pylist()
    names: list[str] = []
    payloads: list[bytes] = []
    for d, t in zip(doc_ids, texts):
        fn, pl = make_raw_document(int(d), t or "")
        names.append(fn)
        payloads.append(pl)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "filename": pa.array(names, type=pa.string()),
            "payload": pa.array(payloads, type=pa.binary()),
        }
    )


def raw_documents_dataset(
    sf_dir: str, *, amplify: int = 1, override_num_blocks: int | None = None
) -> ray.data.Dataset:
    """Raw binary documents derived from the testdata documents table.

    ``amplify=k`` unions k deterministic copies with doc_id offsets of
    11,640,000·i (= 2910·4000, a multiple of lcm(10, 3, 97) = 2910) — the
    payload class / media-marker rules depend on doc_id mod 10/3/97, so
    every copy reproduces the same class mix deterministically."""
    if amplify > 1:
        # Bench-only corpus amplification.  The amplified id space must be
        # the SOURCE row space — expanding k× inside a map_batches makes
        # Ray size task bundles on the pre-expansion row count, collapsing
        # pipeline parallelism to n_base/batch_size tasks (observed: a
        # 120k-doc run scheduled 3 actor tasks).  So: a ray.data.range
        # source over n_base×k ids + the small base table broadcast once.
        import numpy as np
        import pyarrow.parquet as pq

        offset_unit = 2910 * 4000  # multiple of lcm(10, 3, 97) = 2910
        base = pq.read_table(
            documents_path(sf_dir), columns=["doc_id", "text"]
        ).sort_by("doc_id")
        n_base = base.num_rows
        base_ref = ray.put(base)

        def expand(batch: pa.Table) -> pa.Table:
            tbl = ray.get(base_ref)
            ids = np.asarray(batch["id"], dtype=np.int64)
            copy, pos = np.divmod(ids, n_base)
            # base doc_ids are dense 0..n-1 after the sort, so `pos`
            # indexes directly
            doc_ids = np.asarray(tbl["doc_id"], dtype=np.int64)[pos] + (
                copy * offset_unit
            )
            texts = tbl["text"].take(pa.array(pos))
            return pa.table({"doc_id": pa.array(doc_ids), "text": texts})

        # block count pins task granularity: range ids are ~8 bytes/row, so
        # Ray's byte-based bundling would coalesce them into a handful of
        # huge actor tasks (measured: 16 tasks for 40k docs on 32 actors —
        # half the pool idle).  One block ≈ one convert batch keeps every
        # actor fed.
        n_total = n_base * amplify
        # block sizing bounds BOTH failure modes (measured at 8 CPUs,
        # 480k docs): too few blocks idles the actor pool via byte-based
        # bundling (16 tasks for 40k docs), too many drowns in per-task
        # fixed cost (1875 blocks: 85 s vs 64 blocks: 19 s — each expand
        # task pays a broadcast fetch + dispatch).  Target ≥2048 rows per
        # block, capped at 16 tasks per CPU, floor 2 blocks per CPU.
        try:
            cpus = int(ray.cluster_resources().get("CPU", 8))
        except Exception:
            cpus = 8
        # row bounds per block: ≥2048 (per-task fixed cost), ≤~8192 (30k-row
        # bundles measured ~35% slower on a 2-CPU pool — heap churn), and
        # never fewer than 2 blocks per CPU
        blocks = override_num_blocks or max(
            2 * cpus,
            min(n_total // 2048, max(16 * cpus, n_total // 8192)),
        )
        ds = ray.data.range(
            n_total, override_num_blocks=blocks
        ).map_batches(expand, batch_format="pyarrow")
    else:
        # explicit metadata-free schema: the testdata files carry pandas
        # metadata that makes their Arrow schema unhashable, which makes
        # Ray log schema-dedup warnings on every block unify
        import pyarrow.parquet as pq

        full = pq.read_schema(documents_path(sf_dir))
        kwargs = {
            "columns": ["doc_id", "text"],
            "schema": pa.schema(
                [full.field(c).remove_metadata() for c in ("doc_id", "text")]
            ),
        }
        if override_num_blocks:
            kwargs["override_num_blocks"] = override_num_blocks
        ds = ray.data.read_parquet(documents_path(sf_dir), **kwargs)
    return ds.map_batches(synthesize_raw_batch, batch_format="pyarrow")
