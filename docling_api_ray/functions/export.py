"""Reference-shape JSON export (SURVEY.md §2.1 S5, §2.2 M7).

Reproduces the reference's response contract byte-for-byte in structure:
``ConversionResult{filename, markdown, images, error}`` with
``ImageData{type, filename, image}`` where ``image`` is the base64-encoded
PNG string (document_converter/schema.py:5-15; b64 encode at
service.py:63) and the ``model_dump(exclude_unset=True)`` discipline of
worker/tasks.py:23,37 — error rows carry only (filename, error), success
rows carry (filename, markdown, images).

Filename field semantics follow the reference exactly: success rows carry
``conv_res.input.file.stem`` — the extension-stripped stem
(service.py:81,91,116) — while batch error rows carry the FULL input name
(``conv_res.input.name``, service.py:112).  The engine standardizes on
the batch path (error-as-data everywhere, §3.1 asymmetry note), so error
rows here keep the full filename like the reference's batch fold.

In the engine, base64 exists ONLY here at the export boundary; Arrow
carries raw PNG bytes everywhere else.
"""

from __future__ import annotations

import base64
from pathlib import PurePosixPath

import pyarrow as pa


def _stem(filename: str) -> str:
    """``Path(filename).stem`` semantics (service.py:81 via
    conv_res.input.file.stem): last suffix stripped, dotfiles keep their
    name."""
    return PurePosixPath(filename).stem if filename else ""


def row_to_reference_json(row: dict, *, stem_error_filename: bool = False) -> dict:
    """One results-table row → the reference's ConversionResult dict.

    ``stem_error_filename=True`` selects the sync-single error shape
    (stem, service.py:83-85); the default is the batch fold's full input
    name (service.py:112)."""
    filename = row.get("filename", "")
    if row.get("error"):
        if stem_error_filename:
            filename = _stem(filename)
        return {"filename": filename, "error": row["error"]}
    filename = _stem(filename)
    images = [
        {
            "type": m["kind"],
            "filename": m["filename"],
            "image": base64.b64encode(m["png"]).decode("utf-8"),
        }
        for m in (row.get("media") or [])
    ]
    out = {"filename": filename, "markdown": row.get("markdown", "")}
    if images:
        out["images"] = images
    return out


def batch_to_reference_json(batch: pa.Table) -> list[dict]:
    """A results batch → the reference's batch-convert response list,
    preserving row order (service.py:101-118 appends in input order)."""
    return [row_to_reference_json(r) for r in batch.to_pylist()]


# ---------------------------------------------------------------------------
# job-result envelopes (SURVEY.md §2.5 G3 / §2.9) — the reference's
# ConversationJobResult / BatchConversionJobResult folds (schema.py:24-39,
# service.py:150-204) re-expressed over engine rows.  The engine's job
# state comes from the checkpoint manifest, not Redis polling; these folds
# produce the same response shapes for a migrating client.
# ---------------------------------------------------------------------------

def single_job_result_json(job_id: str, row: dict) -> dict:
    """One result row → ConversationJobResult dict (service.py:160-173):
    an error row folds to FAILURE carrying only the error; a success row
    folds to SUCCESS embedding the ConversionResult."""
    if row.get("error"):
        return {"job_id": job_id, "status": "FAILURE", "error": row["error"]}
    return {
        "job_id": job_id,
        "status": "SUCCESS",
        "result": row_to_reference_json(row),
    }


def batch_job_result_json(job_id: str, rows: list[dict]) -> dict:
    """Result rows → BatchConversionJobResult dict (service.py:175-204):
    the BATCH is SUCCESS as long as the job ran (per-item failures do NOT
    fail the batch — each item folds to its own SUCCESS/FAILURE
    ConversationJobResult, reference lines 189-202).  Row order is input
    order.  Driver-resident by design: this convenience envelope is for
    ad-hoc batches; corpus-scale results stay in the output table."""
    items = []
    for row in rows:
        if row.get("error"):
            items.append({"status": "FAILURE", "error": row["error"]})
        else:
            items.append(
                {"status": "SUCCESS", "result": row_to_reference_json(row)}
            )
    return {
        "job_id": job_id,
        "status": "SUCCESS",
        "conversion_results": items,
    }


def job_status_from_manifest(out_dir: str, npartitions: int) -> str:
    """IN_PROGRESS / SUCCESS from the checkpoint manifest — the engine
    analog of the reference's PENDING→IN_PROGRESS poll (service.py:
    161-162; its unknown-job-id→IN_PROGRESS quirk is intentionally not
    reproduced: a missing manifest directory raises)."""
    from docling_api_ray.pipelines.checkpoint import completed_partitions

    import os

    if not os.path.isdir(os.path.join(out_dir, "_manifest")):
        raise FileNotFoundError(f"no checkpoint manifest under {out_dir}")
    done = completed_partitions(out_dir)
    return "SUCCESS" if len(done) >= npartitions else "IN_PROGRESS"
