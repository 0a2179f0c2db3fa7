"""Reference-shape JSON export (SURVEY.md §2.1 S5, §2.2 M7).

Reproduces the reference's response contract byte-for-byte in structure:
``ConversionResult{filename, markdown, images, error}`` with
``ImageData{type, filename, image}`` where ``image`` is the base64-encoded
PNG string (document_converter/schema.py:5-15; b64 encode at
service.py:63) and the ``model_dump(exclude_unset=True)`` discipline of
worker/tasks.py:23,37 — error rows carry only (filename, error), success
rows carry (filename, markdown, images).

In the engine, base64 exists ONLY here at the export boundary; Arrow
carries raw PNG bytes everywhere else.
"""

from __future__ import annotations

import base64

import pyarrow as pa


def row_to_reference_json(row: dict) -> dict:
    """One results-table row → the reference's ConversionResult dict."""
    filename = row.get("filename", "")
    if row.get("error"):
        return {"filename": filename, "error": row["error"]}
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
