"""Convenience API mirroring the reference's service entry points, so a
docling-api user can switch call-for-call (SURVEY.md §3.1-§3.3).

- ``convert_document``  ≙ POST /documents/convert (route.py:25-38 →
  service.py:125-130).  The reference's sync-single path converts
  document errors into HTTP 500s (service.py:127-129) while batch/async
  keep them as data (service.py:110-113) — mirrored here by
  ``raise_on_error=True`` (default, like the endpoint) vs False.
- ``convert_documents_batch``  ≙ POST /documents/batch-convert
  (service.py:90-118): error rows stay in the result list in input
  order, never raising.

Both return reference-shape ConversionResult dicts (functions/export.py);
both run through the same ConvertActor/handler registry the Dataset
pipeline uses — this is a thin driver-side wrapper for small ad-hoc
batches, NOT the scale path (use pipelines/convert.py for tables).
"""

from __future__ import annotations

from docling_api_ray.config import DEFAULT_CONFIG, PipelineConfig
from docling_api_ray.functions.export import row_to_reference_json
from docling_api_ray.functions.sniff import guess_format_row
from docling_api_ray.functions.spans import stable_seed
from docling_api_ray.stages.convert import ConvertActor


class ConversionFailed(Exception):
    """Raised by convert_document when raise_on_error=True — the engine
    analog of the sync-single HTTP 500 (service.py:127-129)."""


def _convert_one(
    actor: ConvertActor,
    filename: str,
    payload: bytes,
    doc_id=None,
    *,
    stem_error_filename: bool = False,
) -> dict:
    fmt = guess_format_row(payload, filename)
    # same media bytes as the Dataset pipeline when the caller supplies
    # the pipeline's doc_id; filename-keyed otherwise
    seed = stable_seed(doc_id if doc_id is not None else filename)
    spans, media, markdown, error = actor.convert_row(payload, fmt, seed)
    return row_to_reference_json(
        {
            "filename": filename,
            "markdown": markdown,
            "media": media,
            "error": error,
        },
        stem_error_filename=stem_error_filename,
    )


def convert_document(
    filename: str,
    payload: bytes,
    *,
    config: PipelineConfig = DEFAULT_CONFIG,
    raise_on_error: bool = True,
    doc_id=None,
) -> dict:
    """One document → ConversionResult dict.  Unsupported formats raise
    (the reference gates uploads with HTTP 400, route.py:31-32) unless
    raise_on_error=False, in which case the error row is returned.
    Filenames follow sync-single semantics: stem on BOTH success and
    error rows (service.py:81,83-85)."""
    result = _convert_one(
        ConvertActor(config), filename, payload, doc_id, stem_error_filename=True
    )
    if raise_on_error and "error" in result:
        raise ConversionFailed(result["error"])
    return result


def convert_documents_batch(
    documents: list[tuple[str, bytes]],
    *,
    config: PipelineConfig = DEFAULT_CONFIG,
) -> list[dict]:
    """Batch conversion with error-as-data in input order (service.py:
    101-118 semantics): one warm converter reused across the batch."""
    actor = ConvertActor(config)
    return [_convert_one(actor, fn, payload) for fn, payload in documents]
