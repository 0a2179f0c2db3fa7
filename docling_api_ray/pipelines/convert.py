"""Flagship end-to-end conversion pipeline (SURVEY.md §3.4).

``raw documents → classify (M1-M4, stateless map_batches) → convert actor
pool (A1-A5, warm per-actor state, per-batch format dispatch J1, error
channel D4) → results table`` — every stage a streaming Arrow batch
transform; no shuffle on the hot path; the only materialization points
are the caller's sink (write_parquet / aggregate / take).
"""

from __future__ import annotations

import ray.data

from docling_api_ray.config import DEFAULT_CONFIG, PipelineConfig
from docling_api_ray.sources.testdata import raw_documents_dataset
from docling_api_ray.stages.classify import add_format_column
from docling_api_ray.stages.convert import convert_documents


def convert_pipeline(
    raw: ray.data.Dataset, config: PipelineConfig = DEFAULT_CONFIG
) -> ray.data.Dataset:
    """Attach classify + convert to a raw (doc_id, filename, payload)
    dataset.  Lazy — caller chooses the sink."""
    return convert_documents(add_format_column(raw, config), config)


def flagship(
    sf_dir: str,
    config: PipelineConfig | None = None,
    *,
    amplify: int = 1,
) -> ray.data.Dataset:
    """The full pipeline over the driver testdata documents table."""
    cfg = config or PipelineConfig(extract_tables_as_images=True)
    raw = raw_documents_dataset(sf_dir, amplify=amplify)
    return convert_pipeline(raw, cfg)
