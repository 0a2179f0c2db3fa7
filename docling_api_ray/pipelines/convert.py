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
from docling_api_ray.stages.skew import rebalance_by_cost


def convert_pipeline(
    raw: ray.data.Dataset, config: PipelineConfig = DEFAULT_CONFIG
) -> ray.data.Dataset:
    """Attach classify (+ optional cost rebalance) + convert to a raw
    (doc_id, filename, payload) dataset.  Lazy — caller chooses the sink.

    The rebalance stage (stages/skew.py) bounds per-task input when
    upstream blocks are oversized; for corpora with mega-documents use
    ``convert_pipeline_heavy_split`` — the explicit skew handling of
    SURVEY.md §4."""
    ds = add_format_column(raw, config)
    if config.rebalance_target_cost:
        ds = rebalance_by_cost(ds, target_cost=config.rebalance_target_cost)
    if config.gpu_formats:
        from docling_api_ray.stages.convert import convert_documents_split

        return convert_documents_split(ds, config)
    return convert_documents(ds, config)


def convert_pipeline_heavy_split(
    raw: ray.data.Dataset,
    config: PipelineConfig = DEFAULT_CONFIG,
    *,
    heavy_threshold: int | None = None,
) -> ray.data.Dataset:
    """Skew-aware variant: heavy documents (payload > threshold) convert
    in their own batch_size=1 actor tasks so a 500-page PDF cannot
    head-of-line-block a batch of light docs; light documents stay
    densely batched.  Results union back into one stream.  See
    stages/skew.py for the branch re-execution tradeoff."""
    import dataclasses

    from docling_api_ray.stages.skew import HEAVY_THRESHOLD, dispatch_by_cost

    ds = add_format_column(raw, config)
    heavy, light = dispatch_by_cost(
        ds, threshold=heavy_threshold or HEAVY_THRESHOLD
    )
    heavy_cfg = dataclasses.replace(
        config, convert_batch_size=1, convert_concurrency=max(2, config.convert_concurrency // 4)
    )
    return convert_documents(light, config).union(
        convert_documents(heavy, heavy_cfg)
    )


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
