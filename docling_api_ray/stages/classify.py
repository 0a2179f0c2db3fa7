"""Classify stage — the Ray Data wrapper for format sniffing (M1-M4).

Stateless ``map_batches`` over zero-copy Arrow batches; the per-row support
gate of the reference (route.py:31-32, HTTP 400) is NOT a drop here — rows
with ``format = null`` flow through to the convert stage which records the
``error`` column (SURVEY.md §2.2 M4 divergence note).
"""

from __future__ import annotations

import ray.data

from docling_api_ray.config import PipelineConfig, DEFAULT_CONFIG
from docling_api_ray.functions.sniff import classify_format


def add_format_column(
    ds: ray.data.Dataset, config: PipelineConfig = DEFAULT_CONFIG
) -> ray.data.Dataset:
    return ds.map_batches(
        classify_format,
        batch_format="pyarrow",
        batch_size=config.classify_batch_size,
    )
