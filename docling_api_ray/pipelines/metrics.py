"""Per-partition / global conversion metrics (SURVEY.md §2.5 G3).

The reference folds batch job status from per-item results
(service.py:175-204); the engine's equivalent is a grouped aggregate over
the results table: docs / errors / spans / media per format.  Pre-counts
happen inside a vectorized ``map_batches`` so the ``groupby`` shuffle
moves one small row per (batch, format), not per document.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import Count, Sum

from docling_api_ray.stages.common import coalesce_for_shuffle


def _precount(batch: pa.Table) -> pa.Table:
    spans_col = batch["spans"].to_pylist()
    media_col = batch["media"].to_pylist()
    errors = batch["error"].to_pylist()
    return pa.table(
        {
            "format": batch["format"],
            "is_error": pa.array(
                [1 if e else 0 for e in errors], type=pa.int64()
            ),
            "n_spans": pa.array(
                [len(s or []) for s in spans_col], type=pa.int64()
            ),
            "n_media": pa.array(
                [len(m or []) for m in media_col], type=pa.int64()
            ),
        }
    )


def conversion_metrics(results: ray.data.Dataset) -> ray.data.Dataset:
    """results table → one row per format: n_docs, n_errors, total_spans,
    total_media."""
    return (
        coalesce_for_shuffle(results.map_batches(_precount, batch_format="pyarrow"))
        .groupby("format")
        .aggregate(
            Count(alias_name="n_docs"),
            Sum("is_error", alias_name="n_errors"),
            Sum("n_spans", alias_name="total_spans"),
            Sum("n_media", alias_name="total_media"),
        )
    )


def metrics_row(results_tbl: pa.Table) -> dict:
    """Driver-side metrics for one materialized partition (checkpoint
    manifest sidecar)."""
    spans = results_tbl["spans"].to_pylist()
    errors = results_tbl["error"].to_pylist()
    return {
        "row_count": results_tbl.num_rows,
        "span_count": int(sum(len(s or []) for s in spans)),
        "error_count": int(sum(1 for e in errors if e)),
    }
