"""Interleaved-input conversion pipeline — the BASELINE.json input_hint
path: a (Lance/Parquet) table of ``(doc_id, spans)`` with input kinds
``text`` | ``media`` flows through a stateless vectorized stage that
resolves media spans to typed, counter-named table/picture spans and
renders reference-semantics markdown.

Media typing rule (engine-defined; the input model leaves media untyped):
media spans alternate table → picture in document order, matching the
synthetic derivation in sources/synth.py, and every media span carries an
image.  Counter naming and placeholder substitution then follow the
reference exactly (service.py:41-66 via functions/spans.py).

Empty-span docs flow through with ``error=''`` and empty outputs — the
reference returns an empty markdown body for empty documents rather than
failing (raises_on_error=False discipline).
"""

from __future__ import annotations

import pyarrow as pa

import ray.data

from docling_api_ray.config import DEFAULT_CONFIG, PipelineConfig
from docling_api_ray.functions.spans import Item, assemble_spans, stable_seed
from docling_api_ray.schema import MEDIA_TYPE, SPAN_TYPE
from docling_api_ray.sources.storage import read_table


def items_from_input_spans(spans: list[dict]) -> list[Item]:
    """input spans (kind text|media) → document Items in reading order."""
    items: list[Item] = []
    media_idx = 0
    for s in sorted(spans or [], key=lambda s: s["offset"]):
        if s["kind"] == "text":
            items.append(Item("text", s["text"]))
        elif s["kind"] == "media":
            kind = "table" if media_idx % 2 == 0 else "picture"
            media_idx += 1
            items.append(
                Item(kind, "| col |\n| --- |\n| cell |" if kind == "table" else "", True)
            )
        else:  # already-typed spans pass through (idempotent re-run)
            items.append(
                Item(s["kind"], s["text"], bool(s["media_ref"]))
            )
    return items


class InterleavedConvert:
    """Stateless batch stage (callable instance broadcast to tasks; swap
    to an actor pool when real table/picture models are slotted in)."""

    def __init__(self, config: PipelineConfig = DEFAULT_CONFIG) -> None:
        self.config = config

    def __call__(self, batch: pa.Table) -> pa.Table:
        spans_in = batch["spans"].to_pylist()
        doc_ids = batch["doc_id"].to_pylist()
        out_spans, out_media, out_md, out_err = [], [], [], []
        for did, spans in zip(doc_ids, spans_in):
            try:
                doc = assemble_spans(
                    items_from_input_spans(spans),
                    extract_tables_as_images=self.config.extract_tables_as_images,
                    image_resolution_scale=self.config.image_resolution_scale,
                    # process- and batching-stable seed: PNG bytes must not
                    # depend on where block boundaries fall
                    png_seed=stable_seed(did),
                )
                out_spans.append(doc.spans)
                out_media.append(doc.media)
                out_md.append(doc.markdown)
                out_err.append("")
            except Exception as e:  # error-as-data, never fail the block
                out_spans.append([])
                out_media.append([])
                out_md.append("")
                out_err.append(f"conversion failed: {e}")
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "spans": pa.array(out_spans, type=pa.list_(SPAN_TYPE)),
                "markdown": pa.array(out_md, type=pa.string()),
                "media": pa.array(out_media, type=pa.list_(MEDIA_TYPE)),
                "error": pa.array(out_err, type=pa.string()),
            }
        )


def convert_interleaved(
    ds: ray.data.Dataset, config: PipelineConfig = DEFAULT_CONFIG
) -> ray.data.Dataset:
    return ds.map_batches(
        InterleavedConvert(config), batch_format="pyarrow", batch_size=512
    )


def interleaved_pipeline(
    uri: str, config: PipelineConfig = DEFAULT_CONFIG
) -> ray.data.Dataset:
    return convert_interleaved(read_table(uri), config)
