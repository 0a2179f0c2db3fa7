"""Arrow schemas for the engine's logical tables (SURVEY.md §1.2).

The essential semantic object reproduced from the reference is an
*interleaved sequence*: a markdown text stream in document reading order
with media references spliced in at their positions
(document_converter/service.py:41-66) plus a side list of media blobs named
``table-{n}.png`` / ``picture-{n}.png`` by per-document 1-based counters
(service.py:53-60).  Here that is an explicit, order-verifiable
``spans`` list column instead of a placeholder-substituted string.

All schemas are fixed pyarrow schemas — the reference's untyped
``(filename, BytesIO)`` blobs (service.py:22,74) become typed rows.
"""

from __future__ import annotations

import pyarrow as pa

# ---------------------------------------------------------------------------
# span struct — one element of the interleaved sequence
# kind: input side "text" | "media"; output side "text" | "table" | "picture"
# ---------------------------------------------------------------------------
SPAN_TYPE = pa.struct(
    [
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("offset", pa.int32()),
    ]
)

# NOTE on doc_id types: these schemas declare the CANONICAL Lance-corpus
# shape (input_hint: doc_id string).  The pipeline stages themselves are
# key-type-generic — they pass the source's doc_id column through
# untouched, so over the driver testdata (doc_id int64) outputs carry
# int64 keys.  Validate against these schemas only for string-keyed
# corpora (see pipelines/interleaved.py + sources/corpus.py).

# input: raw binary documents (F2 in FIXTURES.md) — the shape of the
# reference's upload surface (route.py:25-38): a filename plus payload bytes.
RAW_DOCUMENTS_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("filename", pa.string()),
        ("payload", pa.binary()),
    ]
)

# input: interleaved documents (F1; BASELINE.json input_hint shape)
INTERLEAVED_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("spans", pa.list_(SPAN_TYPE)),
    ]
)

# media blob struct (schema.py:5-8 ImageData re-expressed: the b64 PNG string
# becomes raw pa.binary(); "type" Literal["table","picture"] becomes kind)
MEDIA_TYPE = pa.struct(
    [
        ("kind", pa.string()),
        ("filename", pa.string()),
        ("png", pa.binary()),
    ]
)

# output: conversion results — one row per document
# (schema.py:11-15 ConversionResult re-expressed; error-as-data column keeps
# the raises_on_error=False semantics of service.py:80,103)
RESULT_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("filename", pa.string()),
        ("format", pa.string()),
        ("spans", pa.list_(SPAN_TYPE)),
        ("markdown", pa.string()),
        ("media", pa.list_(MEDIA_TYPE)),
        ("error", pa.string()),
    ]
)

# checkpoint manifest row (§4: resumable at partition granularity)
MANIFEST_SCHEMA = pa.schema(
    [
        ("partition_id", pa.string()),
        ("input_ref", pa.string()),
        ("row_count", pa.int64()),
        ("span_count", pa.int64()),
        ("error_count", pa.int64()),
        ("status", pa.string()),  # "done"
    ]
)


def empty_table(schema: pa.Schema) -> pa.Table:
    return schema.empty_table()
