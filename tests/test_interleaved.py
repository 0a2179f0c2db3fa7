"""Golden span-sequence fixtures (FIXTURES.md F1/F3): the interleaved-input
pipeline must match an INDEPENDENT reimplementation of the reference
semantics (counter naming, table markdown, first-occurrence picture
placeholder substitution) on a seeded corpus — exact equality on
(kind, text, media_ref, offset) per doc_id plus markdown bytes."""

import pyarrow as pa
import ray.data

from docling_api_ray.config import PipelineConfig
from docling_api_ray.pipelines.interleaved import convert_interleaved
from docling_api_ray.sources.corpus import generate_interleaved

TABLE_MD = "| col |\n| --- |\n| cell |"
PH = "<!-- image -->"
CFG = PipelineConfig(extract_tables_as_images=True)


def golden(spans_in):
    """Independent (loop-style) restatement of service.py:41-66 semantics
    under the engine's media-typing rule."""
    spans, pieces, refs = [], [], []
    tables = pictures = media_idx = 0
    for off, s in enumerate(sorted(spans_in or [], key=lambda x: x["offset"])):
        if s["kind"] == "text":
            spans.append(
                {"kind": "text", "text": s["text"], "media_ref": "", "offset": off}
            )
            pieces.append(s["text"])
        else:
            if media_idx % 2 == 0:
                tables += 1
                ref = f"table-{tables}.png"
                spans.append(
                    {"kind": "table", "text": TABLE_MD, "media_ref": ref, "offset": off}
                )
                pieces.append(TABLE_MD)  # tables serialize as markdown text
            else:
                pictures += 1
                ref = f"picture-{pictures}.png"
                spans.append(
                    {"kind": "picture", "text": "", "media_ref": ref, "offset": off}
                )
                pieces.append(PH)
                refs.append(ref)
            media_idx += 1
    md = "\n\n".join(pieces)
    for r in refs:
        md = md.replace(PH, r, 1)
    return spans, md


def test_golden_span_sequence_equality():
    corpus = generate_interleaved(n_docs=400, seed=42)
    out = convert_interleaved(ray.data.from_arrow(corpus), CFG).take_all()
    by_id = {r["doc_id"]: r for r in out}
    assert len(by_id) == 400
    inputs = corpus.to_pylist()
    n_placeholder_docs = 0
    for row in inputs:
        got = by_id[row["doc_id"]]
        exp_spans, exp_md = golden(row["spans"])
        assert got["spans"] == exp_spans, row["doc_id"]
        assert got["markdown"] == exp_md, row["doc_id"]
        assert got["error"] == ""
        if any(PH in s["text"] for s in row["spans"]):
            n_placeholder_docs += 1
    # the regression corpus really contains literal-placeholder docs
    assert n_placeholder_docs >= 5


def test_empty_doc_flows_through():
    corpus = generate_interleaved(n_docs=98, seed=1)  # doc 0 and 97 empty
    out = convert_interleaved(ray.data.from_arrow(corpus), CFG).take_all()
    empty = [r for r in out if not r["spans"]]
    assert len(empty) >= 2
    assert all(r["markdown"] == "" and r["error"] == "" for r in empty)


def test_media_counters_dense_per_doc():
    corpus = generate_interleaved(n_docs=200, seed=7)
    out = convert_interleaved(ray.data.from_arrow(corpus), CFG).take_all()
    for r in out:
        for kind in ("table", "picture"):
            names = [m["filename"] for m in r["media"] if m["kind"] == kind]
            assert names == [f"{kind}-{i}.png" for i in range(1, len(names) + 1)]


def test_idempotent_on_typed_spans():
    """Re-running the converter over its own typed output reproduces the
    same span sequence (pass-through branch)."""
    corpus = generate_interleaved(n_docs=50, seed=3)
    once = {
        r["doc_id"]: r
        for r in convert_interleaved(ray.data.from_arrow(corpus), CFG).take_all()
    }
    tbl = pa.Table.from_pylist(
        [{"doc_id": d, "spans": r["spans"]} for d, r in once.items()]
    )
    twice = convert_interleaved(ray.data.from_arrow(tbl), CFG).take_all()
    assert len(twice) == len(once)
    for r in twice:
        first = once[r["doc_id"]]
        assert r["spans"] == first["spans"]
        assert r["markdown"] == first["markdown"]
