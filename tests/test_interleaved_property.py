"""Property-based invariants for the interleaved-input converter
(FIXTURES.md §5 item 4): arbitrary interleavings of text/media spans."""

from hypothesis import given, settings
from hypothesis import strategies as st

from docling_api_ray.config import PipelineConfig
from docling_api_ray.functions.spans import PLACEHOLDER
from docling_api_ray.pipelines.interleaved import (
    InterleavedConvert,
    items_from_input_spans,
)
from docling_api_ray.functions.spans import assemble_spans

CFG = PipelineConfig(extract_tables_as_images=True)

span_strategy = st.lists(
    st.one_of(
        st.builds(
            lambda t: {"kind": "text", "text": t, "media_ref": "", "offset": 0},
            st.text(alphabet="ab <!->img", max_size=25),
        ),
        st.just({"kind": "media", "text": "", "media_ref": "m", "offset": 0}),
    ),
    max_size=40,
).map(
    lambda spans: [
        {**s, "offset": i} for i, s in enumerate(spans)
    ]
)


@settings(max_examples=150, deadline=None)
@given(span_strategy)
def test_interleaved_invariants(spans):
    doc = assemble_spans(
        items_from_input_spans(spans),
        extract_tables_as_images=True,
    )
    # span multiset preserved: one output span per input span, in order
    assert len(doc.spans) == len(spans)
    assert [s["offset"] for s in doc.spans] == list(range(len(spans)))
    # text spans pass through byte-identical
    for inp, out in zip(spans, doc.spans):
        if inp["kind"] == "text":
            assert out["kind"] == "text" and out["text"] == inp["text"]
        else:
            assert out["kind"] in ("table", "picture")
    # media counters dense 1..n per type
    for kind in ("table", "picture"):
        refs = [s["media_ref"] for s in doc.spans if s["kind"] == kind]
        assert refs == [f"{kind}-{i}.png" for i in range(1, len(refs) + 1)]
    # every media span got a blob; blobs match refs in order
    assert [m["filename"] for m in doc.media] == [
        s["media_ref"] for s in doc.spans if s["media_ref"]
    ]
    # placeholder accounting: all picture placeholders substituted unless
    # literal placeholders exist in text
    if not any(PLACEHOLDER in (s.get("text") or "") for s in spans):
        assert PLACEHOLDER not in doc.markdown
