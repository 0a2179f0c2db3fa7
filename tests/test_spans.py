"""Span assembly + markdown rendering (M6-M8) vs service.py:41-66 semantics,
including the placeholder edge cases called out in SURVEY.md §7."""

from hypothesis import given, settings
from hypothesis import strategies as st

from docling_api_ray.functions.png import make_png
from docling_api_ray.functions.spans import (
    PLACEHOLDER,
    Item,
    assemble_spans,
    render_markdown,
)


def test_counters_and_naming():
    items = [
        Item("text", "intro"),
        Item("table", "| t |", True),
        Item("picture", "", True),
        Item("table", "| t2 |", True),
        Item("picture", "", True),
    ]
    doc = assemble_spans(items, extract_tables_as_images=True)
    refs = [s["media_ref"] for s in doc.spans]
    assert refs == ["", "table-1.png", "picture-1.png", "table-2.png", "picture-2.png"]
    assert [m["filename"] for m in doc.media] == [
        "table-1.png",
        "picture-1.png",
        "table-2.png",
        "picture-2.png",
    ]
    assert [s["offset"] for s in doc.spans] == list(range(5))


def test_tables_not_substituted_in_markdown():
    # tables serialize as markdown text and never replace placeholders
    # (service.py:57-61)
    items = [Item("table", "| a |", True), Item("picture", "", True)]
    doc = assemble_spans(items, extract_tables_as_images=True)
    assert doc.markdown == "| a |\n\npicture-1.png"


def test_extract_tables_flag_gates_table_media():
    items = [Item("table", "| a |", True)]
    off = assemble_spans(items, extract_tables_as_images=False)
    on = assemble_spans(items, extract_tables_as_images=True)
    assert off.media == [] and off.spans[0]["media_ref"] == ""
    assert on.media[0]["kind"] == "table" and on.spans[0]["media_ref"] == "table-1.png"


def test_imageless_picture_shifts_substitution():
    # an imageless picture leaves its placeholder; the NEXT picture's name
    # lands on the FIRST remaining placeholder (bug-compatible with
    # service.py:61 first-occurrence replace)
    items = [Item("picture", "", False), Item("picture", "", True)]
    doc = assemble_spans(items)
    # picture-1 (the second item) substitutes the FIRST placeholder
    assert doc.markdown == f"picture-1.png\n\n{PLACEHOLDER}"


def test_literal_placeholder_in_text_shifts_substitution():
    items = [Item("text", f"see {PLACEHOLDER} here"), Item("picture", "", True)]
    doc = assemble_spans(items)
    assert doc.markdown == f"see picture-1.png here\n\n{PLACEHOLDER}"


def test_png_payload_valid_and_deterministic():
    p1 = make_png(7, 2)
    p2 = make_png(7, 2)
    assert p1 == p2
    assert p1.startswith(b"\x89PNG\r\n\x1a\n") and p1.endswith(
        b"IEND" + p1[-4:]
    )
    assert len(make_png(7, 4)) > len(make_png(7, 1))


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.one_of(
            st.tuples(st.just("text"), st.text(alphabet="ab <->!-", max_size=20)),
            st.tuples(st.just("table"), st.booleans()),
            st.tuples(st.just("picture"), st.booleans()),
        ),
        max_size=30,
    )
)
def test_property_invariants(raw_items):
    items = [
        Item(k, v, False) if k == "text" else Item(k, "| t |" if k == "table" else "", v)
        for k, v in raw_items
    ]
    doc = assemble_spans(items, extract_tables_as_images=True)
    # span multiset preserved, offsets strictly increasing
    assert len(doc.spans) == len(items)
    assert [s["offset"] for s in doc.spans] == list(range(len(items)))
    # media counters dense 1..n per type, in order
    for kind in ("table", "picture"):
        names = [m["filename"] for m in doc.media if m["kind"] == kind]
        assert names == [f"{kind}-{i}.png" for i in range(1, len(names) + 1)]
    # markdown placeholder count == imageless pictures + literal in text,
    # as long as text spans don't contain the placeholder themselves
    if not any(PLACEHOLDER in s["text"] for s in doc.spans):
        n_imageless = sum(
            1 for s in doc.spans if s["kind"] == "picture" and not s["media_ref"]
        )
        assert doc.markdown.count(PLACEHOLDER) == n_imageless
    # idempotent re-render
    assert render_markdown(doc.spans) == doc.markdown
