"""Real structural parsers: markdown / asciidoc (functions/md_parse.py)
and genuine OOXML containers (functions/ooxml.py) — the A5 fidelity path
(VERDICT r1 next-step #1)."""

import io
import zipfile

from docling_api_ray.functions.md_parse import (
    markdown_structure,
    parse_asciidoc,
    parse_markdown,
)
from docling_api_ray.functions.ooxml import (
    W_NS,
    make_docx,
    make_pptx,
    read_docx,
    read_pptx,
)
from docling_api_ray.stages.convert import ConvertActor
from docling_api_ray.config import PipelineConfig

MD_DOC = """# Title

First paragraph with
a soft line break.

## Section one

| a | b |
| --- | --- |
| 1 | 2 |

![alt text](image.png)

```python

code with a blank line above stays one block
```

Last paragraph."""


def test_markdown_block_kinds():
    items = parse_markdown(MD_DOC)
    kinds = [(i.kind, i.has_image) for i in items]
    assert kinds == [
        ("text", False),   # title heading
        ("text", False),   # paragraph (2 source lines, ONE block)
        ("text", False),   # section heading
        ("table", True),
        ("picture", True),
        ("text", False),   # fenced code incl. interior blank line
        ("text", False),   # last paragraph
    ]
    assert items[1].text == "First paragraph with\na soft line break."
    assert items[3].text.startswith("| a | b |")
    assert "blank line above" in items[5].text


def test_markdown_structure_census():
    c = markdown_structure(MD_DOC)
    assert c == {
        "n_headings": 2,
        "n_paragraphs": 2,
        "n_tables": 1,
        "n_images": 1,
        "n_code_blocks": 1,
    }
    assert markdown_structure("") == {
        "n_headings": 0,
        "n_paragraphs": 0,
        "n_tables": 0,
        "n_images": 0,
        "n_code_blocks": 0,
    }


ADOC_DOC = """= Title

a paragraph
over two lines

|===
| col
| cell
|===

image::figure.png[]

closing words"""


def test_asciidoc_items():
    items = parse_asciidoc(ADOC_DOC)
    kinds = [i.kind for i in items]
    assert kinds == ["text", "text", "table", "picture", "text"]
    # tables normalize to pipe-table markdown like every other reader
    assert items[2].text == "| col |\n| --- |\n| cell |"


def test_asciidoc_unterminated_table_is_text():
    items = parse_asciidoc("|===\n| dangling")
    assert [i.kind for i in items] == ["text"]


def test_docx_roundtrip():
    blocks = [
        ("text", "hello world"),
        ("table", "| col |\n| --- |\n| cell |"),
        ("picture", ""),
        ("text", "goodbye"),
    ]
    items = read_docx(make_docx(blocks))
    assert [(i.kind, i.text) for i in items] == [
        ("text", "hello world"),
        ("table", "| col |\n| --- |\n| cell |"),
        ("picture", ""),
        ("text", "goodbye"),
    ]


def test_pptx_roundtrip_and_slide_order():
    blocks = [("text", "slide text"), ("table", "| c |\n| --- |\n| v |"),
              ("picture", "")]
    items = read_pptx(make_pptx(blocks))
    assert [i.kind for i in items] == ["text", "table", "picture"]
    assert items[0].text == "slide text"


def test_foreign_docx_extracts():
    """A docx NOT built by our writer: deflate compression, extra parts,
    split runs, hyperlinks, sectPr noise — the shape python-docx/Word
    emit.  Must still extract the paragraph stream in order."""
    doc = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<w:document xmlns:w="{W_NS}" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        "<w:body>"
        '<w:p><w:pPr><w:pStyle w:val="Heading1"/></w:pPr>'
        "<w:r><w:t>Split </w:t></w:r><w:r><w:t>across runs</w:t></w:r></w:p>"
        '<w:p><w:hyperlink r:id="rId9"><w:r><w:t>linked text</w:t></w:r>'
        "</w:hyperlink></w:p>"
        "<w:p><w:r><w:drawing><w:inline/></w:drawing></w:r></w:p>"
        "<w:tbl><w:tblPr/><w:tr><w:tc><w:p><w:r><w:t>cellA</w:t></w:r></w:p>"
        "</w:tc><w:tc><w:p><w:r><w:t>cellB</w:t></w:r></w:p></w:tc></w:tr></w:tbl>"
        "<w:sectPr><w:pgSz/></w:sectPr>"
        "</w:body></w:document>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", "<Types/>")
        zf.writestr("docProps/core.xml", "<coreProperties/>")
        zf.writestr("word/styles.xml", "<styles/>")
        zf.writestr("word/document.xml", doc)
    items = read_docx(buf.getvalue())
    assert [(i.kind, i.text) for i in items] == [
        ("text", "Split across runs"),
        ("text", "linked text"),
        ("picture", ""),
        ("table", "| cellA | cellB |\n| --- | --- |"),
    ]


def test_convert_actor_genuine_docx_end_to_end():
    """VERDICT r1: 'a genuine DOCX goes through _convert_ooxml as garbage
    text' — no longer: the real zip path extracts structure."""
    payload = make_docx([("text", "real container"), ("picture", "")])
    actor = ConvertActor(PipelineConfig(extract_tables_as_images=True))
    spans, media, md, err = actor.convert_row(payload, "docx")
    assert err == ""
    assert [s["kind"] for s in spans] == ["text", "picture"]
    assert spans[0]["text"] == "real container"
    assert media[0]["filename"] == "picture-1.png"


def test_convert_actor_zip_without_ooxml_part_errors():
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("random.txt", "not ooxml")
    actor = ConvertActor(PipelineConfig())
    spans, media, md, err = actor.convert_row(buf.getvalue(), "docx")
    assert "no ooxml document part" in err


# ---------------------------------------------------------------------------
# property tests
# ---------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st

_WORD = st.text(alphabet="abcdefghij", min_size=1, max_size=8)
_PARA = st.lists(_WORD, min_size=1, max_size=6).map(" ".join)


@settings(max_examples=60, deadline=None)
@given(st.lists(_PARA, min_size=0, max_size=8))
def test_markdown_paragraph_roundtrip(paras):
    """Plain paragraphs joined by blank lines parse back to exactly one
    text item per paragraph with the original text."""
    items = parse_markdown("\n\n".join(paras))
    assert [i.text for i in items] == paras
    assert all(i.kind == "text" for i in items)


@settings(max_examples=60, deadline=None)
@given(st.lists(_PARA, min_size=1, max_size=5), st.integers(0, 4))
def test_markdown_census_consistency(paras, n_tables):
    """Census equals the parse's own block kinds whatever the mix."""
    blocks = list(paras) + ["| a |\n| --- |\n| b |"] * n_tables
    text = "\n\n".join(blocks)
    c = markdown_structure(text)
    items = parse_markdown(text)
    assert c["n_tables"] == sum(1 for i in items if i.kind == "table") == n_tables
    assert c["n_paragraphs"] + c["n_headings"] + c["n_code_blocks"] == sum(
        1 for i in items if i.kind == "text"
    )
