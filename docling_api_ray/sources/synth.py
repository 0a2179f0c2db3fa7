"""Deterministic raw-document synthesis shared by fixtures, the driver
conformance queries and the bench corpus.

The driver's testdata ``documents`` table is ``(doc_id:int64, text, lang,
source, n_chars)`` (TESTDATA.md).  To exercise the conversion engine the
way the reference receives uploads (route.py:25-38: filename + payload
bytes), each row is deterministically expanded into a raw binary document
whose *format class* is ``doc_id % 10``:

==== ========== =============================================== ==========
 cls  filename   payload                                         format
==== ========== =============================================== ==========
  0   .pdf       ``%PDF-1.4\n`` + body                           pdf
  1   .docx      ``PK\x03\x04`` + ``word/\n`` + body             docx
  2   .pptx      ``PK\x03\x04`` + ``ppt/\n`` + body              pptx
  3   .data      full HTML page (content-sniffed, no extension)  html
  4   .data      XHTML page (``<?xml`` + xhtml)                  html
  5   .png       PNG magic + body (OCR-stub input)               image
  6   .md        body                                            md
  7   .adoc      body                                            asciidoc
  8   .txt       body (text/plain fallback)                      None
  9   .bin       ``\x00\xff`` + body                             None
==== ========== =============================================== ==========

Poison override (error-channel fixture F5): rows with ``doc_id % 97 == 0``
become a corrupt PDF (``[[CORRUPT]]`` body marker) regardless of class —
the convert stage must surface ``error`` rows without failing the block
(raises_on_error=False semantics, service.py:80,103).

Body layout (parsed back by the convert stage): '\n'-separated lines;
text lines are chunks of WORDS_PER_SPAN words; media marker lines
``[[TABLE]]`` / ``[[PICTURE]]`` are interleaved after every second text
line when ``doc_id % 3 == 0``, alternating table→picture.  All of this
arithmetic is mirrored by the DuckDB oracle SQL in ``__ray_entry__``.
"""

from __future__ import annotations

import math

WORDS_PER_SPAN = 8
HTML_WORDS_PER_PARA = 12
MEDIA_EVERY_N_TEXT = 2
MEDIA_DOC_MOD = 3
POISON_MOD = 97
TABLE_MD = "| col |\n| --- |\n| cell |"

FORMAT_OF_CLASS = [
    "pdf", "docx", "pptx", "html", "html", "image", "md", "asciidoc", None, None,
]
_EXT_OF_CLASS = [
    "pdf", "docx", "pptx", "data", "data", "png", "md", "adoc", "txt", "bin",
]


def chunk_words(text: str, n: int) -> list[str]:
    """Split a single-space-separated text into lines of n words."""
    if not text:
        return []
    words = text.split(" ")
    return [" ".join(words[i : i + n]) for i in range(0, len(words), n)]


def make_blocks(doc_id: int, text: str) -> list[tuple[str, str]]:
    """The document's reading-order block sequence [(kind, text)]: text
    chunks interleaved with deterministic media blocks (a table / picture
    after every MEDIA_EVERY_N_TEXT chunks, alternating, for docs with
    doc_id % MEDIA_DOC_MOD == 0).  Every payload class renders this SAME
    sequence — marker lines for the opaque stand-in formats, real
    markdown / asciidoc / OOXML XML for the structurally parsed ones — so
    the span arithmetic in the oracles is format-independent."""
    chunks = chunk_words(text, WORDS_PER_SPAN)
    blocks: list[tuple[str, str]] = []
    media_idx = 0
    with_media = doc_id % MEDIA_DOC_MOD == 0
    for i, chunk in enumerate(chunks, start=1):
        blocks.append(("text", chunk))
        if with_media and i % MEDIA_EVERY_N_TEXT == 0:
            blocks.append(
                ("table", TABLE_MD) if media_idx % 2 == 0 else ("picture", "")
            )
            media_idx += 1
    return blocks


def make_body(doc_id: int, text: str) -> str:
    """Marker-line rendering of the block sequence (opaque stand-in
    formats: pdf body text, OCR-stub image payloads)."""
    out: list[str] = []
    for kind, chunk in make_blocks(doc_id, text):
        if kind == "text":
            out.append(chunk)
        elif kind == "table":
            out.append("[[TABLE]]")
        else:
            out.append("[[PICTURE]]")
    return "\n".join(out)


def make_markdown_body(doc_id: int, text: str) -> str:
    """REAL markdown rendering: blank-line separated paragraphs, pipe
    tables, image references — parsed back structurally by
    functions/md_parse.parse_markdown into the same item sequence."""
    out: list[str] = []
    for kind, chunk in make_blocks(doc_id, text):
        if kind == "text":
            out.append(chunk)
        elif kind == "table":
            out.append(TABLE_MD)
        else:
            out.append("![](img.png)")
    return "\n\n".join(out)


def make_asciidoc_body(doc_id: int, text: str) -> str:
    """REAL asciidoc rendering: paragraphs, ``|===`` tables,
    ``image::`` macros — parsed by functions/md_parse.parse_asciidoc."""
    out: list[str] = []
    for kind, chunk in make_blocks(doc_id, text):
        if kind == "text":
            out.append(chunk)
        elif kind == "table":
            out.append("|===\n| col\n| cell\n|===")
        else:
            out.append("image::img.png[]")
    return "\n\n".join(out)


def make_html_page(text: str, *, xhtml: bool = False) -> str:
    """A full page whose main content round-trips to ``text`` exactly:
    paragraphs of HTML_WORDS_PER_PARA words inside <main>, wrapped in
    boilerplate (link-dense nav/footer/aside, script/style) that the M11
    extractor must strip."""
    paras = "".join(
        f"<p>{c}</p>" for c in chunk_words(text, HTML_WORDS_PER_PARA)
    )
    nav = (
        '<nav><a href="/">home</a> <a href="/a">alpha</a> '
        '<a href="/b">beta</a></nav>'
    )
    aside = (
        '<aside>related: <a href="/x">one link</a> <a href="/y">two link</a> '
        '<a href="/z">three link</a></aside>'
    )
    footer = (
        '<footer>copyright 2024 <a href="/tos">terms</a> '
        '<a href="/privacy">privacy</a></footer>'
    )
    script = "<script>var t = 1 + 2;</script>"
    style = "<style>p { color: black; }</style>"
    head = f"<head><title>doc</title>{style}</head>"
    body = f"<body>{nav}{aside}<main>{paras}</main>{footer}{script}</body>"
    if xhtml:
        return (
            '<?xml version="1.0" encoding="utf-8"?>\n'
            "<!-- xhtml document -->\n"
            '<html xmlns="http://www.w3.org/1999/xhtml">'
            f"{head}{body}</html>"
        )
    return f"<!DOCTYPE html>\n<html>{head}{body}</html>"


def make_structured_markdown(text: str) -> str:
    """A richly structured REAL markdown document derived from a text row
    (md_structure query fixture): title + section headings, pipe tables
    and image refs on fixed cadences whose counts the DuckDB oracle
    mirrors arithmetically — paragraph i (0-based, P total): an ``##``
    heading before every 4th (i>0), a table after every 3rd (i%3==2), an
    image after every 5th (i%5==4), plus one ``#`` title."""
    paras = chunk_words(text, WORDS_PER_SPAN)
    out: list[str] = []
    if paras:
        out.append("# title")
    for i, p in enumerate(paras):
        if i > 0 and i % 4 == 0:
            out.append(f"## section {i // 4}")
        out.append(p)
        if i % 3 == 2:
            out.append(TABLE_MD)
        if i % 5 == 4:
            out.append("![](fig.png)")
    return "\n\n".join(out)


def make_raw_document(doc_id: int, text: str) -> tuple[str, bytes]:
    """(filename, payload) for one driver-table row; deterministic.

    docx/pptx are GENUINE zip containers (functions/ooxml.py writers) and
    md/asciidoc GENUINE markup — all four parse through the real
    structural readers; pdf/image payloads keep the marker-line stand-in
    layout (their real decoders are the documented sandbox stub
    boundary, SURVEY.md §7)."""
    from docling_api_ray.functions.ooxml import make_docx, make_pptx

    cls = doc_id % 10
    filename = f"doc-{doc_id}.{_EXT_OF_CLASS[cls]}"
    if doc_id % POISON_MOD == 0:
        return f"doc-{doc_id}.pdf", b"%PDF-1.4\n[[CORRUPT]]"
    if cls == 0:
        payload = b"%PDF-1.4\n" + make_body(doc_id, text).encode()
    elif cls == 1:
        payload = make_docx(make_blocks(doc_id, text))
    elif cls == 2:
        payload = make_pptx(make_blocks(doc_id, text))
    elif cls == 3:
        payload = make_html_page(text).encode()
    elif cls == 4:
        payload = make_html_page(text, xhtml=True).encode()
    elif cls == 5:
        payload = b"\x89PNG\r\n\x1a\n" + make_body(doc_id, text).encode()
    elif cls == 6:
        payload = make_markdown_body(doc_id, text).encode()
    elif cls == 7:
        payload = make_asciidoc_body(doc_id, text).encode()
    elif cls == 8:
        payload = make_body(doc_id, text).encode()
    else:
        payload = b"\x00\xff" + make_body(doc_id, text).encode()
    return filename, payload


# ---------------------------------------------------------------------------
# expected-value arithmetic (the python side of the DuckDB oracle; used by
# tests to cross-check both)
# ---------------------------------------------------------------------------

def expected_counts(doc_id: int, text: str) -> dict:
    """Expected span accounting for one derived raw document after the full
    convert pipeline (classify → convert → assemble)."""
    cls = doc_id % 10
    if doc_id % POISON_MOD == 0:
        return {
            "doc_id": doc_id,
            "format": "pdf",
            "n_spans": 0,
            "n_text": 0,
            "n_tables": 0,
            "n_pictures": 0,
            "last_media_ref": "",
            "error": "corrupt document",
        }
    fmt = FORMAT_OF_CLASS[cls]
    if fmt is None:
        return {
            "doc_id": doc_id,
            "format": "",
            "n_spans": 0,
            "n_text": 0,
            "n_tables": 0,
            "n_pictures": 0,
            "last_media_ref": "",
            "error": "unsupported format",
        }
    if fmt == "html":
        n_text = math.ceil(len(text.split(" ")) / HTML_WORDS_PER_PARA) if text else 0
        n_media = 0
    else:
        n_text = math.ceil(len(text.split(" ")) / WORDS_PER_SPAN) if text else 0
        n_media = (n_text // MEDIA_EVERY_N_TEXT) if doc_id % MEDIA_DOC_MOD == 0 else 0
    n_tables = (n_media + 1) // 2
    n_pictures = n_media // 2
    if n_media == 0:
        last = ""
    elif n_media % 2 == 1:
        last = f"table-{(n_media + 1) // 2}.png"
    else:
        last = f"picture-{n_media // 2}.png"
    return {
        "doc_id": doc_id,
        "format": fmt,
        "n_spans": n_text + n_media,
        "n_text": n_text,
        "n_tables": n_tables,
        "n_pictures": n_pictures,
        "last_media_ref": last,
        "error": "",
    }
