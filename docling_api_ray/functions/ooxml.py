"""Real OOXML (DOCX/PPTX) container readers + deterministic writers
(SURVEY.md §2.3 A5).

The reference delegates DOCX/PPTX to docling's python-docx / python-pptx
backends (poetry.lock:2183, 2223).  Neither library is in this sandbox,
but the container format is just zip + XML, both stdlib: the readers here
open the REAL zip, parse the main document part with ElementTree, and
walk body children in document order — paragraphs (``w:p`` / ``a:p``
runs), tables (``w:tbl`` / ``a:tbl``), embedded drawings/pictures
(``w:drawing`` / ``p:pic``) — yielding the same reading-order ``Item``
stream docling's ``iterate_items()`` provides (service.py:48).

The writers build minimal but GENUINE containers ([Content_Types].xml +
rels + main part, real zip central directory, fixed timestamps for
byte-determinism) so the synthetic corpus exercises the real parse path
end-to-end, and any real-world docx/pptx built by Word/python-docx parses
through the same reader.
"""

from __future__ import annotations

import io
import re
import zipfile
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape

from docling_api_ray.functions.spans import Item

W_NS = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
A_NS = "http://schemas.openxmlformats.org/drawingml/2006/main"
P_NS = "http://schemas.openxmlformats.org/presentationml/2006/main"

_FIXED_DATE = (1980, 1, 1, 0, 0, 0)  # deterministic zip headers

_CONTENT_TYPES_DOCX = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
    '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/word/document.xml" ContentType="application/vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml"/>'
    "</Types>"
)
_RELS_DOCX = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="word/document.xml"/>'
    "</Relationships>"
)
_CONTENT_TYPES_PPTX = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
    '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/ppt/presentation.xml" ContentType="application/vnd.openxmlformats-officedocument.presentationml.presentation.main+xml"/>'
    '<Override PartName="/ppt/slides/slide1.xml" ContentType="application/vnd.openxmlformats-officedocument.presentationml.slide+xml"/>'
    "</Types>"
)
_RELS_PPTX = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="ppt/presentation.xml"/>'
    "</Relationships>"
)


def _zip_bytes(parts: list[tuple[str, str]]) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_STORED) as zf:
        for name, content in parts:
            zi = zipfile.ZipInfo(name, date_time=_FIXED_DATE)
            zf.writestr(zi, content)
    return buf.getvalue()


# ---------------------------------------------------------------------------
# writers — minimal genuine containers for the synthetic corpus
# ---------------------------------------------------------------------------

def _docx_block_xml(kind: str, text: str) -> str:
    if kind == "text":
        return f"<w:p><w:r><w:t>{escape(text)}</w:t></w:r></w:p>"
    if kind == "table":
        rows = "".join(
            "<w:tr>"
            + "".join(
                f"<w:tc><w:p><w:r><w:t>{escape(c)}</w:t></w:r></w:p></w:tc>"
                for c in row
            )
            + "</w:tr>"
            for row in _table_cells(text)
        )
        return f"<w:tbl>{rows}</w:tbl>"
    if kind == "picture":
        return "<w:p><w:r><w:drawing/></w:r></w:p>"
    raise ValueError(kind)


def _table_cells(md_table: str) -> list[list[str]]:
    """markdown pipe table text → cell grid (separator row dropped)."""
    grid = []
    for ln in md_table.split("\n"):
        cells = [c.strip() for c in ln.strip().strip("|").split("|")]
        if cells and all(set(c) <= {"-", ":", " "} and c for c in cells):
            continue  # the |---| separator row
        grid.append(cells)
    return grid or [[""]]


def make_docx(blocks: list[tuple[str, str]]) -> bytes:
    """[(kind, text)] → a genuine minimal .docx; kind ∈ text|table|picture."""
    body = "".join(_docx_block_xml(k, t) for k, t in blocks)
    doc = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<w:document xmlns:w="{W_NS}"><w:body>{body}</w:body></w:document>'
    )
    return _zip_bytes(
        [
            ("[Content_Types].xml", _CONTENT_TYPES_DOCX),
            ("_rels/.rels", _RELS_DOCX),
            ("word/document.xml", doc),
        ]
    )


def _pptx_block_xml(kind: str, text: str) -> str:
    if kind == "text":
        return (
            f'<p:sp><p:txBody xmlns:a="{A_NS}">'
            f"<a:p><a:r><a:t>{escape(text)}</a:t></a:r></a:p>"
            "</p:txBody></p:sp>"
        )
    if kind == "table":
        rows = "".join(
            "<a:tr>"
            + "".join(
                f"<a:tc><a:txBody><a:p><a:r><a:t>{escape(c)}</a:t></a:r></a:p></a:txBody></a:tc>"
                for c in row
            )
            + "</a:tr>"
            for row in _table_cells(text)
        )
        return (
            f'<p:graphicFrame xmlns:a="{A_NS}"><a:graphic><a:graphicData>'
            f"<a:tbl>{rows}</a:tbl>"
            "</a:graphicData></a:graphic></p:graphicFrame>"
        )
    if kind == "picture":
        return "<p:pic/>"
    raise ValueError(kind)


def make_pptx(blocks: list[tuple[str, str]]) -> bytes:
    """[(kind, text)] → a genuine minimal .pptx (one slide, one shape per
    block so spTree child order IS reading order)."""
    shapes = "".join(_pptx_block_xml(k, t) for k, t in blocks)
    slide = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<p:sld xmlns:p="{P_NS}"><p:cSld><p:spTree>{shapes}</p:spTree></p:cSld></p:sld>'
    )
    pres = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<p:presentation xmlns:p="{P_NS}"/>'
    )
    return _zip_bytes(
        [
            ("[Content_Types].xml", _CONTENT_TYPES_PPTX),
            ("_rels/.rels", _RELS_PPTX),
            ("ppt/presentation.xml", pres),
            ("ppt/slides/slide1.xml", slide),
        ]
    )


# ---------------------------------------------------------------------------
# readers — real container parse, document-order item stream
# ---------------------------------------------------------------------------

def _grid_to_markdown(grid: list[list[str]]) -> str:
    """cell grid → pipe-table markdown (reader output normal form; the
    reference serializes tables into the markdown stream the same way)."""
    if not grid:
        return ""
    lines = ["| " + " | ".join(grid[0]) + " |"]
    lines.append("| " + " | ".join("---" for _ in grid[0]) + " |")
    for row in grid[1:]:
        lines.append("| " + " | ".join(row) + " |")
    return "\n".join(lines)


def read_docx(payload: bytes) -> list[Item]:
    """Genuine .docx → items: body children walked in document order."""
    with zipfile.ZipFile(io.BytesIO(payload)) as zf:
        xml = zf.read("word/document.xml")
    root = ET.fromstring(xml)
    body = root.find(f"{{{W_NS}}}body")
    if body is None:
        return []
    items: list[Item] = []
    for child in body:
        tag = child.tag
        if tag == f"{{{W_NS}}}p":
            if child.find(f".//{{{W_NS}}}drawing") is not None:
                items.append(Item("picture", "", True))
                continue
            text = "".join(
                t.text or "" for t in child.iter(f"{{{W_NS}}}t")
            )
            if text:
                items.append(Item("text", text))
        elif tag == f"{{{W_NS}}}tbl":
            grid = [
                [
                    "".join(t.text or "" for t in tc.iter(f"{{{W_NS}}}t"))
                    for tc in tr.findall(f"{{{W_NS}}}tc")
                ]
                for tr in child.findall(f"{{{W_NS}}}tr")
            ]
            items.append(Item("table", _grid_to_markdown(grid), True))
    return items


def read_pptx(payload: bytes) -> list[Item]:
    """Genuine .pptx → items: slides in number order, shape-tree children
    in document order; one text item per ``a:p`` paragraph."""
    with zipfile.ZipFile(io.BytesIO(payload)) as zf:
        # numeric slide index, not lexicographic — slide10.xml must sort
        # after slide2.xml on 10+-slide decks (ADVICE r2)
        slide_names = sorted(
            (
                n
                for n in zf.namelist()
                if re.fullmatch(r"ppt/slides/slide\d+\.xml", n)
            ),
            key=lambda n: int(re.search(r"slide(\d+)\.xml$", n).group(1)),
        )
        items: list[Item] = []
        for name in slide_names:
            root = ET.fromstring(zf.read(name))
            tree = root.find(f".//{{{P_NS}}}spTree")
            if tree is None:
                continue
            for child in tree:
                tag = child.tag
                if tag == f"{{{P_NS}}}sp":
                    for para in child.iter(f"{{{A_NS}}}p"):
                        text = "".join(
                            t.text or "" for t in para.iter(f"{{{A_NS}}}t")
                        )
                        if text:
                            items.append(Item("text", text))
                elif tag == f"{{{P_NS}}}graphicFrame":
                    grid = [
                        [
                            "".join(
                                t.text or "" for t in tc.iter(f"{{{A_NS}}}t")
                            )
                            for tc in tr.findall(f"{{{A_NS}}}tc")
                        ]
                        for tr in child.iter(f"{{{A_NS}}}tr")
                    ]
                    if grid:
                        items.append(
                            Item("table", _grid_to_markdown(grid), True)
                        )
                elif tag == f"{{{P_NS}}}pic":
                    items.append(Item("picture", "", True))
    return items
