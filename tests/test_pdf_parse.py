"""Programmatic-PDF text extraction over genuine, spec-conformant PDFs.

The fixtures are built the way real writers emit them — classic xref
table + FlateDecode'd content streams (the pdflatex/reportlab shape) and
PDF-1.5 cross-reference-stream + ObjStm layout (the modern
word-processor shape) — NOT the synthetic marker-line corpus, which has
its own fallback path.
"""

import zlib

import pyarrow as pa

from docling_api_ray.functions.pdf_parse import (
    PdfDocument,
    PdfParseError,
    extract_page_text,
    extract_text_lines,
)
from docling_api_ray.stages.convert import ConvertActor


# ---------------------------------------------------------------------------
# fixture writers (append objects with a real xref table, like pdflatex)
# ---------------------------------------------------------------------------

def _build_pdf(objects: dict[int, bytes], root_num: int) -> bytes:
    """Assemble numbered objects into a classic-xref PDF file."""
    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = {}
    for num in sorted(objects):
        offsets[num] = len(out)
        out += b"%d 0 obj\n" % num + objects[num] + b"\nendobj\n"
    xref_pos = len(out)
    maxnum = max(objects)
    out += b"xref\n0 %d\n" % (maxnum + 1)
    out += b"0000000000 65535 f \n"
    for num in range(1, maxnum + 1):
        if num in offsets:
            out += b"%010d 00000 n \n" % offsets[num]
        else:
            out += b"0000000000 65535 f \n"
    out += (
        b"trailer\n<< /Size %d /Root %d 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (maxnum + 1, root_num, xref_pos)
    )
    return bytes(out)


def _stream(dict_body: bytes, content: bytes, compress: bool = True) -> bytes:
    data = zlib.compress(content) if compress else content
    filt = b" /Filter /FlateDecode" if compress else b""
    return (
        b"<< %s /Length %d%s >>\nstream\n" % (dict_body, len(data), filt)
        + data
        + b"\nendstream"
    )


def _writer_style_pdf() -> bytes:
    """Two pages, compressed content, TJ kerning arrays, escapes, hex
    strings, an indirect /Length — the common real-writer feature set."""
    page1 = (
        b"BT /F1 12 Tf 72 720 Td (Hello, world!) Tj "
        b"0 -14 Td [(Kerned ) -120 (te) 3 (xt line)] TJ "
        b"T* (Escapes: \\(parens\\) \\\\ and \\101\\102\\103) Tj ET\n"
        b"0.5 w 72 100 m 200 100 l S\n"  # non-text ops ignored
        b"BT 72 600 Td <48657820737472696E67> Tj ET"
    )
    page2 = b"BT 72 720 Td (Page two, line one) Tj 0 -14 TD (line two) Tj ET"
    objects = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R 5 0 R] /Count 2 >>",
        3: b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
           b"/Contents 4 0 R /Resources << /Font << /F1 7 0 R >> >> >>",
        4: _stream(b"", page1),
        5: b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
           b"/Contents 6 0 R >>",
        # indirect /Length — pdflatex emits these
        6: b"<< /Length 8 0 R >>\nstream\n" + page2 + b"\nendstream",
        7: b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
        8: b"%d" % len(page2),
    }
    return _build_pdf(objects, root_num=1)


def _objstm_pdf() -> bytes:
    """PDF-1.5 shape: catalog/pages/page dicts packed in an ObjStm, an
    xref STREAM (not table) as the only cross-reference — the layout
    modern writers (Word, LibreOffice, Chrome print-to-PDF) emit."""
    content = b"BT 72 720 Td (ObjStm text extracted) Tj ET"
    content_z = zlib.compress(content)
    # objects 1 (catalog), 2 (pages), 3 (page) packed into ObjStm #5
    packed_objs = [
        (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        (2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
        (3, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Contents 4 0 R >>"),
    ]
    body = b""
    header = b""
    for num, objbytes in packed_objs:
        header += b"%d %d " % (num, len(body))
        body += objbytes + b" "
    objstm_content = header + body
    objstm_z = zlib.compress(objstm_content)

    out = bytearray(b"%PDF-1.5\n%\xe2\xe3\xcf\xd3\n")
    offsets = {}

    def add(num: int, payload: bytes) -> None:
        offsets[num] = len(out)
        out.extend(b"%d 0 obj\n" % num + payload + b"\nendobj\n")

    add(4, b"<< /Length %d /Filter /FlateDecode >>\nstream\n" % len(content_z)
           + content_z + b"\nendstream")
    add(5, b"<< /Type /ObjStm /N %d /First %d /Length %d "
           b"/Filter /FlateDecode >>\nstream\n"
           % (len(packed_objs), len(header), len(objstm_z))
           + objstm_z + b"\nendstream")
    # xref stream object (6): W [1 2 1]; entries for objects 0..6
    xref_pos = len(out)
    rows = [
        b"\x00\x00\x00\x00",                       # 0: free
        b"\x02" + (5).to_bytes(2, "big") + b"\x00",  # 1: in ObjStm 5, idx 0
        b"\x02" + (5).to_bytes(2, "big") + b"\x01",  # 2: in ObjStm 5, idx 1
        b"\x02" + (5).to_bytes(2, "big") + b"\x02",  # 3: in ObjStm 5, idx 2
        b"\x01" + offsets[4].to_bytes(2, "big") + b"\x00",
        b"\x01" + offsets[5].to_bytes(2, "big") + b"\x00",
        b"\x01" + xref_pos.to_bytes(2, "big") + b"\x00",
    ]
    xref_data = zlib.compress(b"".join(rows))
    add(6, b"<< /Type /XRef /Size 7 /W [1 2 1] /Root 1 0 R "
           b"/Filter /FlateDecode /Length %d >>\nstream\n" % len(xref_data)
           + xref_data + b"\nendstream")
    out.extend(b"startxref\n%d\n%%%%EOF\n" % xref_pos)
    return bytes(out)


# ---------------------------------------------------------------------------
# parser-level tests
# ---------------------------------------------------------------------------

def test_writer_style_pdf_pages_and_text():
    pdf = _writer_style_pdf()
    pages = extract_text_lines(pdf)
    assert len(pages) == 2
    assert pages[0] == [
        "Hello, world!",
        "Kerned text line",
        "Escapes: (parens) \\ and ABC",
        "Hex string",
    ]
    assert pages[1] == ["Page two, line one", "line two"]


def test_objstm_xref_stream_pdf():
    pages = extract_text_lines(_objstm_pdf())
    assert pages == [["ObjStm text extracted"]]


def test_uncompressed_and_asciihex_streams():
    content = b"BT (plain stream) Tj ET"
    hex_content = b"BT (hex stream) Tj ET".hex().encode() + b">"
    objects = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R 5 0 R] /Count 2 >>",
        3: b"<< /Type /Page /Contents 4 0 R >>",
        4: _stream(b"", content, compress=False),
        5: b"<< /Type /Page /Contents 6 0 R >>",
        6: b"<< /Length %d /Filter /ASCIIHexDecode >>\nstream\n"
           % len(hex_content) + hex_content + b"\nendstream",
    }
    pages = extract_text_lines(_build_pdf(objects, 1))
    assert pages == [["plain stream"], ["hex stream"]]


def test_contents_array_concatenates_in_order():
    objects = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: b"<< /Type /Page /Contents [4 0 R 5 0 R] >>",
        4: _stream(b"", b"BT (first part) Tj"),  # BT spans the joint
        5: _stream(b"", b" 0 -14 Td (second part) Tj ET"),
    }
    pages = extract_text_lines(_build_pdf(objects, 1))
    assert pages == [["first part", "second part"]]


def test_utf16_and_octal_strings():
    txt = "café — déjà"
    utf16 = b"\xfe\xff" + txt.encode("utf-16-be")
    content = b"BT <" + utf16.hex().encode() + b"> Tj ET"
    objects = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: b"<< /Type /Page /Contents 4 0 R >>",
        4: _stream(b"", content),
    }
    assert extract_text_lines(_build_pdf(objects, 1)) == [[txt]]


def test_corrupt_pdf_raises_cleanly():
    try:
        extract_text_lines(b"%PDF-1.4\n1 0 obj\n<< /broken")
    except PdfParseError:
        pass
    else:
        raise AssertionError("expected PdfParseError")


def test_inline_image_skipped():
    content = (
        b"BT (before) Tj ET\n"
        b"BI /W 2 /H 2 /CS /RGB /BPC 8 ID \x00\x01\x02\x03\x04\x05 EI\n"
        b"BT (after) Tj ET"
    )
    objects = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: b"<< /Type /Page /Contents 4 0 R >>",
        4: _stream(b"", content),
    }
    assert extract_text_lines(_build_pdf(objects, 1)) == [["before", "after"]]


def test_incremental_update_later_object_wins():
    base = _writer_style_pdf()
    # append a replacement for page 2's content (real incremental-save
    # layout: new object + new xref + trailer with /Prev)
    newc = b"BT (REVISED second page) Tj ET"
    tail = bytearray()
    off = len(base)
    tail += b"6 0 obj\n" + _stream(b"", newc) + b"\nendobj\n"
    xref_pos = len(base) + len(tail)
    tail += (
        b"xref\n6 1\n%010d 00000 n \ntrailer\n"
        b"<< /Size 9 /Root 1 0 R /Prev 0 >>\nstartxref\n%d\n%%%%EOF\n"
        % (off, xref_pos)
    )
    pages = extract_text_lines(bytes(base + tail))
    assert pages[1] == ["REVISED second page"]


def test_page_text_empty_content():
    assert extract_page_text(b"") == []
    doc = PdfDocument(_writer_style_pdf())
    assert len(doc.pages()) == 2


# ---------------------------------------------------------------------------
# through the ConvertActor (the VERDICT r2 #3 done-bar)
# ---------------------------------------------------------------------------

def test_real_pdf_through_convert_actor():
    actor = ConvertActor()
    batch = pa.table(
        {
            "doc_id": [1, 2],
            "filename": ["real.pdf", "synth.pdf"],
            "format": ["pdf", "pdf"],
            "payload": [_writer_style_pdf(), b"%PDF-1.4\nlegacy line"],
        }
    )
    out = actor(batch)
    assert out["error"].to_pylist() == ["", ""]
    spans1 = out["spans"][0].as_py()
    texts = [s["text"] for s in spans1]
    assert texts == [
        "Hello, world!",
        "Kerned text line",
        "Escapes: (parens) \\ and ABC",
        "Hex string",
        "Page two, line one",
        "line two",
    ]
    assert all(s["kind"] == "text" for s in spans1)
    # span sequence is contiguous (north-rule span-sequence invariant)
    assert [s["offset"] for s in spans1] == list(range(len(spans1)))
    # the synthetic fallback path still works
    assert [s["text"] for s in out["spans"][1].as_py()] == ["legacy line"]


def test_corrupt_real_pdf_is_error_row():
    actor = ConvertActor()
    batch = pa.table(
        {
            "doc_id": [1],
            "filename": ["bad.pdf"],
            "format": ["pdf"],
            "payload": [b"%PDF-1.7\n1 0 obj\n<< /Type /Catalog >>\nendobj\n"],
        }
    )
    out = actor(batch)
    assert out["error"][0].as_py().startswith("corrupt pdf:")


def test_pdf_roundtrip_property():
    """Property: arbitrary text lines written through a spec-conformant
    PDF (escaped literal strings or UTF-16BE hex strings, compressed
    streams) extract back verbatim."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    def esc(s: str) -> bytes:
        return (
            s.encode("latin-1")
            .replace(b"\\", b"\\\\")
            .replace(b"(", b"\\(")
            .replace(b")", b"\\)")
        )

    latin_line = st.text(
        alphabet=st.characters(min_codepoint=0x20, max_codepoint=0xFF),
        min_size=1,
        max_size=40,
    ).filter(lambda s: s.strip())
    uni_line = st.text(min_size=1, max_size=30).filter(
        lambda s: s.strip() and "﻿" not in s
    )

    @settings(max_examples=60, deadline=None)
    @given(st.lists(latin_line, min_size=1, max_size=8), uni_line)
    def check(lines, uline):
        ops = [b"BT 72 720 Td"]
        for ln in lines:
            ops.append(b"(" + esc(ln) + b") Tj T*")
        u16 = b"\xfe\xff" + uline.encode("utf-16-be")
        ops.append(b"<" + u16.hex().encode() + b"> Tj ET")
        content = b" ".join(ops)
        objects = {
            1: b"<< /Type /Catalog /Pages 2 0 R >>",
            2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
            3: b"<< /Type /Page /Contents 4 0 R >>",
            4: _stream(b"", content),
        }
        pages = extract_text_lines(_build_pdf(objects, 1))
        # extractor collapses intra-line whitespace the way a text line
        # renders: strip + keep non-empty
        expect = [" ".join(x.split()) for x in lines if x.strip()]
        expect.append(" ".join(uline.split()))
        got = [" ".join(x.split()) for x in pages[0]]
        assert got == [e for e in expect if e]

    check()
