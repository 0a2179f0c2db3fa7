"""Format sniffing (M1-M4) vs the reference's utils.py:60-105 semantics."""

import pyarrow as pa
import pytest

from docling_api_ray.functions.sniff import (
    classify_format,
    detect_html_xhtml,
    guess_format_row,
    is_file_format_supported,
)

CASES = [
    # (payload, filename, expected format)
    (b"%PDF-1.4\nhello", "a.bin", "pdf"),  # magic wins over extension
    (b"%PDF-1.4\nhello", "a.pdf", "pdf"),
    (b"\x89PNG\r\n\x1a\nxx", "a.dat", "image"),
    (b"\xff\xd8\xff\xe0JFIF", "photo", "image"),
    (b"II*\x00rest", "t", "image"),
    (b"MM\x00*rest", "t", "image"),
    (b"GIF89a", "t", "image"),
    (b"BMxxxx", "t", "image"),
    (b"PK\x03\x04word/stuff", "a.zip", "docx"),
    (b"PK\x03\x04ppt/stuff", "a.zip", "pptx"),
    (b"PK\x03\x04other/stuff", "a.zip", None),  # plain zip unsupported
    (b"PK\x03\x04other/stuff", "a.html", "html"),  # zip undetected → ext fallback
    (b"plain text", "doc.md", "md"),
    (b"plain text", "doc.adoc", "asciidoc"),
    (b"plain text", "doc.asc", "asciidoc"),
    (b"plain text", "doc.htm", "html"),
    (b"plain text", "doc.xhtml", "html"),
    # extension fallback does NOT honor pdf/docx/image exts (utils.py:92-101)
    (b"plain text", "doc.docx", None),
    (b"plain text", "doc.txt", None),
    # leading-dot filename has no extension (utils.py:84)
    (b"plain text", ".md", None),
    (b"plain text", "no_extension", None),
    # extensions are case-sensitive like the reference (no .lower() at
    # utils.py:84; FormatToExtensions entries are lowercase)
    (b"plain text", "FILE.HTML", None),
    (b"plain text", "doc.MD", None),
    # HTML content heuristics (utils.py:60-73)
    (b"<!DOCTYPE html><html></html>", "f.bin", "html"),
    (b"<!doctype  html>", "f", "html"),
    (b"  \n <html><body>x</body>", "f", "html"),
    (b"<head><title>t</title>", "f", "html"),
    (b"<body>x", "f", "html"),
    (b"<header>x", "f", "html"),  # re.match '<head' prefix quirk
    (b"<!-- c --><html>", "f", "html"),  # comment stripped first
    (b'<?xml version="1.0"?><html xmlns="http://www.w3.org/1999/xhtml">', "f", "html"),
    (b'<?xml version="1.0"?><root/>', "f", None),  # xml but not xhtml
    (b"<div>not a prefix match</div>", "f", None),
    (b"just words", "f.bin", None),
    (b"", "empty.pdf", None),  # no magic, pdf ext not in fallback
]


@pytest.mark.parametrize("payload,filename,expected", CASES)
def test_guess_format_row(payload, filename, expected):
    assert guess_format_row(payload, filename) == expected


def test_classify_format_batch_matches_rowwise():
    tbl = pa.table(
        {
            "doc_id": [str(i) for i in range(len(CASES))],
            "filename": [c[1] for c in CASES],
            "payload": pa.array([c[0] for c in CASES], type=pa.binary()),
        }
    )
    out = classify_format(tbl)
    assert out["format"].to_pylist() == [c[2] for c in CASES]


def test_detect_html_xhtml_comment_strip_multiline():
    content = b"<!-- line1\nline2 -->\n<!doctype html>"
    assert detect_html_xhtml(content) == "html"


def test_support_predicate():
    assert is_file_format_supported(b"%PDF-1.4", "x")
    assert not is_file_format_supported(b"random", "x.bin")


def test_leading_comment_crossing_sniff_window():
    # a >4KiB license-banner comment before <html>: the reference strips
    # comments over full content; the bounded window must retry unwindowed
    payload = b"<!-- " + b"x" * 5000 + b" -->\n<html><body>hi</body></html>"
    assert guess_format_row(payload, "f.bin") == "html"
    tbl = pa.table(
        {
            "doc_id": ["1"],
            "filename": ["f.bin"],
            "payload": pa.array([payload], type=pa.binary()),
        }
    )
    assert classify_format(tbl)["format"].to_pylist() == ["html"]


def test_unterminated_comment_is_unsupported():
    payload = b"<!-- never closed " + b"y" * 5000
    assert guess_format_row(payload, "f.bin") is None


def test_comment_opener_split_at_window_boundary():
    # window ends exactly inside '<!-' — must still retry full content
    payload = b" " * 4093 + b"<!-- banner --><html><body>hi</body></html>"
    assert guess_format_row(payload, "f.bin") == "html"
