"""Format sniffing (SURVEY.md §2.2 M1-M4) — vectorized over Arrow batches.

Reproduces the decision order of the reference's ``guess_format``
(document_converter/utils.py:76-89): magic-byte MIME detection first
(the reference delegates to ``filetype.guess_mime``; here re-implemented
from the public magic-byte signatures), then extension fallback — which the
reference consults ONLY for asciidoc / html / md extensions
(utils.py:92-101) — then the HTML/XHTML content heuristic (utils.py:60-73),
then ``text/plain``; ``text/plain`` maps to no supported format
(utils.py:57 MimeTypeToFormat has no text/plain entry), i.e. unsupported.

The closed format universe is the reference's ``InputFormat`` enum
(utils.py:8-14): docx pptx html image pdf asciidoc md.

Engine divergence (documented in SURVEY.md §2.2 M4): the reference DROPS
unsupported uploads with HTTP 400 (route.py:31-32); the engine keeps the
row with ``format = None`` so the error channel can account for it.

This module is pure (no Ray imports): functions take/return
``pyarrow.Table`` and are called from ``stages/classify.py`` inside
``map_batches(batch_format="pyarrow")``.  Per-row work touches only a
bounded prefix of each payload (16 B magic window, 4 KiB sniff window),
so cost is O(rows), independent of payload size.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# supported formats (utils.py:8-14)
FORMATS = ("docx", "pptx", "html", "image", "pdf", "asciidoc", "md")

# extension → format, reproducing FormatToExtensions (utils.py:25-33).
# NOTE: guess_format's extension fallback consults only ASCIIDOC/HTML/MD
# (mime_from_extension, utils.py:92-101); the full map is used by the
# support predicate and by callers that want extension-only hints.
EXT_TO_FORMAT = {
    **{e: "docx" for e in ("docx", "dotx", "docm", "dotm")},
    **{e: "pptx" for e in ("pptx", "potx", "ppsx", "pptm", "potm", "ppsm")},
    "pdf": "pdf",
    "md": "md",
    **{e: "html" for e in ("html", "htm", "xhtml")},
    **{e: "image" for e in ("jpg", "jpeg", "png", "tif", "tiff", "bmp")},
    **{e: "asciidoc" for e in ("adoc", "asciidoc", "asc")},
}

# extensions the reference's fallback actually honors (utils.py:92-101)
_FALLBACK_EXTS = {
    **{e: "asciidoc" for e in ("adoc", "asciidoc", "asc")},
    **{e: "html" for e in ("html", "htm", "xhtml")},
    "md": "md",
}

_XML_COMMENT_RE = re.compile(rb"<!--(.*?)-->", re.DOTALL)
_DOCTYPE_RE = re.compile(r"<!doctype\s+html|<html|<head|<body")
_XMLDECL_RE = re.compile(r"<\?xml")

_SNIFF_WINDOW = 4096  # bytes of payload consulted for zip-member / HTML sniff


def _magic_format(prefix: bytes, window: bytes) -> str | None:
    """Magic-byte detection over a 16-byte prefix (public signatures, as
    detected by the ``filetype`` package the reference depends on).

    ``window`` (first 4 KiB) is consulted only for OOXML: a local-file
    zip header plus a ``word/`` / ``ppt/`` member path distinguishes
    docx from pptx; a zip that is neither stays undetected (-> extension
    fallback), mirroring filetype's document matchers.
    """
    if prefix.startswith(b"%PDF"):
        return "pdf"
    if prefix.startswith(b"\x89PNG\r\n\x1a\n"):
        return "image"
    if prefix.startswith(b"\xff\xd8\xff"):
        return "image"  # jpeg
    if prefix.startswith(b"II*\x00") or prefix.startswith(b"MM\x00*"):
        return "image"  # tiff
    if prefix.startswith(b"GIF8"):
        return "image"
    if prefix.startswith(b"BM"):
        return "image"  # bmp — filetype matches the bare 2-byte signature
    if prefix.startswith(b"PK\x03\x04"):
        if b"word/" in window:
            return "docx"
        if b"ppt/" in window:
            return "pptx"
        return None  # plain zip → undetected, like filetype→application/zip∉map
    return None


def _extension_of(filename: str) -> str:
    """Extension parse per utils.py:84: dot required, leading-dot names have
    no extension, last dot wins.  CASE-SENSITIVE like the reference — its
    ``rsplit``ed extension is matched verbatim against lowercase
    FormatToExtensions entries (no ``.lower()`` at utils.py:84), so
    ``FILE.HTML`` does NOT get the extension fallback."""
    if filename and "." in filename and not filename.startswith("."):
        return filename.rsplit(".", 1)[-1]
    return ""


def detect_html_xhtml(content: bytes) -> str | None:
    """Content heuristic per utils.py:60-73: ascii-decode (errors ignored),
    lowercase, strip XML comments, lstrip; ``<?xml`` + 'xhtml' in the first
    1000 chars → xhtml; a doctype/html/head/body prefix → html.

    Returns the *format* ("html") rather than the intermediate mime — both
    xhtml and html mimes map to InputFormat.HTML (utils.py:41).
    """
    s = _XML_COMMENT_RE.sub(b"", content)
    text = s.decode("ascii", errors="ignore").lower().lstrip()
    if _XMLDECL_RE.match(text):
        if "xhtml" in text[:1000]:
            return "html"
    if _DOCTYPE_RE.match(text):
        return "html"
    return None


def guess_format_row(payload: bytes, filename: str) -> str | None:
    """Single-row reference-order sniff (utils.py:76-89). Exposed for unit
    tests and the property-based oracle; the batch path below is the hot
    path."""
    window = payload[:_SNIFF_WINDOW]
    fmt = _magic_format(payload[:16], window)
    if fmt is None:
        fmt = _FALLBACK_EXTS.get(_extension_of(filename))
    if fmt is None:
        fmt = detect_html_xhtml(window)
        if fmt is None and _comment_truncated(window):
            # a leading XML comment spans past the window — the reference
            # strips comments over FULL content (utils.py:60-73); retry
            # unwindowed for this rare shape
            fmt = detect_html_xhtml(payload)
    return fmt  # None == text/plain fallback == unsupported


def _comment_truncated(window: bytes) -> bool:
    """True when the window's comment-stripped text still opens with an
    unterminated ``<!--`` — or the window ends mid-opener (``<``, ``<!``,
    ``<!-``) — the cases where the bounded window can disagree with the
    reference's full-content scan."""
    s = _XML_COMMENT_RE.sub(b"", window)
    t = s.decode("ascii", errors="ignore").lstrip()
    return t.startswith("<!--") or t in ("<", "<!", "<!-")


def classify_format(batch: pa.Table) -> pa.Table:
    """Append a ``format`` string column (null = unsupported) to a batch of
    ``(doc_id, filename, payload)`` rows.  Vectorized where Arrow kernels
    exist (prefix slicing); per-row decisions run over bounded 16B/4KiB
    views, never the full payload."""
    payloads = batch["payload"]
    # zero-copy-ish bounded views: slice only the sniff window per row
    windows = pc.binary_slice(payloads, 0, _SNIFF_WINDOW).to_pylist()
    filenames = batch["filename"].to_pylist()
    out = np.empty(len(windows), dtype=object)
    retry_full: list[int] = []
    for i, (w, fn) in enumerate(zip(windows, filenames)):
        w = w or b""
        fmt = _magic_format(w[:16], w)
        if fmt is None:
            fmt = _FALLBACK_EXTS.get(_extension_of(fn or ""))
        if fmt is None:
            fmt = detect_html_xhtml(w)
            if fmt is None and _comment_truncated(w):
                retry_full.append(i)
        out[i] = fmt
    # rare path: leading comment crossed the sniff window — fetch the full
    # payload for just these rows (reference scans full content)
    for i in retry_full:
        out[i] = detect_html_xhtml(payloads[i].as_py() or b"")
    return batch.append_column("format", pa.array(out, type=pa.string()))


def is_file_format_supported(payload: bytes, filename: str) -> bool:
    """Support predicate (utils.py:104-105)."""
    return guess_format_row(payload, filename) in EXT_TO_FORMAT.values()
