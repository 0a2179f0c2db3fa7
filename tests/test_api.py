"""Reference-parity convenience API (sync-single vs batch asymmetry)."""

import pytest

from docling_api_ray.api import (
    ConversionFailed,
    convert_document,
    convert_documents_batch,
)
from docling_api_ray.config import PipelineConfig


def test_convert_document_success():
    # two markdown paragraphs (blank-line separated blocks); consecutive
    # lines inside one block stay one paragraph (real markdown semantics)
    out = convert_document("note.md", b"hello world\n\nsecond line")
    # stem, like conv_res.input.file.stem (service.py:81)
    assert out["filename"] == "note"
    assert out["markdown"] == "hello world\n\nsecond line"
    assert "error" not in out


def test_sync_single_raises_like_reference():
    # sync-single turns doc errors into failures (service.py:127-129)...
    with pytest.raises(ConversionFailed, match="unsupported format"):
        convert_document("blob.xyz", b"\x00\xffgarbage")
    # ...unless asked for error-as-data; sync-single error rows use the
    # stem too (service.py:83-85)
    out = convert_document("blob.xyz", b"\x00\xffgarbage", raise_on_error=False)
    assert out == {"filename": "blob", "error": "unsupported format"}


def test_batch_keeps_errors_in_order():
    docs = [
        ("a.md", b"alpha"),
        ("bad.bin", b"\x00\xff???"),
        ("c.pdf", b"%PDF-1.4\nbody text here"),
    ]
    out = convert_documents_batch(docs)
    # batch fold: stem on success rows (service.py:116), FULL name on
    # error rows (service.py:112)
    assert [r["filename"] for r in out] == ["a", "bad.bin", "c"]
    assert "error" in out[1] and "markdown" in out[0] and "markdown" in out[2]


def test_media_payload_b64_present():
    cfg = PipelineConfig(extract_tables_as_images=True)
    out = convert_document(
        "t.pdf", b"%PDF-1.4\nsome text\n[[TABLE]]\n[[PICTURE]]", config=cfg
    )
    assert [m["type"] for m in out["images"]] == ["table", "picture"]
    assert out["images"][0]["filename"] == "table-1.png"
