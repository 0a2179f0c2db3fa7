"""Reference-JSON export parity (S5/M7) + the §2.10 converter-override
extension surface."""

import base64

import pyarrow as pa

from docling_api_ray.config import PipelineConfig
from docling_api_ray.functions.export import (
    batch_to_reference_json,
    row_to_reference_json,
)
from docling_api_ray.functions.spans import Item
from docling_api_ray.pipelines.convert import flagship
from docling_api_ray.stages.convert import ConvertActor


def test_row_export_success_shape():
    row = {
        "filename": "a.pdf",
        "markdown": "hello\n\npicture-1.png",
        "media": [{"kind": "picture", "filename": "picture-1.png", "png": b"PNGDATA"}],
        "error": "",
    }
    out = row_to_reference_json(row)
    # success rows carry the extension-stripped stem, like the reference's
    # conv_res.input.file.stem (service.py:81,91,116)
    assert out == {
        "filename": "a",
        "markdown": "hello\n\npicture-1.png",
        "images": [
            {
                "type": "picture",
                "filename": "picture-1.png",
                "image": base64.b64encode(b"PNGDATA").decode(),
            }
        ],
    }


def test_row_export_error_exclude_unset():
    # error rows carry only (filename, error) — model_dump(exclude_unset)
    # semantics of worker/tasks.py:23
    out = row_to_reference_json({"filename": "bad.bin", "error": "unsupported format"})
    assert out == {"filename": "bad.bin", "error": "unsupported format"}


def test_row_export_no_images_key_when_empty():
    out = row_to_reference_json(
        {"filename": "t.md", "markdown": "x", "media": [], "error": ""}
    )
    assert "images" not in out
    assert out["filename"] == "t"  # stem on success rows


def test_row_export_stem_semantics():
    # Path.stem parity: last suffix only; dotfiles keep their name;
    # error rows keep the FULL filename (batch fold, service.py:112)
    assert row_to_reference_json(
        {"filename": "a.tar.gz", "markdown": "", "media": [], "error": ""}
    )["filename"] == "a.tar"
    assert row_to_reference_json(
        {"filename": ".bashrc", "markdown": "", "media": [], "error": ""}
    )["filename"] == ".bashrc"
    assert row_to_reference_json(
        {"filename": "bad.bin", "error": "boom"}
    )["filename"] == "bad.bin"


def test_batch_export_over_flagship():
    batch = pa.Table.from_pylist(
        flagship("/root/testdata/sf0.001", PipelineConfig(extract_tables_as_images=True))
        .take(50)
    )
    out = batch_to_reference_json(batch)
    assert len(out) == 50
    for rec in out:
        assert rec["filename"].startswith("doc-")
        if "markdown" in rec:  # success rows: extension stripped
            assert "." not in rec["filename"]
        assert ("error" in rec) != ("markdown" in rec)
        for img in rec.get("images", []):
            assert img["type"] in ("table", "picture")
            assert base64.b64decode(img["image"]).startswith(b"\x89PNG")


def test_converter_override_replaces_handler():
    def shouty_md(payload: bytes):
        return [Item("text", payload.decode().upper())]

    actor = ConvertActor(PipelineConfig(), converter_overrides={"md": shouty_md})
    spans, media, md, err = actor.convert_row(b"hello world", "md")
    assert err == "" and spans[0]["text"] == "HELLO WORLD"


def test_converter_override_adds_new_format():
    def csv_handler(payload: bytes):
        return [Item("text", line) for line in payload.decode().splitlines()]

    actor = ConvertActor(PipelineConfig(), converter_overrides={"csv": csv_handler})
    spans, media, md, err = actor.convert_row(b"a,b\nc,d", "csv")
    assert err == "" and [s["text"] for s in spans] == ["a,b", "c,d"]
