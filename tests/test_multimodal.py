"""Multimodal binary-column stages: real header parse + stub gating."""

import pyarrow as pa
import pytest
import ray.data

from docling_api_ray.config import PipelineConfig
from docling_api_ray.functions.png import make_png
from docling_api_ray.pipelines.convert import flagship
from docling_api_ray.stages.multimodal import (
    ByteHistogramFeatures,
    ImageResize,
    MediaMetadata,
    explode_media,
    media_pipeline,
    parse_png_header,
)


def test_parse_png_header_real():
    png = make_png(1, scale=3)
    assert parse_png_header(png) == (12, 12, 8)
    assert parse_png_header(b"junk") is None
    assert parse_png_header(b"") is None


def _media_tbl():
    return pa.table(
        {
            "doc_id": [1, 2],
            "kind": ["table", "picture"],
            "filename": ["table-1.png", "picture-1.png"],
            "png": pa.array([make_png(1, 2), b"corrupt"], type=pa.binary()),
        }
    )


def test_media_metadata_stage():
    out = MediaMetadata()(_media_tbl())
    assert out["width"].to_pylist() == [8, 0]
    assert out["valid_png"].to_pylist() == [True, False]
    assert out["n_bytes"].to_pylist()[1] == 7


def test_byte_histogram_features():
    out = ByteHistogramFeatures()(_media_tbl())
    f = out["features"][0].as_py()
    assert len(f) == 256 and abs(sum(f) - 1.0) < 1e-5


def test_resize_stub_gated():
    with pytest.raises(NotImplementedError):
        ImageResize()(_media_tbl())
    out = ImageResize(allow_stub=True)(_media_tbl())
    assert parse_png_header(out["png"][0].as_py()) is not None
    assert out["width"].to_pylist() == [32, 32]


def test_media_pipeline_over_flagship():
    results = flagship(
        "/root/testdata/sf0.001",
        PipelineConfig(extract_tables_as_images=True),
    )
    media = explode_media(results)
    rows = media.take(20)
    assert all(r["filename"].endswith(".png") for r in rows)
    feats = media_pipeline(results).take(5)
    assert all(len(r["features"]) == 256 for r in feats)


def test_frame_sampler_stub_gated():
    import pytest

    from docling_api_ray.stages.multimodal import FrameSampler, sample_frames

    with pytest.raises(NotImplementedError):
        FrameSampler()(pa.table({"doc_id": [1], "payload": [b"x" * 4096]}))

    # plumbing fake: 8 KiB payload = 8 frames of 1 KiB; stride 3 → 0,3,6
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": [7, 8],
                "payload": pa.array(
                    [bytes(range(256)) * 32, b""], type=pa.binary()
                ),
            }
        )
    )
    out = sample_frames(ds, stride=3, frame_bytes=1 << 10, allow_stub=True).take_all()
    assert [(r["doc_id"], r["frame_idx"]) for r in out] == [(7, 0), (7, 3), (7, 6)]
    assert all(len(r["frame"]) == 1024 for r in out)
