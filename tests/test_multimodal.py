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


def test_png_codec_round_trips():
    import numpy as np

    from docling_api_ray.functions.png import (
        decode_png,
        encode_png,
        resize_nearest,
    )

    # generator round-trip: decoded pixels match the synthesis formula
    a = decode_png(make_png(7, 4))
    y = np.arange(16)[:, None]
    x = np.arange(16)[None, :]
    assert (a == ((7 * 31 + y * 7 + x * 13) & 0xFF).astype(np.uint8)).all()
    # color round-trips
    rng = np.random.RandomState(0)
    for shape in [(9, 13, 3), (5, 6, 4), (7, 3, 2), (11, 4)]:
        img = rng.randint(0, 256, shape, dtype=np.uint8)
        assert (decode_png(encode_png(img)) == img).all()
    # nearest resize maps exact source pixels
    r = resize_nearest(a, (8, 8))
    ys = np.minimum(((np.arange(8) + 0.5) * 16 / 8).astype(int), 15)
    assert (r == a[np.ix_(ys, ys)]).all()


def test_png_decode_all_filter_types():
    import struct
    import zlib

    import numpy as np

    from docling_api_ray.functions.png import _chunk, decode_png

    # forward-filter a known RGB image with each filter type per row,
    # then decode and expect the original back (spec-exact inverse)
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (5, 4, 3), dtype=np.uint8).astype(np.int32)
    h, w, c = img.shape
    flat = img.reshape(h, w * c)
    raw = bytearray()
    prev = np.zeros(w * c, dtype=np.int32)
    for y in range(h):
        ftype = y % 5
        row = flat[y]
        if ftype == 0:
            enc = row
        elif ftype == 1:
            left = np.concatenate([np.zeros(c, dtype=np.int32), row[:-c]])
            enc = (row - left) & 0xFF
        elif ftype == 2:
            enc = (row - prev) & 0xFF
        elif ftype == 3:
            left = np.concatenate([np.zeros(c, dtype=np.int32), row[:-c]])
            enc = (row - ((left + prev) >> 1)) & 0xFF
        else:  # Paeth
            enc = np.zeros_like(row)
            for i in range(w * c):
                a = int(row[i - c]) if i >= c else 0
                b = int(prev[i])
                cc = int(prev[i - c]) if i >= c else 0
                p = a + b - cc
                pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa_ <= pb and pa_ <= pc_) else (
                    b if pb <= pc_ else cc
                )
                enc[i] = (row[i] - pred) & 0xFF
        raw.append(ftype)
        raw += enc.astype(np.uint8).tobytes()
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )
    assert (decode_png(png) == img.astype(np.uint8)).all()


def test_png_decode_palette():
    import struct
    import zlib

    import numpy as np

    from docling_api_ray.functions.png import _chunk, decode_png

    idx = np.array([[0, 1], [2, 1]], dtype=np.uint8)
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])
    raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(2))
    png = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0))
        + _chunk(b"PLTE", plte)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )
    out = decode_png(png)
    assert out.shape == (2, 2, 3)
    assert out[0, 0].tolist() == [255, 0, 0]
    assert out[1, 0].tolist() == [0, 0, 255]


def test_image_resize_real_path():
    import numpy as np

    from docling_api_ray.functions.png import decode_png, resize_nearest

    src = make_png(5, 4)  # 16x16 gray
    batch = pa.table(
        {
            "doc_id": [1],
            "filename": ["picture-1.png"],
            "png": pa.array([src], type=pa.binary()),
        }
    )
    out = ImageResize(target=(6, 9))(batch)  # real path, no stub flag
    got = decode_png(out["png"][0].as_py())
    assert got.shape == (9, 6)
    assert (got == resize_nearest(decode_png(src), (6, 9))).all()
    assert out["width"].to_pylist() == [6]
    assert out["height"].to_pylist() == [9]


def test_perceptual_hash_semantics():
    """Identical images collide (also across nearest-collapsible scales),
    distinct images differ, and the non-PNG codec gate is honest."""
    import numpy as np
    import pytest

    from docling_api_ray.functions.png import decode_png, encode_png, make_png
    from docling_api_ray.stages.multimodal import PerceptualHash

    base = make_png(7, 1)
    up2 = encode_png(
        np.repeat(np.repeat(decode_png(base), 2, axis=0), 2, axis=1)
    )  # true 2x nearest upscale of the same pixels
    tbl = pa.table(
        {
            "doc_id": [1, 2, 3, 4],
            "filename": ["a", "b", "c", "d"],
            "png": [
                base,
                bytes(base),      # byte-identical dup
                up2,
                make_png(99, 1),  # different content
            ],
        }
    )
    out = PerceptualHash()(tbl)
    h = out["phash"].to_pylist()
    assert h[0] == h[1]
    assert h[0] == h[2]  # nearest 2x upscale collapses back to the same 8x8
    assert h[3] != h[0]
    assert all(len(x) == 16 for x in h)

    bad = pa.table(
        {"doc_id": [1], "filename": ["x"], "png": [b"\xff\xd8JPEGDATA"]}
    )
    with pytest.raises(NotImplementedError):
        PerceptualHash()(bad)
    stub = PerceptualHash(allow_stub=True)(bad)
    assert len(stub["phash"].to_pylist()[0]) == 16
