"""Image-container header parsers over hand-crafted minimal blobs —
real-format plumbing without codec libraries (the decode stage stays a
documented stub; dims/metadata are genuinely parsed)."""

import struct

import pyarrow as pa
import ray.data

from docling_api_ray.functions.imagemeta import (
    parse_bmp_header,
    parse_gif_header,
    parse_jpeg_header,
    sniff_image_dims,
)
from docling_api_ray.functions.png import make_png


def _jpeg(w, h, precision=8, extra_segments=True):
    """Minimal structurally-valid JPEG up to SOF0 (no scan data)."""
    out = b"\xff\xd8"  # SOI
    if extra_segments:
        app0 = b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
        out += b"\xff\xe0" + struct.pack(">H", 2 + len(app0)) + app0
        com = b"a comment"
        out += b"\xff\xfe" + struct.pack(">H", 2 + len(com)) + com
        out += b"\xff\x01"  # standalone TEM marker (no length)
    sof = struct.pack(">BHHB", precision, h, w, 3) + b"\x01\x11\x00" * 3
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    return out


def _gif(w, h, color_bits=8):
    packed = 0x80 | ((color_bits - 1) << 4) | (color_bits - 1)
    return b"GIF89a" + struct.pack("<HHBBB", w, h, packed, 0, 0) + b"\x00" * 8


def _bmp(w, h, bpp=24, top_down=False):
    ih = struct.pack(
        "<IiiHHIIiiII", 40, w, -h if top_down else h, 1, bpp, 0, 0, 0, 0, 0, 0
    )
    return b"BM" + struct.pack("<IHHI", 14 + 40, 0, 0, 54) + ih


def test_jpeg_sof_walk():
    assert parse_jpeg_header(_jpeg(640, 480)) == (640, 480, 8)
    assert parse_jpeg_header(_jpeg(33, 17, precision=12)) == (33, 17, 12)
    # marker walk must survive a missing-APPn minimal stream too
    assert parse_jpeg_header(_jpeg(5, 7, extra_segments=False)) == (5, 7, 8)


def test_jpeg_rejects_malformed():
    assert parse_jpeg_header(b"") is None
    assert parse_jpeg_header(b"\xff\xd8\xff\xd9") is None  # SOI+EOI only
    assert parse_jpeg_header(b"\x89PNG\r\n\x1a\n") is None
    trunc = _jpeg(100, 100)[:-4]  # SOF length field points past the end
    assert parse_jpeg_header(trunc) is None


def test_gif_and_bmp():
    assert parse_gif_header(_gif(320, 200, color_bits=8)) == (320, 200, 8)
    assert parse_gif_header(b"GIF89a\x00") is None
    assert parse_bmp_header(_bmp(12, 34)) == (12, 34, 24)
    # top-down BMPs store negative height; magnitude must come back
    assert parse_bmp_header(_bmp(12, 34, top_down=True)) == (12, 34, 24)


def test_sniff_dispatch_including_real_png():
    png = make_png(seed=3, scale=2)
    assert sniff_image_dims(png)[0] == "png"
    assert sniff_image_dims(_jpeg(9, 9)) == ("jpeg", 9, 9, 8)
    assert sniff_image_dims(_gif(4, 5, color_bits=2)) == ("gif", 4, 5, 2)
    assert sniff_image_dims(_bmp(6, 7, bpp=8)) == ("bmp", 6, 7, 8)
    assert sniff_image_dims(b"random bytes") is None


def test_media_dims_stage_mixed_formats():
    """The metadata stage classifies a MIXED-format binary column via
    the sniffing dispatcher (Ray-side plumbing with real parsers)."""
    from docling_api_ray.stages.multimodal import MediaFormatDims

    blobs = [make_png(seed=1, scale=2), _jpeg(31, 15), _gif(8, 8),
             _bmp(2, 3), b"not an image"]
    tbl = pa.table(
        {
            "doc_id": pa.array(list(range(len(blobs))), type=pa.int64()),
            "blob": pa.array(blobs, type=pa.binary()),
        }
    )
    out = {
        r["doc_id"]: r
        for r in ray.data.from_arrow(tbl)
        .map_batches(MediaFormatDims, batch_format="pyarrow", batch_size=2,
                     concurrency=1)
        .take_all()
    }
    assert out[0]["format"] == "png" and out[0]["width"] == 8  # 4x4 base, scale 2
    assert out[1]["format"] == "jpeg" and (out[1]["width"], out[1]["height"]) == (31, 15)
    assert out[2]["format"] == "gif"
    assert out[3]["format"] == "bmp" and out[3]["height"] == 3
    assert out[4]["format"] == "" and not out[4]["valid"]
