"""Pure-python image container metadata — REAL header parsers (no codec
libraries) for the formats a web-scale media corpus actually carries.
Extends the PNG IHDR parse (stages/multimodal.py) with JPEG, GIF and BMP
so the metadata stage classifies foreign blobs instead of reporting
``valid=False`` for everything non-PNG.

- JPEG: walk the marker stream past APPn/COM/DQT/... segments to the
  first SOF0–SOF15 frame header (skipping DHT/DAC/RSTn/standalone
  markers per ITU T.81 §B); dims are the frame's (width, height),
  bit depth the sample precision.
- GIF: logical screen descriptor of GIF87a/GIF89a (little-endian u16
  dims at offset 6; color depth from the packed flags).
- BMP: BITMAPINFOHEADER (little-endian i32 dims at offset 18).

Each parser returns ``(width, height, bit_depth)`` or ``None`` on a
malformed/foreign blob — never raises on arbitrary bytes.
"""

from __future__ import annotations

import struct

def parse_png_header(png: bytes) -> tuple[int, int, int] | None:
    """(width, height, bit_depth) from a PNG IHDR — pure python, real.
    (Lives here with the other container parsers; stages/multimodal.py
    re-exports it for its original callers.)"""
    if len(png) < 26 or not png.startswith(b"\x89PNG\r\n\x1a\n"):
        return None
    if png[12:16] != b"IHDR":
        return None
    w, h = struct.unpack(">II", png[16:24])
    return w, h, png[24]


# JPEG markers WITHOUT a length field (standalone), per ITU T.81
_JPEG_STANDALONE = frozenset(
    [0x01] + list(range(0xD0, 0xD8))  # TEM, RST0-7
)
_JPEG_SOF = frozenset(
    [0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD,
     0xCE, 0xCF]  # SOF0-15 minus DHT(C4)/JPG(C8)/DAC(CC)
)


def parse_jpeg_header(blob: bytes) -> tuple[int, int, int] | None:
    """(width, height, precision) from the first SOFn segment."""
    if len(blob) < 4 or blob[0:2] != b"\xff\xd8":  # SOI
        return None
    i = 2
    n = len(blob)
    while i + 4 <= n:
        if blob[i] != 0xFF:
            return None  # marker desync
        marker = blob[i + 1]
        if marker == 0xFF:  # fill byte
            i += 1
            continue
        if marker in _JPEG_STANDALONE:
            i += 2
            continue
        if marker == 0xD9:  # EOI before any SOF
            return None
        seg_len = struct.unpack(">H", blob[i + 2 : i + 4])[0]
        if seg_len < 2 or i + 2 + seg_len > n:
            return None
        if marker in _JPEG_SOF:
            if seg_len < 7:
                return None
            precision = blob[i + 4]
            h, w = struct.unpack(">HH", blob[i + 5 : i + 9])
            return w, h, precision
        if marker == 0xDA:  # SOS: entropy data follows, no SOF seen
            return None
        i += 2 + seg_len
    return None


def parse_gif_header(blob: bytes) -> tuple[int, int, int] | None:
    """(width, height, color_resolution_bits) from the logical screen
    descriptor."""
    if len(blob) < 13 or blob[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    w, h = struct.unpack("<HH", blob[6:10])
    packed = blob[10]
    color_bits = ((packed >> 4) & 0x07) + 1
    return w, h, color_bits


def parse_bmp_header(blob: bytes) -> tuple[int, int, int] | None:
    """(width, height, bits_per_pixel) from BITMAPINFOHEADER."""
    if len(blob) < 30 or blob[:2] != b"BM":
        return None
    header_size = struct.unpack("<I", blob[14:18])[0]
    if header_size < 40:  # BITMAPCOREHEADER not supported
        return None
    w, h = struct.unpack("<ii", blob[18:26])
    bpp = struct.unpack("<H", blob[28:30])[0]
    return w, abs(h), bpp  # h < 0 = top-down rows; magnitude is height


def sniff_image_dims(blob: bytes) -> tuple[str, int, int, int] | None:
    """(format, width, height, bit_depth) via magic-byte dispatch across
    PNG / JPEG / GIF / BMP; None if no parser accepts the blob."""
    if blob.startswith(b"\x89PNG"):
        hdr = parse_png_header(blob)
        return ("png",) + hdr if hdr else None
    if blob.startswith(b"\xff\xd8"):
        hdr = parse_jpeg_header(blob)
        return ("jpeg",) + hdr if hdr else None
    if blob.startswith(b"GIF8"):
        hdr = parse_gif_header(blob)
        return ("gif",) + hdr if hdr else None
    if blob.startswith(b"BM"):
        hdr = parse_bmp_header(blob)
        return ("bmp",) + hdr if hdr else None
    return None
