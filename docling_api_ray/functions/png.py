"""Deterministic minimal PNG synthesis (SURVEY.md §2.2 M7 stand-in).

The reference renders table/picture crops to PIL images and base64-embeds
PNG bytes in JSON (document_converter/service.py:50-51,63).  PIL is not
available in this sandbox, so media payloads are synthesized as small but
*valid* PNG files (signature + IHDR + IDAT + IEND, zlib-compressed
grayscale scanlines), deterministic in (seed, scale).  Arrow carries them
as raw ``pa.binary()`` — base64 only exists in the optional JSON export.

``image_resolution_scale`` (route.py:28, service.py:33) scales the pixel
dimensions exactly as the reference's ``images_scale`` scales the render.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def make_png(seed: int, scale: int = 1) -> bytes:
    """A valid 8-bit grayscale PNG, (4*scale) x (4*scale), deterministic in
    (seed, scale).  Pixel synthesis is a vectorized numpy expression (one
    filter-type-0 byte prepended per scanline)."""
    size = 4 * scale
    y = np.arange(size, dtype=np.int64)[:, None]
    x = np.arange(size, dtype=np.int64)[None, :]
    px = ((seed * 31 + y * 7 + x * 13) & 0xFF).astype(np.uint8)
    scanlines = np.concatenate(
        [np.zeros((size, 1), dtype=np.uint8), px], axis=1
    )
    rows = scanlines.tobytes()
    ihdr = struct.pack(">IIBBBBB", size, size, 8, 0, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(rows), 6))
        + _chunk(b"IEND", b"")
    )
