"""Deterministic PNG synthesis + a REAL pure-python PNG codec.

The reference renders table/picture crops to PIL images and base64-embeds
PNG bytes in JSON (document_converter/service.py:50-51,63).  PIL is not
available in this sandbox, so media payloads are synthesized as small but
*valid* PNG files (signature + IHDR + IDAT + IEND, zlib-compressed
grayscale scanlines), deterministic in (seed, scale).  Arrow carries them
as raw ``pa.binary()`` — base64 only exists in the optional JSON export.

``image_resolution_scale`` (route.py:28, service.py:33) scales the pixel
dimensions exactly as the reference's ``images_scale`` scales the render.

``decode_png`` / ``encode_png`` / ``resize_nearest`` are a real codec for
the PNG subset that matters (8-bit gray/RGB/RGBA/palette, all 5 scanline
filters, non-interlaced) — zlib + numpy only, the same
no-external-library posture as the PDF content-stream parser
(functions/pdf_parse.py).  They back the multimodal ``ImageResize``
stage's REAL path (stages/multimodal.py); only non-PNG codecs (JPEG,
video) remain behind the honest NotImplementedError gate.
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


class PngDecodeError(Exception):
    """Structurally invalid or unsupported-subset PNG."""


_CHANNELS = {0: 1, 2: 3, 3: 1, 6: 4, 4: 2}


def _unfilter(raw: np.ndarray, height: int, stride: int, bpp: int) -> np.ndarray:
    """Undo PNG scanline filters (types 0-4).  Row-sequential by the
    format's data dependency (Up/Average/Paeth read the previous
    reconstructed row); within a row the arithmetic is numpy."""
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    pos = 0
    for y in range(height):
        ftype = raw[pos]
        row = raw[pos + 1 : pos + 1 + stride].astype(np.int32)
        pos += 1 + stride
        if ftype == 0:
            rec = row
        elif ftype == 1:  # Sub
            rec = row.copy()
            for i in range(bpp, stride):
                rec[i] = (rec[i] + rec[i - bpp]) & 0xFF
        elif ftype == 2:  # Up
            rec = (row + prev) & 0xFF
        elif ftype == 3:  # Average
            rec = row.copy()
            for i in range(stride):
                left = rec[i - bpp] if i >= bpp else 0
                rec[i] = (rec[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            rec = row.copy()
            for i in range(stride):
                a = rec[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb and pa_ <= pc) else (b if pb <= pc else c)
                rec[i] = (rec[i] + pred) & 0xFF
        else:
            raise PngDecodeError(f"unknown scanline filter {ftype}")
        out[y] = rec.astype(np.uint8)
        prev = rec
    return out


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → uint8 pixel array: (h, w) for grayscale, (h, w, c)
    otherwise.  Supports 8-bit gray / RGB / RGBA / gray+alpha / palette,
    non-interlaced — the full subset any pipeline stage here emits."""
    if data[:8] != b"\x89PNG\r\n\x1a\n":
        raise PngDecodeError("bad PNG signature")
    pos = 8
    ihdr = None
    idat = bytearray()
    plte = None
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", payload)
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"PLTE":
            plte = np.frombuffer(payload, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"IEND":
            break
    if ihdr is None:
        raise PngDecodeError("missing IHDR")
    w, h, depth, ctype, comp, filt, interlace = ihdr
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
        raise PngDecodeError(
            f"unsupported PNG subset (depth={depth}, interlace={interlace})"
        )
    if ctype not in _CHANNELS:
        raise PngDecodeError(f"unsupported color type {ctype}")
    channels = _CHANNELS[ctype]
    try:
        raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    except zlib.error as e:
        raise PngDecodeError(f"IDAT inflate failed: {e}") from e
    stride = w * channels
    if len(raw) != h * (stride + 1):
        raise PngDecodeError("IDAT size does not match dimensions")
    px = _unfilter(raw, h, stride, channels)
    if ctype == 3:
        if plte is None:
            raise PngDecodeError("palette image without PLTE")
        return plte[px.reshape(h, w)]
    if channels == 1:
        return px.reshape(h, w)
    return px.reshape(h, w, channels)


def encode_png(arr: np.ndarray) -> bytes:
    """uint8 pixel array — (h, w) gray or (h, w, {2,3,4}) — → PNG bytes
    (filter type 0 scanlines, one zlib stream)."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        h, w = arr.shape
        ctype = 0
        flat = arr.reshape(h, w)
    elif arr.ndim == 3 and arr.shape[2] in (2, 3, 4):
        h, w, c = arr.shape
        ctype = {2: 4, 3: 2, 4: 6}[c]
        flat = arr.reshape(h, w * c)
    else:
        raise ValueError(f"unsupported array shape {arr.shape}")
    scanlines = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8), flat], axis=1
    ).tobytes()
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(scanlines, 6))
        + _chunk(b"IEND", b"")
    )


def resize_nearest(arr: np.ndarray, target: tuple[int, int]) -> np.ndarray:
    """Nearest-neighbor resample to (width, height) — pure numpy fancy
    indexing, exact pixel-center mapping (the classic scale factor
    src_idx = floor((dst_idx + 0.5) * src / dst))."""
    tw, th = target
    if tw < 1 or th < 1:
        raise ValueError(f"bad target size {target}")
    sh, sw = arr.shape[:2]
    ys = np.minimum(((np.arange(th) + 0.5) * sh / th).astype(np.int64), sh - 1)
    xs = np.minimum(((np.arange(tw) + 0.5) * sw / tw).astype(np.int64), sw - 1)
    return arr[ys][:, xs]
