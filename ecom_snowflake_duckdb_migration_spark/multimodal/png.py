"""PNG codec in pure numpy + stdlib zlib — no PIL needed.

Decode scope: 8-bit-per-sample, non-interlaced PNG in every standard color
type — grayscale (0), RGB (2), palette (3), gray+alpha (4), RGBA (6) —
with all five row filters (None/Sub/Up/Average/Paeth). 16-bit, sub-byte
depths and Adam7 interlace raise ``NotImplementedError`` (the multimodal
operators capture that per row — see ``multimodal/columns.py``).

Encode scope: grayscale (h, w) or RGB (h, w, 3) uint8, filter 0 rows +
zlib. PNG is lossless, so decode(encode(x)) == x EXACTLY — tests assert
array equality, no tolerance. Cross-validation uses the JVM's ImageIO in
both directions (it writes adaptively-filtered PNGs, which exercises the
Sub/Up/Average/Paeth reconstruction paths on genuinely foreign files).

Scale posture: per-row pure functions over ~KB payloads inside
``mapInPandas`` — embarrassingly parallel, zero shuffle.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

# samples per pixel by PNG color type
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray) -> bytes:
    """Encode (h, w) grayscale or (h, w, 3) RGB uint8 losslessly."""
    pixels = np.asarray(pixels, dtype=np.uint8)
    h, w = pixels.shape[:2]
    color_type = 2 if pixels.ndim == 3 else 0
    nch = 3 if color_type == 2 else 1
    raw = pixels.reshape(h, w * nch)
    # filter byte 0 (None) before every row
    scanlines = np.concatenate([np.zeros((h, 1), np.uint8), raw], axis=1)
    out = _PNG_MAGIC
    out += _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0))
    out += _chunk(b"IDAT", zlib.compress(scanlines.tobytes(), 6))
    out += _chunk(b"IEND", b"")
    return out


def _unfilter(data: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Undo per-row PNG filters. data is (h, 1+stride) raw scanlines."""
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        ftype = int(data[y, 0])
        row = data[y, 1:].astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y else np.zeros(stride, np.int32)
        if ftype == 0:  # None
            cur = row
        elif ftype == 2:  # Up
            cur = (row + prev) & 0xFF
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth need left-to-right
            cur = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                left = cur[x - bpp] if x >= bpp else 0
                if ftype == 1:
                    cur[x] = (row[x] + left) & 0xFF
                elif ftype == 3:
                    cur[x] = (row[x] + ((left + prev[x]) >> 1)) & 0xFF
                else:  # Paeth predictor
                    up = prev[x]
                    ul = prev[x - bpp] if x >= bpp else 0
                    p = left + up - ul
                    pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                    if pa <= pb and pa <= pc:
                        pred = left
                    elif pb <= pc:
                        pred = up
                    else:
                        pred = ul
                    cur[x] = (row[x] + pred) & 0xFF
        else:
            raise ValueError(f"invalid PNG filter type {ftype}")
        out[y] = cur.astype(np.uint8)
    return out


def decode_png(payload: bytes) -> np.ndarray:
    """Decode to (h, w) uint8 for grayscale sources or (h, w, 3) uint8 RGB
    otherwise (palette is expanded; alpha is dropped after compositing on
    the raw samples — metadata/stat extraction doesn't blend)."""
    if payload[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    ihdr = None
    palette = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (size,) = struct.unpack_from(">I", payload, pos)
        tag = bytes(payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + size]
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"PLTE":
            palette = np.frombuffer(body, np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + size  # size + tag + crc
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, color_type, compression, filter_method, interlace = ihdr
    if depth != 8:
        raise NotImplementedError(f"{depth}-bit PNG unsupported (8-bit only)")
    if interlace != 0:
        raise NotImplementedError("Adam7-interlaced PNG unsupported")
    if color_type not in _CHANNELS:
        raise ValueError(f"invalid PNG color type {color_type}")
    nch = _CHANNELS[color_type]
    stride = w * nch
    raw = np.frombuffer(zlib.decompress(bytes(idat)), np.uint8)
    if raw.size != h * (stride + 1):
        raise ValueError("PNG scanline payload has wrong size")
    px = _unfilter(raw.reshape(h, stride + 1), h, stride, nch).reshape(h, w, nch)
    if color_type == 0:
        return px[:, :, 0]
    if color_type == 3:
        if palette is None:
            raise ValueError("palette PNG without PLTE chunk")
        return palette[px[:, :, 0]]
    if color_type == 2:
        return px
    if color_type == 4:  # gray + alpha -> gray
        return px[:, :, 0]
    return px[:, :, :3]  # RGBA -> RGB
