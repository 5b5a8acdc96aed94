"""PNG codec in pure numpy + stdlib zlib — no PIL needed.

Decode scope: 8-bit-per-sample PNG in every standard color type —
grayscale (0), RGB (2), palette (3), gray+alpha (4), RGBA (6) — with all
five row filters (None/Sub/Up/Average/Paeth), non-interlaced AND
Adam7-interlaced (each of the seven passes is an independently-filtered
sub-image scattered back on its (x0, y0, xstep, ystep) grid) — plus
16-bit depths (filters run at the byte level per spec 9.2; samples
downscale to the module's 8-bit contract via the top byte) and sub-byte
depths 1/2/4 for grayscale and palette (bit-packed rows unpack MSB-first
per spec 7.2; grayscale samples scale to 8-bit by the max-value ratio,
palette indices look up PLTE unscaled). Every standard IHDR
depth × color-type combination now decodes natively.

Encode scope: grayscale (h, w) or RGB (h, w, 3) uint8, filter 0 rows +
zlib, optionally Adam7-interlaced. PNG is lossless, so
decode(encode(x)) == x EXACTLY — tests assert array equality, no
tolerance. Cross-validation uses the JVM's ImageIO in both directions
(it writes adaptively-filtered PNGs, which exercises the
Sub/Up/Average/Paeth reconstruction paths on genuinely foreign files,
and it DECODES our Adam7 streams, which pins the interlaced layout to
the spec rather than to this module's own reading of it).

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


# Adam7 pass grid: (x_start, y_start, x_step, y_step) per pass (PNG spec
# §8.2 — passes 2/4/6 interleave columns at the same rows as 1/3/5)
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def encode_png(pixels: np.ndarray, interlace: bool = False) -> bytes:
    """Encode (h, w) grayscale or (h, w, 3) RGB uint8 losslessly; with
    ``interlace`` the IDAT carries the seven Adam7 passes (empty passes
    for small images contribute zero bytes, per spec)."""
    pixels = np.asarray(pixels, dtype=np.uint8)
    h, w = pixels.shape[:2]
    color_type = 2 if pixels.ndim == 3 else 0
    nch = 3 if color_type == 2 else 1
    px3 = pixels.reshape(h, w, nch)
    if interlace:
        parts = []
        for x0, y0, xs, ys in _ADAM7:
            sub = px3[y0::ys, x0::xs]
            ph, pw = sub.shape[:2]
            if ph == 0 or pw == 0:
                continue
            rows = sub.reshape(ph, pw * nch)
            parts.append(
                np.concatenate([np.zeros((ph, 1), np.uint8), rows], axis=1).tobytes()
            )
        body = b"".join(parts)
    else:
        raw = px3.reshape(h, w * nch)
        # filter byte 0 (None) before every row
        body = np.concatenate([np.zeros((h, 1), np.uint8), raw], axis=1).tobytes()
    out = _PNG_MAGIC
    out += _chunk(
        b"IHDR",
        struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 1 if interlace else 0),
    )
    out += _chunk(b"IDAT", zlib.compress(body, 6))
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


def _unpack_subbyte(rows: np.ndarray, w: int, depth: int) -> np.ndarray:
    """Unpack (h, stride) bytes of ``depth``-bit samples (MSB-first within
    each byte, trailing pad bits in the last byte ignored — spec 7.2) to
    (h, w) uint8 raw sample values."""
    bits = np.unpackbits(rows, axis=1)
    weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint8)
    return bits[:, : w * depth].reshape(rows.shape[0], w, depth) @ weights


def _deinterlace_adam7(
    raw: np.ndarray, w: int, h: int, nch: int, depth: int = 8
) -> np.ndarray:
    """Reassemble the seven Adam7 passes: each non-empty pass is its own
    filtered sub-image (filters reference neighbors WITHIN the pass, per
    spec), unfiltered independently and scattered onto its grid. ``nch``
    is bytes per pixel for depth >= 8, and 1 (raw sample values) for
    sub-byte depths, whose pass rows are bit-packed at the pass width."""
    out = np.zeros((h, w, nch), np.uint8)
    pos = 0
    for x0, y0, xs, ys in _ADAM7:
        pw = (w - x0 + xs - 1) // xs
        ph = (h - y0 + ys - 1) // ys
        if pw <= 0 or ph <= 0:
            continue
        stride = pw * nch if depth >= 8 else (pw * depth + 7) // 8
        need = ph * (stride + 1)
        chunk = raw[pos : pos + need]
        if chunk.size != need:
            raise ValueError("Adam7 pass payload truncated")
        pos += need
        sub = _unfilter(
            chunk.reshape(ph, stride + 1), ph, stride, nch if depth >= 8 else 1
        )
        if depth < 8:
            sub = _unpack_subbyte(sub, pw, depth)
        out[y0::ys, x0::xs] = sub.reshape(ph, pw, nch)
    if pos != raw.size:
        raise ValueError("Adam7 payload has trailing bytes")
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
    if depth not in (1, 2, 4, 8, 16):
        raise ValueError(f"invalid PNG bit depth {depth}")
    if depth == 16 and color_type == 3:
        raise ValueError("palette PNG cannot be 16-bit")  # spec 11.2.2
    if depth < 8 and color_type not in (0, 3):
        raise ValueError(  # spec 11.2.2: sub-byte only for gray/palette
            f"color type {color_type} cannot be {depth}-bit"
        )
    if interlace not in (0, 1):
        raise ValueError(f"invalid PNG interlace method {interlace}")
    if color_type not in _CHANNELS:
        raise ValueError(f"invalid PNG color type {color_type}")
    nch = _CHANNELS[color_type]
    raw = np.frombuffer(zlib.decompress(bytes(idat)), np.uint8)
    if depth < 8:
        # bit-packed rows, filter distance 1 byte (spec 9.2); unpack to
        # raw sample values, then scale grayscale to the 8-bit contract
        # by max-value ratio (0b1->255, 0b11->85x, 0b1111->17x); palette
        # indices index PLTE unscaled
        stride = (w * depth + 7) // 8
        if interlace == 1:
            px = _deinterlace_adam7(raw, w, h, 1, depth)
        else:
            if raw.size != h * (stride + 1):
                raise ValueError("PNG scanline payload has wrong size")
            filt = _unfilter(raw.reshape(h, stride + 1), h, stride, 1)
            px = _unpack_subbyte(filt, w, depth).reshape(h, w, 1)
        if color_type == 0:
            px = px * np.uint8(255 // ((1 << depth) - 1))
    else:
        bpp = nch * (depth // 8)  # filter distance is in BYTES (spec 9.2)
        stride = w * bpp
        if interlace == 1:
            px = _deinterlace_adam7(raw, w, h, bpp)
        else:
            if raw.size != h * (stride + 1):
                raise ValueError("PNG scanline payload has wrong size")
            px = _unfilter(raw.reshape(h, stride + 1), h, stride, bpp).reshape(
                h, w, bpp
            )
    if depth == 16:
        # big-endian u16 samples -> top byte (the 8-bit contract every
        # other decode path returns; >>8 is the standard downscale)
        px = px.reshape(h, w, nch, 2)[:, :, :, 0]
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
