"""GIF87a/89a codec in pure numpy — no PIL needed.

Decode scope: single- and multi-frame (animated) GIFs with global/local
color tables, LZW-compressed image data (variable-width codes 3-12 bits),
interlaced frames (the 4-pass row shuffle), transparency, frame delays,
and all four disposal methods (none / keep / restore-to-background /
restore-to-previous). Returns composited full-canvas RGB frames, which
is what frame-sampling and feature extraction want.

Encode scope: palette-indexed frames with a grayscale-identity palette
(one byte per pixel = its gray level), real LZW compression, optional
multi-frame animation with per-frame delay. Palette images are LOSSLESS,
so round-trip tests assert exact array equality.

GIF is the one mainstream animation container a pure-numpy codec can
cover completely, which upgrades the video modality in
``multimodal/columns.py`` from the toy ``SVID`` codec to a real format:
``sample_video_frames`` extracts genuine decoded frames from animated
GIF payloads.

Scale posture: per-row pure functions over ~KB payloads inside
``mapInPandas`` — embarrassingly parallel, zero shuffle.
"""

from __future__ import annotations

import struct

import numpy as np

_MAGICS = (b"GIF87a", b"GIF89a")


# ---------------------------------------------------------------------------
# LZW
# ---------------------------------------------------------------------------


def _lzw_decode(data: bytes, min_code_size: int) -> list[int]:
    """GIF-flavor LZW: variable width starting at min+1, cap 12 bits."""
    clear = 1 << min_code_size
    end = clear + 1
    width = min_code_size + 1
    dictionary: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out: list[int] = []
    prev: bytes | None = None
    acc = nbits = 0
    for byte in data:
        acc |= byte << nbits  # GIF packs LSB-first
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                dictionary = [bytes([i]) for i in range(clear)] + [b"", b""]
                width = min_code_size + 1
                prev = None
                continue
            if code == end:
                return out
            if code < len(dictionary):
                entry = dictionary[code]
            elif code == len(dictionary) and prev is not None:
                entry = prev + prev[:1]
            else:
                raise ValueError("corrupt GIF LZW stream")
            out.extend(entry)
            if prev is not None:
                dictionary.append(prev + entry[:1])
                if len(dictionary) == (1 << width) and width < 12:
                    width += 1
            prev = entry
    return out


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """Real LZW compression (dict reset at 4096 entries, per spec)."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    acc = nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    width = min_code_size + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    emit(clear, width)
    prefix = b""
    for idx in indices.tolist():
        trial = prefix + bytes([idx])
        if trial in table:
            prefix = trial
            continue
        emit(table[prefix], width)
        table[trial] = next_code
        next_code += 1
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        if next_code >= 4096:
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            width = min_code_size + 1
        prefix = bytes([idx])
    if prefix:
        emit(table[prefix], width)
    emit(end, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _sub_blocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


# ---------------------------------------------------------------------------
# Encoder (grayscale-identity palette; lossless for 8-bit gray frames)
# ---------------------------------------------------------------------------


def encode_gif(frames: np.ndarray | list[np.ndarray], delay_cs: int = 10) -> bytes:
    """Encode one (h, w) frame or a list of same-size (h, w) uint8 gray
    frames as GIF89a with a 256-entry grayscale palette. Multi-frame
    payloads carry a NETSCAPE loop block + per-frame delays (centisec)."""
    if isinstance(frames, np.ndarray) and frames.ndim == 2:
        frames = [frames]
    frames = [np.asarray(f, dtype=np.uint8) for f in frames]
    h, w = frames[0].shape
    if any(f.shape != (h, w) for f in frames):
        raise ValueError("all GIF frames must share one size")
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0xF7, 0, 0)  # global 256-color table
    palette = np.repeat(np.arange(256, dtype=np.uint8), 3)  # gray identity
    out += palette.tobytes()
    if len(frames) > 1:
        out += b"\x21\xff\x0bNETSCAPE2.0" + _sub_blocks(b"\x01\x00\x00")[:-1] + b"\x00"
    for frame in frames:
        if len(frames) > 1:
            out += b"\x21\xf9\x04" + struct.pack("<BHB", 0, delay_cs, 0) + b"\x00"
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        out.append(8)  # LZW min code size
        out += _sub_blocks(_lzw_encode(frame.ravel(), 8))
    out += b"\x3b"  # trailer
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif(payload: bytes) -> tuple[list[np.ndarray], list[int]]:
    """Decode to (frames, delays_cs): full-canvas (h, w, 3) uint8 RGB
    frames composited per the GIF disposal rules, and per-frame delays in
    centiseconds (0 when absent)."""
    if bytes(payload[:6]) not in _MAGICS:
        raise ValueError("not a GIF (bad signature)")
    w, h, flags, bg_index, _ = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    global_palette = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        global_palette = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    canvas = np.zeros((h, w, 3), dtype=np.uint8)
    if global_palette is not None and bg_index < len(global_palette):
        canvas[:] = global_palette[bg_index]
    background = canvas.copy()
    frames: list[np.ndarray] = []
    delays: list[int] = []
    transparent = None
    disposal = 0
    delay = 0
    while pos < len(payload):
        block = payload[pos]
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = payload[pos + 1]
            pos += 2
            if label == 0xF9:  # graphic control
                size = payload[pos]
                gflags, delay = struct.unpack_from("<BH", payload, pos + 1)
                tindex = payload[pos + 3]
                disposal = (gflags >> 2) & 0x07
                transparent = tindex if gflags & 1 else None
                pos += size + 1
            while payload[pos] != 0:  # skip (remaining) sub-blocks
                pos += payload[pos] + 1
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
        fx, fy, fw, fh, lflags = struct.unpack_from("<HHHHB", payload, pos + 1)
        pos += 10
        palette = global_palette
        if lflags & 0x80:
            n = 2 << (lflags & 0x07)
            palette = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
            pos += n * 3
        if palette is None:
            raise ValueError("GIF frame without any color table")
        min_code = payload[pos]
        pos += 1
        data = bytearray()
        while payload[pos] != 0:
            size = payload[pos]
            data += payload[pos + 1 : pos + 1 + size]
            pos += size + 1
        pos += 1
        idx = np.array(_lzw_decode(bytes(data), min_code), dtype=np.int32)
        if idx.size < fw * fh:
            raise ValueError("GIF frame data truncated")
        idx = idx[: fw * fh].reshape(fh, fw)
        if lflags & 0x40:  # interlaced: reorder rows via the 4-pass scheme
            order = []
            for start, step in _INTERLACE_PASSES:
                order.extend(range(start, fh, step))
            deinter = np.empty_like(idx)
            deinter[np.array(order)] = idx
            idx = deinter
        # disposal 3 (restore-to-previous): snapshot the canvas before
        # rendering and put it back after the frame is emitted
        saved = canvas.copy() if disposal == 3 else None
        region = canvas[fy : fy + fh, fx : fx + fw]
        rgb = palette[np.clip(idx, 0, len(palette) - 1)]
        if transparent is not None:
            mask = (idx != transparent)[..., None]
            region[:] = np.where(mask, rgb, region)
        else:
            region[:] = rgb
        frames.append(canvas.copy())
        delays.append(delay)
        if disposal == 2:  # restore region to background
            canvas[fy : fy + fh, fx : fx + fw] = background[fy : fy + fh, fx : fx + fw]
        elif disposal == 3:
            canvas = saved
        transparent = None
        disposal = 0
        delay = 0
    if not frames:
        raise ValueError("GIF with no image frames")
    return frames, delays
