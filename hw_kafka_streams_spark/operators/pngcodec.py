"""PNG codec in pure numpy + stdlib zlib — public spec (RFC 2083 /
ISO 15948), no codec libraries.

PNG's pixel path is exactly two public building blocks: DEFLATE
(stdlib ``zlib``) and per-row byte filtering (None/Sub/Up/Average/
Paeth). Both directions are implemented, so PNG joins BMP and baseline
JPEG as a REAL pixel format in the multimodal surface — and unlike
JPEG it is LOSSLESS, so encode→decode is bit-exact and every decoded
pixel is closed-form predictable from the synthesis formula (the
q_multimodal_png oracle hashes exact channel means).

Scope (honest): 8-bit depth, color types 0 (gray), 2 (RGB), 6 (RGBA —
alpha dropped on decode to match the RGB feature stages), no
interlacing (Adam7 raises), no palette (type 3 raises), no 16-bit.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(rgb: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as an 8-bit truecolor PNG
    (filter type 0 per row — valid, simple, deterministic)."""
    h, w = rgb.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = b"".join(b"\x00" + rgb[r].tobytes() for r in range(h))
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


_PAETH_VEC = np.vectorize(_paeth, otypes=[np.int32])


def decode_png(data: bytes) -> np.ndarray:
    """Decode a PNG to an (h, w, 3) uint8 RGB array (gray replicated,
    alpha dropped). Raises NotImplementedError for interlaced/palette/
    16-bit streams, ValueError for corrupt data."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    w = h = None
    bit_depth = color_type = interlace = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # len + tag + payload + crc
        if tag == b"IHDR":
            w, h, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", payload)
            )
        elif tag == b"IDAT":
            idat.extend(payload)
        elif tag == b"IEND":
            break
    if w is None:
        raise ValueError("corrupt PNG: no IHDR")
    if bit_depth != 8:
        raise NotImplementedError(f"bit depth {bit_depth} (8 only)")
    if interlace:
        raise NotImplementedError("Adam7 interlacing")
    channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(color_type)
    if channels is None or color_type == 3:
        raise NotImplementedError(f"color type {color_type}")
    raw = zlib.decompress(bytes(idat))
    stride = w * channels
    if len(raw) != h * (stride + 1):
        raise ValueError("corrupt PNG: wrong decompressed length")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for r in range(h):
        ft = raw[r * (stride + 1)]
        row = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=r * (stride + 1) + 1
        ).astype(np.int32)
        if ft == 0:  # None
            cur = row
        elif ft == 2:  # Up
            cur = (row + prev) & 0xFF
        elif ft in (1, 3, 4):  # Sub / Average / Paeth: left-dependent
            cur = np.zeros(stride, dtype=np.int32)
            for i in range(stride):
                a = cur[i - channels] if i >= channels else 0
                b = int(prev[i])
                if ft == 1:
                    v = row[i] + a
                elif ft == 3:
                    v = row[i] + (a + b) // 2
                else:
                    c = int(prev[i - channels]) if i >= channels else 0
                    v = row[i] + _paeth(int(a), b, c)
                cur[i] = v & 0xFF
        else:
            raise ValueError(f"corrupt PNG: filter type {ft}")
        out[r] = cur.astype(np.uint8)
        prev = cur
    px = out.reshape(h, w, channels)
    if channels == 1:
        return np.repeat(px, 3, axis=2)
    if channels == 2:  # gray + alpha
        return np.repeat(px[..., :1], 3, axis=2)
    if channels == 4:
        return px[..., :3].copy()
    return px
