"""QOI ("Quite OK Image") codec — pure-Python, public spec.

Implements the complete QOI format (qoiformat.org, CC0 one-page spec):
all six chunk ops — RUN, INDEX (the 64-slot rolling hash table), DIFF
(2-bit channel deltas), LUMA (green-anchored deltas), RGB, RGBA — the
14-byte big-endian header and the 8-byte end marker. QOI is lossless,
so the decode side of a synthesized payload is fully predictable from
the synthesis formula, which is what makes it arithmetic-oracle-able
(same contract as the PNG/GIF codecs in pngcodec.py/gifcodec.py).

The reference engine (KafkaStreamApp.java) has no binary-media path at
all; this extends the multimodal column story with the one modern
lossless format simple enough to implement end to end with zero
dependencies. Per-image Python loops are fine: images ride inside
Arrow-batched mapInPandas, so the cluster parallelism is across rows,
never inside one image.
"""

from __future__ import annotations

import struct

import numpy as np

_MAGIC = b"qoif"
_END = b"\x00" * 7 + b"\x01"


def _hash(r: int, g: int, b: int, a: int) -> int:
    return (r * 3 + g * 5 + b * 7 + a * 11) % 64


def encode_qoi(img: np.ndarray) -> bytes:
    """Encode an (H, W, 3) uint8 array as a QOI file (3-channel,
    sRGB-with-linear-alpha colorspace byte 0)."""
    if img.ndim != 3 or img.shape[2] != 3 or img.dtype != np.uint8:
        raise ValueError("encode_qoi expects (H, W, 3) uint8")
    h, w, _ = img.shape
    out = bytearray()
    out += _MAGIC + struct.pack(">IIBB", w, h, 3, 0)
    index = [(0, 0, 0, 0)] * 64
    pr, pg, pb, pa = 0, 0, 0, 255
    run = 0
    flat = img.reshape(-1, 3)
    for r, g, b in flat.tolist():
        if (r, g, b) == (pr, pg, pb):
            run += 1
            if run == 62:
                out.append(0xC0 | (run - 1))
                run = 0
            continue
        if run:
            out.append(0xC0 | (run - 1))
            run = 0
        idx = _hash(r, g, b, 255)
        if index[idx] == (r, g, b, 255):
            out.append(idx)
        else:
            index[idx] = (r, g, b, 255)
            dr = (r - pr + 128) % 256 - 128
            dg = (g - pg + 128) % 256 - 128
            db = (b - pb + 128) % 256 - 128
            if -2 <= dr <= 1 and -2 <= dg <= 1 and -2 <= db <= 1:
                out.append(0x40 | ((dr + 2) << 4) | ((dg + 2) << 2) | (db + 2))
            elif (
                -32 <= dg <= 31
                and -8 <= dr - dg <= 7
                and -8 <= db - dg <= 7
            ):
                out.append(0x80 | (dg + 32))
                out.append(((dr - dg + 8) << 4) | (db - dg + 8))
            else:
                out += bytes((0xFE, r, g, b))
        pr, pg, pb = r, g, b
    if run:
        out.append(0xC0 | (run - 1))
    out += _END
    return bytes(out)


def decode_qoi(data: bytes) -> np.ndarray:
    """Decode a QOI file to an (H, W, 3) uint8 array (alpha dropped
    for 4-channel files; QOI is lossless so RGB round-trips exactly)."""
    if data[:4] != _MAGIC:
        raise ValueError("not a QOI file (bad magic)")
    w, h, channels, _cs = struct.unpack(">IIBB", data[4:14])
    if channels not in (3, 4):
        raise ValueError(f"QOI channels must be 3 or 4, got {channels}")
    n = w * h
    px = np.empty((n, 4), dtype=np.uint8)
    index = [(0, 0, 0, 0)] * 64
    r, g, b, a = 0, 0, 0, 255
    pos, i = 14, 0
    end = len(data) - 8
    while i < n and pos < end:
        byte = data[pos]
        pos += 1
        if byte == 0xFE:  # QOI_OP_RGB
            r, g, b = data[pos], data[pos + 1], data[pos + 2]
            pos += 3
        elif byte == 0xFF:  # QOI_OP_RGBA
            r, g, b, a = data[pos], data[pos + 1], data[pos + 2], data[pos + 3]
            pos += 4
        else:
            tag = byte >> 6
            if tag == 0:  # QOI_OP_INDEX
                r, g, b, a = index[byte & 0x3F]
            elif tag == 1:  # QOI_OP_DIFF
                r = (r + ((byte >> 4) & 3) - 2) % 256
                g = (g + ((byte >> 2) & 3) - 2) % 256
                b = (b + (byte & 3) - 2) % 256
            elif tag == 2:  # QOI_OP_LUMA
                dg = (byte & 0x3F) - 32
                b2 = data[pos]
                pos += 1
                r = (r + dg + ((b2 >> 4) & 0x0F) - 8) % 256
                g = (g + dg) % 256
                b = (b + dg + (b2 & 0x0F) - 8) % 256
            else:  # QOI_OP_RUN
                run = (byte & 0x3F) + 1
                px[i : i + run] = (r, g, b, a)
                i += run
                continue
        index[_hash(r, g, b, a)] = (r, g, b, a)
        px[i] = (r, g, b, a)
        i += 1
    if i != n:
        raise ValueError(f"QOI truncated: decoded {i} of {n} pixels")
    return px[:, :3].reshape(h, w, 3)
