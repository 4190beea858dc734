"""Uncompressed-TIFF pixel codec in pure numpy — public spec (TIFF
6.0, Adobe 1992), no codec libraries.

Baseline TIFF with Compression=1 stores raw sample bytes in strips
located by IFD tags — the pixel path is pure byte math, which makes it
the seventh REAL image format in the multimodal surface (after BMP,
JPEG baseline+progressive, PNG, GIF incl. animation, MJPEG-AVI, Y4M).
Lossless, so every decoded pixel is closed-form predictable from the
synthesis formula (q_multimodal_tiff hashes exact channel means).

Scope: 8-bit samples, Compression=1 (none), PhotometricInterpretation
1 (gray, black-is-zero) and 2 (RGB), one or more strips, both byte
orders, SHORT/LONG tag types, out-of-line value arrays (strip offset/
count lists). LZW/Deflate/JPEG-in-TIFF compression raise honestly —
their pixel paths belong to the dedicated codecs.
"""

from __future__ import annotations

import struct

import numpy as np


def encode_tiff_rgb(rgb: np.ndarray, byte_order: str = "<") -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as an uncompressed TIFF
    (single strip, chunky RGB). ``byte_order``: '<' II little-endian
    or '>' MM big-endian — both decode, so tests cover each."""
    e = byte_order
    h, w = rgb.shape[:2]
    pixels = rgb.tobytes()
    # layout: header(8) + pixel data + BitsPerSample array(6) + IFD
    px_off = 8
    bps_off = px_off + len(pixels)
    ifd_off = bps_off + 6
    entries = [
        (256, 4, 1, w),            # ImageWidth
        (257, 4, 1, h),            # ImageLength
        (258, 3, 3, bps_off),      # BitsPerSample -> offset to [8,8,8]
        (259, 3, 1, 1),            # Compression: none
        (262, 3, 1, 2),            # Photometric: RGB
        (273, 4, 1, px_off),       # StripOffsets
        (277, 3, 1, 3),            # SamplesPerPixel
        (278, 4, 1, h),            # RowsPerStrip: one strip
        (279, 4, 1, len(pixels)),  # StripByteCounts
    ]
    ifd = struct.pack(e + "H", len(entries))
    for tag, typ, cnt, val in entries:
        if typ == 3 and cnt == 1:
            ifd += struct.pack(e + "HHIHH", tag, typ, cnt, val, 0)
        else:
            ifd += struct.pack(e + "HHII", tag, typ, cnt, val)
    ifd += struct.pack(e + "I", 0)
    magic = b"II*\x00" if e == "<" else b"MM\x00*"
    head = magic[:2] + struct.pack(e + "H", 42) + struct.pack(e + "I", ifd_off)
    return head + pixels + struct.pack(e + "HHH", 8, 8, 8) + ifd


def decode_tiff_pixels(data: bytes) -> np.ndarray:
    """Decode an uncompressed baseline TIFF to an (h, w, 3) uint8 RGB
    array (gray replicated). Raises NotImplementedError for compressed
    streams, ValueError for corrupt data."""
    if len(data) < 8:
        raise ValueError("not a TIFF (truncated header)")
    if data[:4] == b"II*\x00":
        e = "<"
    elif data[:4] == b"MM\x00*":
        e = ">"
    else:
        raise ValueError("not a TIFF (bad magic)")
    (ifd_off,) = struct.unpack(e + "I", data[4:8])
    (n_entries,) = struct.unpack(e + "H", data[ifd_off : ifd_off + 2])
    tags: dict[int, tuple[int, int, bytes]] = {}
    for i in range(n_entries):
        base = ifd_off + 2 + 12 * i
        tag, typ, cnt = struct.unpack(e + "HHI", data[base : base + 8])
        tags[tag] = (typ, cnt, data[base + 8 : base + 12])

    def values(tag: int, default=None) -> list[int] | None:
        if tag not in tags:
            return default
        typ, cnt, raw = tags[tag]
        size = {3: 2, 4: 4}.get(typ)
        if size is None:
            raise ValueError(f"corrupt TIFF: tag {tag} type {typ}")
        fmt = e + ("H" if typ == 3 else "I")
        if size * cnt <= 4:  # inline, left-justified
            return [
                struct.unpack(fmt, raw[k * size : (k + 1) * size])[0]
                for k in range(cnt)
            ]
        (off,) = struct.unpack(e + "I", raw)
        return [
            struct.unpack(fmt, data[off + k * size : off + (k + 1) * size])[0]
            for k in range(cnt)
        ]

    w = values(256)
    h = values(257)
    if not w or not h:
        raise ValueError("corrupt TIFF: missing dimensions")
    w, h = w[0], h[0]
    comp = (values(259, [1]) or [1])[0]
    if comp != 1:
        raise NotImplementedError(
            f"TIFF compression {comp} (only 1 = none; LZW/Deflate/JPEG "
            "belong to the dedicated codecs)"
        )
    photometric = (values(262, [1]) or [1])[0]
    spp = (values(277, [1]) or [1])[0]
    bps = values(258, [8]) or [8]
    if any(b != 8 for b in bps):
        raise NotImplementedError(f"TIFF bits-per-sample {bps} (8 only)")
    if photometric not in (1, 2) or spp not in (1, 3):
        raise NotImplementedError(
            f"TIFF photometric {photometric} / {spp} samples"
        )
    offsets = values(273)
    counts = values(279)
    if not offsets or not counts or len(offsets) != len(counts):
        raise ValueError("corrupt TIFF: bad strip tables")
    raw = b"".join(
        data[o : o + c] for o, c in zip(offsets, counts)
    )
    if len(raw) < h * w * spp:
        raise ValueError("corrupt TIFF: truncated strip data")
    px = np.frombuffer(raw, dtype=np.uint8, count=h * w * spp).reshape(
        h, w, spp
    )
    if spp == 1:
        return np.repeat(px, 3, axis=2)
    return px.copy()
