"""EXIF metadata build + parse — pure Python, public spec (EXIF 2.x /
JEITA CP-3451, which embeds a TIFF 6.0 IFD inside a JPEG APP1 segment).

A multimodal curation pipeline's metadata-extraction stage: camera
make, orientation, and capture time live in the APP1 "Exif" segment as
TIFF tags. This module builds spec-correct APP1 payloads (both byte
orders, in-line SHORT values and out-of-line ASCII arrays with even-
offset alignment), injects them after a JPEG's SOI marker, and parses
them back by walking the JPEG segment stream — the same IFD wire
format as operators/tiffcodec.py, here applied to metadata instead of
pixels. Used by q_multimodal_exif, which round-trips synthesized tags
through a REAL injected-then-parsed JPEG and arithmetic-oracles every
field.

Reference engine (KafkaStreamApp.java) has no media path; EXIF closes
the metadata side of the multimodal story next to the pixel decoders.
"""

from __future__ import annotations

import struct

_TAG_MAKE = 0x010F  # ASCII
_TAG_ORIENTATION = 0x0112  # SHORT
_TAG_DATETIME = 0x0132  # ASCII, "YYYY:MM:DD HH:MM:SS" + NUL (20 bytes)


def build_exif_app1(
    orientation: int, make: str, datetime_str: str, byte_order: str = "<"
) -> bytes:
    """Build an APP1 segment (FFE1 + length + "Exif\\0\\0" + TIFF IFD0
    carrying Make / Orientation / DateTime)."""
    if byte_order not in ("<", ">"):
        raise ValueError("byte_order must be '<' or '>'")
    e = byte_order
    make_b = make.encode("ascii") + b"\x00"
    dt_b = datetime_str.encode("ascii") + b"\x00"
    if len(dt_b) != 20:
        raise ValueError("EXIF DateTime must be exactly 19 chars")
    # TIFF body layout: header(8) + count(2) + 3 entries(36) + next(4)
    # = 54, then out-of-line ASCII values (even-aligned per TIFF 6.0)
    off_make = 54
    if off_make % 2:
        off_make += 1
    off_dt = off_make + len(make_b)
    if off_dt % 2:
        off_dt += 1
    tiff = bytearray()
    tiff += (b"II" if e == "<" else b"MM") + struct.pack(e + "HI", 42, 8)
    tiff += struct.pack(e + "H", 3)  # entry count
    # entries must be sorted by tag id (TIFF 6.0 requirement)
    tiff += struct.pack(e + "HHII", _TAG_MAKE, 2, len(make_b), off_make)
    tiff += struct.pack(e + "HHIHH", _TAG_ORIENTATION, 3, 1, orientation, 0)
    tiff += struct.pack(e + "HHII", _TAG_DATETIME, 2, len(dt_b), off_dt)
    tiff += struct.pack(e + "I", 0)  # next IFD
    while len(tiff) < off_make:
        tiff += b"\x00"
    tiff += make_b
    while len(tiff) < off_dt:
        tiff += b"\x00"
    tiff += dt_b
    payload = b"Exif\x00\x00" + bytes(tiff)
    return b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload


def inject_app1(jpeg: bytes, app1: bytes) -> bytes:
    """Insert an APP1 segment immediately after SOI (the spec slot)."""
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    return jpeg[:2] + app1 + jpeg[2:]


def parse_exif(jpeg: bytes) -> dict:
    """Walk the JPEG segment stream to APP1/Exif and parse IFD0.

    Returns {"orientation": int|None, "make": str|None,
    "datetime": str|None, "byte_order": "II"|"MM"|None}; all-None if no
    EXIF segment exists (metadata-less files are data, not errors).
    """
    out = {"orientation": None, "make": None, "datetime": None,
           "byte_order": None}
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    while pos + 4 <= len(jpeg):
        if jpeg[pos] != 0xFF:
            break
        marker = jpeg[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xDA:  # SOS: entropy data follows, no more metadata
            break
        seglen = struct.unpack(">H", jpeg[pos + 2 : pos + 4])[0]
        body = jpeg[pos + 4 : pos + 2 + seglen]
        if marker == 0xE1 and body[:6] == b"Exif\x00\x00":
            _parse_tiff_ifd0(body[6:], out)
            return out
        pos += 2 + seglen
    return out


def _parse_tiff_ifd0(t: bytes, out: dict) -> None:
    order = t[:2]
    if order == b"II":
        e = "<"
    elif order == b"MM":
        e = ">"
    else:
        raise ValueError("bad TIFF byte order in EXIF")
    out["byte_order"] = order.decode()
    magic, ifd_off = struct.unpack(e + "HI", t[2:8])
    if magic != 42:
        raise ValueError("bad TIFF magic in EXIF")
    n = struct.unpack(e + "H", t[ifd_off : ifd_off + 2])[0]
    for i in range(n):
        base = ifd_off + 2 + 12 * i
        tag, typ, cnt = struct.unpack(e + "HHI", t[base : base + 8])
        raw = t[base + 8 : base + 12]
        if tag == _TAG_ORIENTATION and typ == 3:
            out["orientation"] = struct.unpack(e + "H", raw[:2])[0]
        elif tag in (_TAG_MAKE, _TAG_DATETIME) and typ == 2:
            if cnt <= 4:
                val = raw[:cnt]
            else:
                off = struct.unpack(e + "I", raw)[0]
                val = t[off : off + cnt]
            s = val.split(b"\x00")[0].decode("ascii", "replace")
            out["make" if tag == _TAG_MAKE else "datetime"] = s
