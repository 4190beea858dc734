"""G.711 µ-law / A-law audio codec in pure numpy — public ITU-T
G.711 spec, no codec libraries.

The telephony companding codecs: 8-bit logarithmic samples expanding
to 13/14-bit linear PCM. Both directions are closed-form INTEGER
bit arithmetic per byte — no tables read from files, no float — which
makes decoded sample sums exactly reproducible in SQL: the third real
compressed-audio surface (after IMA ADPCM and PCM WAV), and the one
whose full decode the oracle can replay as a per-byte integer
expression.

µ-law decode (G.711 table equivalent):
    u = ~b & 0xFF; exp = (u >> 4) & 7; mant = u & 0xF
    mag = (((mant << 3) + 0x84) << exp) - 0x84      # 0..32124
    sample = -mag if (u & 0x80) else mag
A-law decode (even bits inverted on the wire):
    a = b ^ 0x55; exp = (a >> 4) & 7; mant = a & 0xF
    mag = (mant << 4) + 8           if exp == 0
        = ((mant << 4) + 0x108) << (exp - 1)  otherwise   # 8..32256
    sample = -mag if (a & 0x80) == 0 else mag
"""

from __future__ import annotations

import numpy as np


def ulaw_decode(data: bytes | np.ndarray) -> np.ndarray:
    """µ-law bytes → int16 linear samples (exact G.711 expansion)."""
    b = np.frombuffer(bytes(data), dtype=np.uint8) if isinstance(
        data, (bytes, bytearray)
    ) else np.asarray(data, dtype=np.uint8)
    u = (~b) & 0xFF
    exp = (u >> 4) & 0x07
    mant = u & 0x0F
    mag = ((((mant.astype(np.int32) << 3) + 0x84) << exp) - 0x84)
    return np.where(u & 0x80, -mag, mag).astype(np.int16)


def ulaw_encode(samples: np.ndarray) -> np.ndarray:
    """int16 linear samples → µ-law bytes (segment search, bias 0x84,
    clip at 0x7FFB per the spec)."""
    x = np.asarray(samples, dtype=np.int32)
    sign = np.where(x < 0, 0x80, 0)
    mag = np.minimum(np.abs(x), 32635) + 0x84
    exp = (np.floor(np.log2(mag)) - 7).astype(np.int32)
    exp = np.clip(exp, 0, 7)
    mant = (mag >> (exp + 3)) & 0x0F
    return ((~(sign | (exp << 4) | mant)) & 0xFF).astype(np.uint8)


def alaw_decode(data: bytes | np.ndarray) -> np.ndarray:
    """A-law bytes → int16 linear samples (exact G.711 expansion)."""
    b = np.frombuffer(bytes(data), dtype=np.uint8) if isinstance(
        data, (bytes, bytearray)
    ) else np.asarray(data, dtype=np.uint8)
    a = b ^ 0x55
    exp = (a >> 4) & 0x07
    mant = (a & 0x0F).astype(np.int32)
    mag = np.where(
        exp == 0,
        (mant << 4) + 8,
        ((mant << 4) + 0x108) << np.maximum(exp - 1, 0),
    )
    return np.where(a & 0x80, mag, -mag).astype(np.int16)


def alaw_encode(samples: np.ndarray) -> np.ndarray:
    """int16 linear samples → A-law bytes."""
    x = np.asarray(samples, dtype=np.int32)
    sign = np.where(x >= 0, 0x80, 0)
    mag = np.minimum(np.abs(x), 32767)
    exp = np.zeros_like(mag)
    m = mag >> 4
    for e in range(1, 8):  # segment of the magnitude's top bit
        exp = np.where(m >= (1 << (e + 3)), e, exp)
    mant = np.where(exp == 0, mag >> 4, (mag >> (exp + 3)) & 0x0F)
    return (((sign | (exp << 4) | mant) ^ 0x55) & 0xFF).astype(np.uint8)
