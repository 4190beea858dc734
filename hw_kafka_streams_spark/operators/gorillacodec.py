"""Gorilla time-series block compression — pure Python/numpy.

The storage format of Facebook's in-memory TSDB (Pelkonen et al.,
"Gorilla: A Fast, Scalable, In-Memory Time Series Database", VLDB
2015) and, descended from it, the Prometheus/InfluxDB chunk encoders —
THE published way a metrics store holds (timestamp, value) streams:

- **Timestamps**: delta-of-delta coding. The first timestamp is raw
  64-bit, the first delta raw 64-bit zigzag; every later
  delta-of-delta takes a variable-width bucket: ``0`` when zero (the
  overwhelmingly common regular-cadence case), ``10``+7 bits,
  ``110``+9 bits, ``1110``+12 bits (the paper's buckets), else
  ``1111``+64-bit zigzag — widened from the paper's 32-bit fallback
  because these streams carry MICROsecond resolution, not seconds
  (documented deviation, same bucket structure).
- **Values**: XOR coding. Each float64 XORs against its predecessor;
  zero XOR writes a single ``0`` bit; otherwise ``10`` reuses the
  previous (leading-zeros, meaningful-length) window when the new
  XOR fits inside it, and ``11`` + 5-bit leading-zero count + 6-bit
  meaningful length (64 wraps to 0, per the paper) opens a new
  window. Bit-exact for every float64 payload including negatives
  and subnormals (NaN payloads roundtrip bit-exactly too — XOR never
  interprets the value).

Why it belongs in this engine: a 100 TB event store keeps its hot
tail in exactly these blocks; the operator compresses each
(series key)-partitioned, time-ordered chunk independently inside
``applyInPandas`` — blocks never cross executors, merge/append is
per-chunk, and the decode side proves losslessness, which is what
makes the registry query (q_gorilla_ts_blocks) SQL-oracle-able: the
decoded stream's exact integer aggregates must equal the oracle's
aggregates over the raw table.
"""

from __future__ import annotations

import struct

import numpy as np

from hw_kafka_streams_spark.operators.mcvideo import _BitReader, _BitWriter

_MAGIC = b"GOR1"


def half_away_int64(x: np.ndarray) -> np.ndarray:
    """Half-AWAY-from-zero round to int64, bit-matching C++/DuckDB
    ``std::round`` on every double. ``floor(x + 0.5)`` is wrong on
    doubles where the ``+0.5`` addition carries
    (``floor(0.49999999999999994 + 0.5) == 1``; ``std::round`` gives
    0). ``frac = x - trunc(x)`` is EXACT for all doubles (Sterbenz
    lemma for |x| >= 1, trivially exact below 1), so the half-point
    compare decides the tie on the true value (ADVICE r8)."""
    whole = np.trunc(x)
    frac = x - whole
    return (whole + np.where(np.abs(frac) >= 0.5, np.sign(x), 0.0)).astype(
        np.int64
    )


def _zz(v: int) -> int:
    return (v << 1) ^ (v >> 63) if v < 0 else v << 1


def _unzz(u: int) -> int:
    return -(u + 1 >> 1) if u & 1 else u >> 1


def encode_gorilla(ts: np.ndarray, values: np.ndarray) -> bytes:
    """Encode parallel int64 timestamps (must be non-decreasing) and
    float64 values into one Gorilla block."""
    ts = np.asarray(ts, np.int64)
    values = np.asarray(values, np.float64)
    if ts.ndim != 1 or ts.shape != values.shape:
        raise ValueError("expects parallel 1-D timestamp/value arrays")
    n = len(ts)
    # Monotonicity is checked inside the encode loop on exact Python
    # ints — np.diff wraps on int64 overflow (span >= 2^63) and would
    # both mis-report order and mask the zigzag-width guard below.
    out = bytearray(_MAGIC)
    out += struct.pack(">I", n)
    if n == 0:
        return bytes(out)
    bw = _BitWriter()
    bits = values.view(np.uint64)
    # first point: raw
    bw.write(int(ts[0]) & ((1 << 64) - 1), 64)
    bw.write(int(bits[0]), 64)
    prev_delta = 0
    prev_lz, prev_mlen = -1, -1  # no value window open yet
    for i in range(1, n):
        delta = int(ts[i]) - int(ts[i - 1])
        if delta < 0:
            raise ValueError("timestamps must be non-decreasing")
        if i == 1:
            zd = _zz(delta)
            if zd >= 1 << 64:
                raise ValueError(
                    "timestamp delta exceeds the 64-bit zigzag field"
                )
            bw.write(zd, 64)
        else:
            dod = delta - prev_delta
            if dod == 0:
                bw.write(0, 1)
            elif -63 <= dod <= 64:
                bw.write(0b10, 2)
                bw.write(dod + 63, 7)
            elif -255 <= dod <= 256:
                bw.write(0b110, 3)
                bw.write(dod + 255, 9)
            elif -2047 <= dod <= 2048:
                bw.write(0b1110, 4)
                bw.write(dod + 2047, 12)
            else:
                zdod = _zz(dod)
                if zdod >= 1 << 64:
                    raise ValueError(
                        "delta-of-delta exceeds the 64-bit zigzag field"
                    )
                bw.write(0b1111, 4)
                bw.write(zdod, 64)
        prev_delta = delta
        x = int(bits[i] ^ bits[i - 1])
        if x == 0:
            bw.write(0, 1)
            continue
        lz = 64 - x.bit_length()
        tz = (x & -x).bit_length() - 1
        mlen = 64 - lz - tz
        if (
            prev_mlen > 0
            and lz >= prev_lz
            and tz >= 64 - prev_lz - prev_mlen
        ):
            # fits the open window: control '10', reuse its shape
            bw.write(0b10, 2)
            bw.write(x >> (64 - prev_lz - prev_mlen), prev_mlen)
        else:
            lz = min(lz, 31)  # 5-bit field
            mlen = 64 - lz - tz
            bw.write(0b11, 2)
            bw.write(lz, 5)
            bw.write(mlen & 0x3F, 6)  # 64 wraps to 0 (paper convention)
            bw.write(x >> tz, mlen)
            prev_lz, prev_mlen = lz, mlen
    bw.flush()
    out += bw.out
    return bytes(out)


def decode_gorilla(data: bytes) -> tuple[np.ndarray, np.ndarray]:
    """Decode a Gorilla block back to (timestamps int64, values
    float64) — bit-exact."""
    if data[:4] != _MAGIC:
        raise ValueError("not a Gorilla block")
    (n,) = struct.unpack(">I", data[4:8])
    ts = np.empty(n, np.int64)
    vals = np.empty(n, np.uint64)
    if n == 0:
        return ts, vals.view(np.float64)
    br = _BitReader(data, 8)
    t = br.bits(64)
    ts[0] = t - (1 << 64) if t >= 1 << 63 else t
    vals[0] = br.bits(64)
    prev_delta = 0
    prev_lz, prev_mlen = -1, -1
    for i in range(1, n):
        if i == 1:
            delta = _unzz(br.bits(64))
        else:
            if br.bits(1) == 0:
                dod = 0
            elif br.bits(1) == 0:
                dod = br.bits(7) - 63
            elif br.bits(1) == 0:
                dod = br.bits(9) - 255
            elif br.bits(1) == 0:
                dod = br.bits(12) - 2047
            else:
                dod = _unzz(br.bits(64))
            delta = prev_delta + dod
        ts[i] = ts[i - 1] + delta
        prev_delta = delta
        if br.bits(1) == 0:
            vals[i] = vals[i - 1]
            continue
        if br.bits(1) == 0:  # '10': reuse window
            if prev_mlen <= 0:
                raise ValueError("corrupt block: window reuse before open")
            m = br.bits(prev_mlen)
            x = m << (64 - prev_lz - prev_mlen)
        else:  # '11': new window
            lz = br.bits(5)
            mlen = br.bits(6) or 64
            m = br.bits(mlen)
            x = m << (64 - lz - mlen)
            prev_lz, prev_mlen = lz, mlen
        vals[i] = np.uint64((int(vals[i - 1]) ^ x) & ((1 << 64) - 1))
    return ts, vals.view(np.float64)


def gorilla_block_stats(df, ts_col: str = "ts", val_col: str = "value",
                        key_col: str = "event_type", id_col: str = "event_id"):
    """Per-series Gorilla chunk build + verified decode: each series
    (key group) is time-ordered (id tie-break for determinism),
    compressed into ONE block, decoded back, and reduced to exact
    integer aggregates over the DECODED stream — so the returned row
    proves the lossless cycle, and block size is reported for the
    compression story. ``applyInPandas`` keyed by series: chunks never
    cross executors, the TSDB ingest shape."""
    import pandas as pd

    from pyspark.sql import functions as F

    def work(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([ts_col, id_col])
        ts = pdf[ts_col].astype("int64").to_numpy()
        vs = pdf[val_col].astype("float64").to_numpy()
        block = encode_gorilla(ts, vs)
        dts, dvs = decode_gorilla(block)
        if not np.array_equal(dts, ts):
            raise ValueError("gorilla timestamp cycle not exact")
        if not np.array_equal(dvs.view(np.uint64), vs.view(np.uint64)):
            raise ValueError("gorilla value cycle not bit-exact")
        # Half-AWAY-from-zero via the carry-immune helper, matching the
        # DuckDB oracle's round(); np.round is banker's (half-to-even)
        # and is forbidden on oracled paths (same policy as
        # jpegcodec.py / llm_q.py).
        cents = half_away_int64(dvs * 100)
        return pd.DataFrame(
            {
                key_col: [pdf[key_col].iloc[0]],
                "n_points": [len(dts)],
                "sum_cents": [int(cents.sum())],
                "ts_min_us": [int(dts.min())],
                "ts_max_us": [int(dts.max())],
                "block_bytes": [len(block)],
            }
        )

    src = df.select(
        key_col,
        F.col(id_col),
        F.unix_micros(F.col(ts_col)).alias(ts_col),
        F.col(val_col),
    )
    return src.groupBy(key_col).applyInPandas(
        work,
        schema=f"{key_col} string, n_points long, sum_cents long, "
        "ts_min_us long, ts_max_us long, block_bytes long",
    )
