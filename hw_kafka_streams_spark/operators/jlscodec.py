"""JPEG-LS (ITU-T T.87, LOCO-I) lossless image codec — pure numpy/int.

Closes the context-adaptive entropy-coding slot of the codec story
(reference parity note: the reference app — KafkaStreamApp.java — has no
media surface at all; this module is north-star multimodal coverage).
Baseline/progressive/lossless-Huffman JPEG live in
``operators/jpegcodec.py``; JPEG-LS is the OTHER still-image standard of
the JPEG family, built not on Huffman tables but on per-context adaptive
Golomb coding with online bias cancellation (Weinberger, Seroussi &
Sapiro, "LOCO-I: A Low Complexity, Context-Based, Lossless Image
Compression Algorithm", HP Labs / IEEE Trans. Image Processing 2000) —
the published precursor of CALIC-class context modeling and the
standard codec of DICOM medical imaging.

Implemented from the public T.87 decoding/encoding procedures:

- MED/GAP prediction (min/max/plane switch on the c corner sample);
- 365 regular-mode contexts: gradients (Rd-Rb, Rb-Rc, Rc-Ra) quantized
  by thresholds T1/T2/T3 into 9 levels each, sign-folded;
- per-context state (A, B, C, N): Golomb parameter k from A/N, online
  bias correction C with B-driven hysteresis, RESET halving;
- limited-length Golomb coding LG(k, LIMIT) with the qbpp escape;
- run mode (flat-region detector): J-table block run lengths with
  adaptive RUNindex, plus the two run-interruption contexts (365/366)
  and their Nn sign statistics;
- T.87 bit-stuffing (a 0 bit is inserted after every 0xFF byte so no
  marker can appear in entropy data) and the SOF55/SOS marker frame.

Scope gates (honest, like flaccodec's): precision 8-16 (the
default-threshold formula below is the MAXVAL>=128 branch of the
spec; sub-8-bit thresholds differ), default T1/T2/T3/RESET only (so
no LSE segment is emitted), and NON-INTERLEAVED multi-component
layout only (ILV=0, one scan per component — the line/sample
interleaved modes ILV 1/2 are the remaining layout gate). NEAR-lossless mode (NEAR > 0) IS
implemented: errors quantize onto the 2*NEAR+1 grid, both sides run
the context machinery over the reconstructed plane, and every decoded
sample is within +/-NEAR of the source (hypothesis-enforced). Interop against an
independent T.87 decoder is untested in this container (none
available); self-consistency is hypothesis-verified end to end in
tests/test_properties.py, the same determinism contract as the FLAC and
QOI codecs here.
"""

from __future__ import annotations

import struct

import numpy as np

_J = [
    0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 2, 2, 3, 3, 3, 3,
    4, 4, 5, 5, 6, 6, 7, 7, 8, 9, 10, 11, 12, 13, 14, 15,
]
_RESET = 64
_MIN_C, _MAX_C = -128, 127

_SOI = b"\xff\xd8"
_EOI = b"\xff\xd9"
_SOF55 = b"\xff\xf7"
_SOS = b"\xff\xda"


def _default_thresholds(maxval: int, near: int) -> tuple[int, int, int]:
    """T.87 default T1/T2/T3 — MAXVAL>=128 branch (C.2.4.1.1.1), with
    the spec's NEAR-dependent widening. For MAXVAL=255, NEAR=0 this
    yields the canonical (3, 7, 21)."""
    if maxval < 128:
        raise NotImplementedError(
            "JPEG-LS precision < 8 bits (MAXVAL < 128) unsupported: the "
            "small-MAXVAL default-threshold branch is not implemented"
        )
    factor = (min(maxval, 4095) + 128) // 256
    t1 = min(max(factor * (3 - 2) + 2 + 3 * near, near + 1), maxval)
    t2 = min(max(factor * (7 - 3) + 3 + 5 * near, t1), maxval)
    t3 = min(max(factor * (21 - 4) + 4 + 7 * near, t2), maxval)
    return t1, t2, t3


class _State:
    """Shared encoder/decoder context state (T.87 A.2.1 init).

    ``near`` > 0 switches to NEAR-LOSSLESS mode: prediction errors are
    quantized onto the 2*NEAR+1 grid (every reconstructed sample is
    within +/-NEAR of the original), RANGE shrinks accordingly, the
    gradient thresholds widen, and — crucially — BOTH sides run the
    context machinery over the RECONSTRUCTED plane, never the source,
    so encoder and decoder state stays in lockstep."""

    def __init__(self, maxval: int, near: int = 0):
        if not 0 <= near <= maxval // 2:
            raise ValueError("NEAR must be in 0..MAXVAL/2")
        self.near = near
        self.q_step = 2 * near + 1
        self.range = (maxval + 2 * near) // self.q_step + 1
        self.maxval = maxval
        self.qbpp = max(2, (self.range - 1).bit_length())
        self.bpp = max(2, (maxval).bit_length())
        self.limit = 2 * (self.bpp + max(8, self.bpp))
        init_a = max(2, (self.range + 32) // 64)
        # 365 regular contexts + 2 run-interruption contexts (365, 366)
        self.A = [init_a] * 367
        self.B = [0] * 365
        self.C = [0] * 365
        self.N = [1] * 367
        self.Nn = [0, 0]  # sign stats for contexts 365/366
        self.t1, self.t2, self.t3 = _default_thresholds(maxval, near)
        self.run_index = 0

    def quantize(self, d: int) -> int:
        if d <= -self.t3:
            return -4
        if d <= -self.t2:
            return -3
        if d <= -self.t1:
            return -2
        if d < -self.near:
            return -1
        if d <= self.near:
            return 0
        if d < self.t1:
            return 1
        if d < self.t2:
            return 2
        if d < self.t3:
            return 3
        return 4

    def quantize_error(self, errval: int) -> int:
        """A.4.4: fold the raw error onto the 2*NEAR+1 grid."""
        if self.near == 0:
            return errval
        if errval > 0:
            return (self.near + errval) // self.q_step
        return -((self.near - errval) // self.q_step)

    def reconstruct(self, pred: int, signed_qerr: int) -> int:
        """A.4.5 + A.8: dequantize, wrap into the legal interval, clamp."""
        rx = pred + signed_qerr * self.q_step
        if rx < -self.near:
            rx += self.range * self.q_step
        elif rx > self.maxval + self.near:
            rx -= self.range * self.q_step
        return min(max(rx, 0), self.maxval)

    def golomb_k(self, q: int, temp: int) -> int:
        k = 0
        while (self.N[q] << k) < temp and k < 32:
            k += 1
        return k

    def update_regular(self, q: int, errval: int) -> None:
        self.B[q] += errval * self.q_step
        self.A[q] += abs(errval)
        if self.N[q] == _RESET:
            self.A[q] >>= 1
            b = self.B[q]
            self.B[q] = b >> 1 if b >= 0 else -((1 - b) >> 1)
            self.N[q] >>= 1
        self.N[q] += 1
        # bias hysteresis (A.6.2)
        if self.B[q] <= -self.N[q]:
            self.B[q] += self.N[q]
            if self.C[q] > _MIN_C:
                self.C[q] -= 1
            if self.B[q] <= -self.N[q]:
                self.B[q] = -self.N[q] + 1
        elif self.B[q] > 0:
            self.B[q] -= self.N[q]
            if self.C[q] < _MAX_C:
                self.C[q] += 1
            if self.B[q] > 0:
                self.B[q] = 0


def _med_predict(a: int, b: int, c: int) -> int:
    if c >= max(a, b):
        return min(a, b)
    if c <= min(a, b):
        return max(a, b)
    return a + b - c


class _StuffWriter:
    """MSB-first bit writer with T.87 marker-avoidance stuffing: after
    an emitted 0xFF byte the next byte carries only 7 payload bits."""

    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0  # bits in acc
        self._cap = 8

    def _cap_now(self) -> int:
        return 7 if self.out and self.out[-1] == 0xFF else 8

    def write(self, value: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self._acc = (self._acc << 1) | ((value >> i) & 1)
            self._n += 1
            if self._n == self._cap:
                self.out.append(self._acc)
                self._acc = 0
                self._n = 0
                self._cap = self._cap_now()

    def write_unary(self, n_zero: int) -> None:
        """``n_zero`` 0-bits then a 1-bit (the T.87 unary prefix)."""
        for _ in range(n_zero):
            self.write(0, 1)
        self.write(1, 1)

    def flush(self) -> None:
        if self._n:
            self.out.append(self._acc << (self._cap - self._n))
            self._acc = 0
            self._n = 0
            self._cap = self._cap_now()


class _StuffReader:
    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self._acc = 0
        self._n = 0
        self._prev_ff = False

    def _fill(self) -> None:
        b = self.data[self.pos]
        self.pos += 1
        if self._prev_ff:
            self._acc = (self._acc << 7) | (b & 0x7F)
            self._n += 7
        else:
            self._acc = (self._acc << 8) | b
            self._n += 8
        self._prev_ff = b == 0xFF

    def bit(self) -> int:
        if self._n == 0:
            self._fill()
        self._n -= 1
        return (self._acc >> self._n) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def unary(self) -> int:
        n = 0
        while self.bit() == 0:
            n += 1
        return n


def _lg_encode(bw: _StuffWriter, merr: int, k: int, limit: int, qbpp: int) -> None:
    """Limited-length Golomb LG(k, limit) (A.5.3)."""
    hi = merr >> k
    if hi < limit - qbpp - 1:
        bw.write_unary(hi)
        if k:
            bw.write(merr & ((1 << k) - 1), k)
    else:
        bw.write_unary(limit - qbpp - 1)
        bw.write(merr - 1, qbpp)


def _lg_decode(br: _StuffReader, k: int, limit: int, qbpp: int) -> int:
    hi = br.unary()
    if hi < limit - qbpp - 1:
        return (hi << k) | (br.bits(k) if k else 0)
    return br.bits(qbpp) + 1


def _neighbors(px: np.ndarray, r: int, c: int, w: int) -> tuple[int, int, int, int]:
    """Reconstructed a/b/c/d with T.87 edge conventions: first line
    b=c=d=0; first column Ra=Rb and Rc = previous line's first-column
    Rb; last column Rd=Rb."""
    if r == 0:
        b = cc = d = 0
        a = int(px[0, c - 1]) if c > 0 else 0
        return a, b, cc, d
    b = int(px[r - 1, c])
    d = int(px[r - 1, c + 1]) if c + 1 < w else b
    if c == 0:
        a = b
        cc = int(px[r - 2, 0]) if r >= 2 else 0
    else:
        a = int(px[r, c - 1])
        cc = int(px[r - 1, c - 1])
    return a, b, cc, d


def encode_jls(
    img: np.ndarray, precision: int | None = None, near: int = 0
) -> bytes:
    """Encode a gray (2-D) or multi-component (h, w, ncomp<=4) array
    as a JPEG-LS stream (SOF55, default thresholds, no LSE segment).
    Multi-component images use the spec's NON-INTERLEAVED layout
    (ILV=0): one SOS + complete scan per component, coder state
    reinitialized per scan. ``near`` > 0 selects NEAR-LOSSLESS mode:
    every reconstructed sample is within +/-``near`` of the input
    (T.87 A.4.4/A.4.5 quantization, the context machinery running
    over the reconstructed plane on both sides)."""
    if img.ndim == 2:
        planes = [img]
    elif img.ndim == 3 and 1 <= img.shape[2] <= 4:
        planes = [img[:, :, i] for i in range(img.shape[2])]
    else:
        raise ValueError("encode_jls expects (h, w) or (h, w, ncomp<=4)")
    if precision is None:
        precision = 8 if img.dtype == np.uint8 else 16
    if not 8 <= precision <= 16:
        raise NotImplementedError("JPEG-LS precision must be 8-16 here")
    maxval = (1 << precision) - 1
    if int(img.min()) < 0 or int(img.max()) > maxval:
        raise ValueError(f"sample out of range for {precision}-bit")
    h, w = planes[0].shape
    out = bytearray(_SOI)
    comp_spec = b"".join(
        bytes([ci + 1, 0x11, 0]) for ci in range(len(planes))
    )
    sof = struct.pack(">BHHB", precision, h, w, len(planes)) + comp_spec
    out += _SOF55 + struct.pack(">H", 2 + len(sof)) + sof
    for ci, plane in enumerate(planes):
        # SOS: 1 component per scan (non-interleaved), mapping table 0
        sos = bytes([1, ci + 1, 0x00, near, 0, 0x00])
        out += _SOS + struct.pack(">H", 2 + len(sos)) + sos
        out += _encode_plane(plane.astype(np.int64), maxval, near)
    out += _EOI
    return bytes(out)


def _encode_plane(px: np.ndarray, maxval: int, near: int) -> bytes:
    """One complete single-component scan (fresh coder state)."""
    h, w = px.shape
    st = _State(maxval, near)
    bw = _StuffWriter()
    # context/prediction state reads the RECONSTRUCTED plane (== the
    # source when near == 0) so the decoder can replay it exactly
    rec = np.zeros((h, w), np.int64)

    for r in range(h):
        c = 0
        while c < w:
            a, b, cc, d = _neighbors(rec, r, c, w)
            d1, d2, d3 = d - b, b - cc, cc - a
            if st.quantize(d1) == 0 and st.quantize(d2) == 0 \
                    and st.quantize(d3) == 0:
                c = _encode_run(bw, st, px, rec, r, c, w, a)
                continue
            q1, q2, q3 = st.quantize(d1), st.quantize(d2), st.quantize(d3)
            if q1 < 0 or (q1 == 0 and q2 < 0) or (q1 == 0 and q2 == 0 and q3 < 0):
                sign = -1
                q1, q2, q3 = -q1, -q2, -q3
            else:
                sign = 1
            q = 81 * q1 + 9 * q2 + q3
            pred = _med_predict(a, b, cc)
            pred += sign * st.C[q]
            pred = min(max(pred, 0), maxval)
            errval = int(px[r, c]) - pred
            if sign < 0:
                errval = -errval
            errval = st.quantize_error(errval)
            if errval < 0:
                errval += st.range
            if errval >= (st.range + 1) // 2:
                errval -= st.range
            rec[r, c] = st.reconstruct(
                pred, errval if sign > 0 else -errval
            )
            k = st.golomb_k(q, st.A[q])
            if k == 0 and 2 * st.B[q] <= -st.N[q]:
                merr = 2 * errval + 1 if errval >= 0 else -2 * (errval + 1)
            else:
                merr = 2 * errval if errval >= 0 else -2 * errval - 1
            _lg_encode(bw, merr, k, st.limit, st.qbpp)
            st.update_regular(q, errval)
            c += 1
    bw.flush()
    return bytes(bw.out)


def _encode_run(bw, st, px, rec, r, c, w, a) -> int:
    """Run mode (A.7): count the run of Ra (within +/-NEAR for
    near-lossless — run samples RECONSTRUCT to the run value), emit
    J-table blocks, then the interruption sample unless the line
    ended. Returns next col."""
    runval = a
    start = c
    while c < w and abs(int(px[r, c]) - runval) <= st.near:
        c += 1
    rec[r, start:c] = runval
    runcnt = c - start
    while runcnt >= (1 << _J[st.run_index]):
        bw.write(1, 1)
        runcnt -= 1 << _J[st.run_index]
        if st.run_index < 31:
            st.run_index += 1
    if c >= w:
        if runcnt > 0:
            bw.write(1, 1)
        return c
    bw.write(0, 1)
    if _J[st.run_index]:
        bw.write(runcnt, _J[st.run_index])
    glimit = st.limit - _J[st.run_index] - 1
    if st.run_index > 0:
        st.run_index -= 1
    # run interruption sample
    _, rb, _, _ = _neighbors(rec, r, c, w)
    ritype = 1 if abs(runval - rb) <= st.near else 0
    pred = runval if ritype else rb
    errval = int(px[r, c]) - pred
    sign = -1 if (ritype == 0 and runval > rb) else 1
    if sign < 0:
        errval = -errval
    errval = st.quantize_error(errval)
    if errval < 0:
        errval += st.range
    if errval >= (st.range + 1) // 2:
        errval -= st.range
    rec[r, c] = st.reconstruct(pred, errval if sign > 0 else -errval)
    q = 365 + ritype
    temp = st.A[q] + (st.N[q] >> 1) if ritype else st.A[q]
    k = st.golomb_k(q, temp)
    nn = st.Nn[ritype]
    if errval > 0 and k == 0 and 2 * nn < st.N[q]:
        emap = 1
    elif errval < 0 and (k != 0 or 2 * nn >= st.N[q]):
        emap = 1
    else:
        emap = 0
    emerr = 2 * abs(errval) - ritype - emap
    _lg_encode(bw, emerr, k, glimit, st.qbpp)
    if errval < 0:
        st.Nn[ritype] += 1
    st.A[q] += (emerr + 1 - ritype) >> 1
    if st.N[q] == _RESET:
        st.A[q] >>= 1
        st.N[q] >>= 1
        st.Nn[ritype] >>= 1
    st.N[q] += 1
    return c + 1


def decode_jls(data: bytes) -> tuple[np.ndarray, int]:
    """Decode a JPEG-LS stream produced by :func:`encode_jls`.
    Returns ``(plane_or_stack, precision)`` — a 2-D array for gray,
    (h, w, ncomp) for multi-component (one non-interleaved scan per
    component; T.87 bit-stuffing guarantees no marker byte pair can
    occur inside entropy data, so the next SOS is found by scanning
    forward from the end of the decoded scan)."""
    if data[:2] != _SOI:
        raise ValueError("not a JPEG-LS stream (no SOI)")
    pos = 2
    frame = None
    planes: list[np.ndarray] = []
    ncomp = 1
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError("corrupt stream: expected marker")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:
            break
        (seglen,) = struct.unpack(">H", data[pos : pos + 2])
        seg = data[pos + 2 : pos + seglen]
        if marker == 0xF7:  # SOF55
            precision = seg[0]
            h, w = struct.unpack(">HH", seg[1:5])
            ncomp = seg[5]
            if not 1 <= ncomp <= 4:
                raise NotImplementedError(f"{ncomp}-component JPEG-LS")
            frame = (precision, h, w)
        elif marker == 0xF8:
            raise NotImplementedError("LSE parameter segments")
        elif marker == 0xDA:
            if frame is None:
                raise ValueError("corrupt stream: SOS before SOF55")
            near, ilv = seg[1 + 2 * seg[0]], seg[2 + 2 * seg[0]]
            if ilv != 0:
                raise NotImplementedError("interleaved scans")
            plane, end = _decode_scan(data, pos + seglen, *frame, near)
            planes.append(plane)
            if len(planes) == ncomp:
                if ncomp == 1:
                    return planes[0], frame[0]
                return np.stack(planes, axis=2), frame[0]
            # next marker follows the (byte-padded) entropy data
            pos = data.index(b"\xff", end)
            continue
        pos += seglen
    raise ValueError("corrupt stream: missing scans")


def _decode_scan(
    data: bytes, pos: int, precision: int, h: int, w: int, near: int = 0
):
    maxval = (1 << precision) - 1
    st = _State(maxval, near)
    br = _StuffReader(data, pos)
    px = np.zeros((h, w), np.int64)
    for r in range(h):
        c = 0
        while c < w:
            a, b, cc, d = _neighbors(px, r, c, w)
            d1, d2, d3 = d - b, b - cc, cc - a
            if st.quantize(d1) == 0 and st.quantize(d2) == 0 \
                    and st.quantize(d3) == 0:
                c = _decode_run(br, st, px, r, c, w, a)
                continue
            q1, q2, q3 = st.quantize(d1), st.quantize(d2), st.quantize(d3)
            if q1 < 0 or (q1 == 0 and q2 < 0) or (q1 == 0 and q2 == 0 and q3 < 0):
                sign = -1
                q1, q2, q3 = -q1, -q2, -q3
            else:
                sign = 1
            q = 81 * q1 + 9 * q2 + q3
            pred = _med_predict(a, b, cc)
            pred += sign * st.C[q]
            pred = min(max(pred, 0), maxval)
            k = st.golomb_k(q, st.A[q])
            merr = _lg_decode(br, k, st.limit, st.qbpp)
            if k == 0 and 2 * st.B[q] <= -st.N[q]:
                errval = (merr - 1) // 2 if merr % 2 else -(merr // 2) - 1
            else:
                errval = merr // 2 if merr % 2 == 0 else -((merr + 1) // 2)
            st.update_regular(q, errval)
            px[r, c] = st.reconstruct(
                pred, errval if sign > 0 else -errval
            )
            c += 1
    dtype = np.uint8 if precision <= 8 else np.uint16
    return px.astype(dtype), br.pos


def _decode_run(br, st, px, r, c, w, a) -> int:
    """Mirror of :func:`_encode_run`: J-table run blocks (a full block
    that exactly reaches EOL still bumps RUNindex; the padding '1' a
    partial EOL run gets does not), then the interruption sample."""
    runval = a
    while True:
        if br.bit() == 1:
            n = 1 << _J[st.run_index]
            if c + n > w:
                # partial-run EOL marker: fill the tail, no index bump
                px[r, c:w] = runval
                return w
            px[r, c : c + n] = runval
            c += n
            if st.run_index < 31:
                st.run_index += 1
            if c >= w:
                return c
        else:
            if _J[st.run_index]:
                n = br.bits(_J[st.run_index])
                px[r, c : c + n] = runval
                c += n
            glimit = st.limit - _J[st.run_index] - 1
            if st.run_index > 0:
                st.run_index -= 1
            break
    # run interruption sample — closed-form inverse of the emap parity
    _, rb, _, _ = _neighbors(px, r, c, w)
    ritype = 1 if abs(runval - rb) <= st.near else 0
    pred = runval if ritype else rb
    sign = -1 if (ritype == 0 and runval > rb) else 1
    q = 365 + ritype
    temp = st.A[q] + (st.N[q] >> 1) if ritype else st.A[q]
    k = st.golomb_k(q, temp)
    emerr = _lg_decode(br, k, glimit, st.qbpp)
    tot = emerr + ritype  # = 2*|errval| - emap
    emap = tot & 1
    mag = (tot + emap) // 2
    # errval < 0  <=>  emap == (k != 0 or 2*Nn >= N)  (encoder predicate)
    neg_pred = 1 if (k != 0 or 2 * st.Nn[ritype] >= st.N[q]) else 0
    errval = -mag if emap == neg_pred else mag
    if errval < 0:
        st.Nn[ritype] += 1
    st.A[q] += (emerr + 1 - ritype) >> 1
    if st.N[q] == _RESET:
        st.A[q] >>= 1
        st.N[q] >>= 1
        st.Nn[ritype] >>= 1
    st.N[q] += 1
    px[r, c] = st.reconstruct(pred, errval if sign > 0 else -errval)
    return c + 1
