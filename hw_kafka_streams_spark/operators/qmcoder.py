"""QM binary arithmetic coder — public-spec ITU T.81 Annex D (the
same coder is republished in ITU T.82/JBIG Annex E and in Pennebaker &
Mitchell's JPEG book, all public documents).

The QM coder is the entropy engine behind JPEG's arithmetic-coded
modes (SOF9/SOF10): a multiply-free binary arithmetic coder whose
probability estimation is a 113-state finite-state machine (Table D.3)
driven by renormalization events, plus one non-adaptive ~0.5 state for
"fixed" decisions (AC sign). Interval convention per Annex D: the MPS
subinterval sits at the BOTTOM of [0, A) with size A - Qe, the LPS at
the top with size Qe, and the two are conditionally exchanged when
A - Qe < Qe so the larger subinterval always codes the more probable
symbol. Registers follow the Annex D software conventions: 16-bit
interval register A renormalized into [0x8000, 0x10000), a 32-bit code
register C whose bits 19..26 are the output byte and bit 27 the carry
(three spacer bits, CT initialised to 11), carry resolution via a
stacked-0xFF counter, and T.81 byte stuffing (every 0xFF data byte is
followed by 0x00; a 0xFF followed by anything else is a marker, after
which the decoder feeds zero bytes — D.2.7).

Why from scratch: the reference app (KafkaStreamApp.java) treats
message payloads as opaque bytes; this repo's multimodal stack decodes
them, and the container ships no image codec libraries. The encoder
and decoder here are exact inverses (hypothesis-verified roundtrips in
tests/test_multimodal_codecs.py); the state table is the standard
published Table D.3.
"""

from __future__ import annotations

# Table D.3 of ITU T.81: (Qe, NLPS, NMPS, SWITCH) per state index
# (the column order of the published table).
# Row 113 is the conventional non-adaptive "fixed 0.5" state used for
# decisions coded without probability adaptation (AC sign, F.1.4.3.1).
QE_TABLE = (
    (0x5A1D, 1, 1, 1), (0x2586, 14, 2, 0), (0x1114, 16, 3, 0),
    (0x080B, 18, 4, 0), (0x03D8, 20, 5, 0), (0x01DA, 23, 6, 0),
    (0x00E5, 25, 7, 0), (0x006F, 28, 8, 0), (0x0036, 30, 9, 0),
    (0x001A, 33, 10, 0), (0x000D, 35, 11, 0), (0x0006, 9, 12, 0),
    (0x0003, 10, 13, 0), (0x0001, 12, 13, 0), (0x5A7F, 15, 15, 1),
    (0x3F25, 36, 16, 0), (0x2CF2, 38, 17, 0), (0x207C, 39, 18, 0),
    (0x17B9, 40, 19, 0), (0x1182, 42, 20, 0), (0x0CEF, 43, 21, 0),
    (0x09A1, 45, 22, 0), (0x072F, 46, 23, 0), (0x055C, 48, 24, 0),
    (0x0406, 49, 25, 0), (0x0303, 51, 26, 0), (0x0240, 52, 27, 0),
    (0x01B1, 54, 28, 0), (0x0144, 56, 29, 0), (0x00F5, 57, 30, 0),
    (0x00B7, 59, 31, 0), (0x008A, 60, 32, 0), (0x0068, 62, 33, 0),
    (0x004E, 63, 34, 0), (0x003B, 32, 35, 0), (0x002C, 33, 9, 0),
    (0x5AE1, 37, 37, 1), (0x484C, 64, 38, 0), (0x3A0D, 65, 39, 0),
    (0x2EF1, 67, 40, 0), (0x261F, 68, 41, 0), (0x1F33, 69, 42, 0),
    (0x19A8, 70, 43, 0), (0x1518, 72, 44, 0), (0x1177, 73, 45, 0),
    (0x0E74, 74, 46, 0), (0x0BFB, 75, 47, 0), (0x09F8, 77, 48, 0),
    (0x0861, 78, 49, 0), (0x0706, 79, 50, 0), (0x05CD, 48, 51, 0),
    (0x04DE, 50, 52, 0), (0x040F, 50, 53, 0), (0x0363, 51, 54, 0),
    (0x02D4, 52, 55, 0), (0x025C, 53, 56, 0), (0x01F8, 54, 57, 0),
    (0x01A4, 55, 58, 0), (0x0160, 56, 59, 0), (0x0125, 57, 60, 0),
    (0x00F6, 58, 61, 0), (0x00CB, 59, 62, 0), (0x00AB, 61, 63, 0),
    (0x008F, 61, 32, 0), (0x5B12, 65, 65, 1), (0x4D04, 80, 66, 0),
    (0x412C, 81, 67, 0), (0x37D8, 82, 68, 0), (0x2FE8, 83, 69, 0),
    (0x293C, 84, 70, 0), (0x2379, 86, 71, 0), (0x1EDF, 87, 72, 0),
    (0x1AA9, 87, 73, 0), (0x174E, 72, 74, 0), (0x1424, 72, 75, 0),
    (0x119C, 74, 76, 0), (0x0F6B, 74, 77, 0), (0x0D51, 75, 78, 0),
    (0x0BB6, 77, 79, 0), (0x0A40, 77, 48, 0), (0x5832, 80, 81, 1),
    (0x4D1C, 88, 82, 0), (0x438E, 89, 83, 0), (0x3BDD, 90, 84, 0),
    (0x34EE, 91, 85, 0), (0x2EAE, 92, 86, 0), (0x299A, 93, 87, 0),
    (0x2516, 86, 71, 0), (0x5570, 88, 89, 1), (0x4CA9, 95, 90, 0),
    (0x44D9, 96, 91, 0), (0x3E22, 97, 92, 0), (0x3824, 99, 93, 0),
    (0x32B4, 99, 94, 0), (0x2E17, 93, 86, 0), (0x56A8, 95, 96, 1),
    (0x4F46, 101, 97, 0), (0x47E5, 102, 98, 0), (0x41CF, 103, 99, 0),
    (0x3C3D, 104, 100, 0), (0x375E, 99, 93, 0), (0x5231, 105, 102, 0),
    (0x4C0F, 106, 103, 0), (0x4639, 107, 104, 0), (0x415E, 103, 99, 0),
    (0x5627, 105, 106, 1), (0x50E7, 108, 107, 0), (0x4B85, 109, 103, 0),
    (0x5597, 110, 109, 0), (0x504F, 111, 107, 0), (0x5A10, 110, 111, 1),
    (0x5522, 112, 109, 0), (0x59EB, 112, 111, 1), (0x5A1D, 113, 113, 0),
)

FIXED_BIN = 113  # the non-adaptive ~0.5 state (sign of AC coefficients)


class QMEncoder:
    """T.81 Annex D encoder (INITENC / CODE / RENORME / BYTEOUT /
    FLUSH). Contexts are 2-element lists ``[state_index, mps]`` owned
    by the caller; ``encode(ctx, bit)`` codes one binary decision and
    adapts the context. Output bytes (with 0x00 stuffing after 0xFF)
    accumulate in ``self.bytes``; call ``flush()`` once per entropy-
    coded segment."""

    def __init__(self) -> None:
        self.bytes = bytearray()
        self.a = 0x10000
        self.c = 0
        self.ct = 11
        self._buffer = -1  # last data byte not yet emitted (-1 = none)
        self._stack = 0    # count of pending 0xFF bytes (carry-mutable)

    # -------------------------------------------------------- output
    def _emit(self, byte: int) -> None:
        self.bytes.append(byte)
        if byte == 0xFF:
            self.bytes.append(0x00)  # T.81 byte stuffing

    def _byteout(self) -> None:
        t = self.c >> 19
        if t > 0xFF:
            # Carry: propagate into the buffered byte; every stacked
            # 0xFF absorbs the carry and becomes 0x00 (D.1.8.3).
            if self._buffer >= 0:
                self._emit(self._buffer + 1)
            for _ in range(self._stack):
                self.bytes.append(0x00)
            self._stack = 0
            self._buffer = t & 0xFF
        elif t == 0xFF:
            self._stack += 1  # hold: a later carry may still land here
        else:
            if self._buffer >= 0:
                self._emit(self._buffer)
            for _ in range(self._stack):
                self._emit(0xFF)  # stuffed by _emit
            self._stack = 0
            self._buffer = t
        self.c &= 0x7FFFF
        self.ct = 8

    # -------------------------------------------------------- coding
    def encode(self, ctx: list, bit: int) -> None:
        qe, nlps, nmps, switch = QE_TABLE[ctx[0]]
        self.a -= qe
        if bit == ctx[1]:
            if self.a >= 0x8000:
                return  # short path: no renormalization, no adaptation
            if self.a < qe:
                # conditional exchange: MPS takes the TOP subinterval
                self.c += self.a
                self.a = qe
            ctx[0] = nmps
        else:
            if self.a >= qe:
                # normal: LPS at the top of the interval
                self.c += self.a
                self.a = qe
            # else exchanged: LPS keeps the bottom (size A - Qe)
            if switch:
                ctx[1] ^= 1
            ctx[0] = nlps
        while self.a < 0x8000:
            self.a <<= 1
            self.c <<= 1
            self.ct -= 1
            if self.ct == 0:
                self._byteout()

    def flush(self) -> bytes:
        """D.1.9 FLUSH: pick the codeword in the final interval with
        the most trailing zeros, drain the registers, return the
        segment bytes."""
        t = (self.c + self.a - 1) & 0xFFFF0000
        self.c = t + 0x8000 if t < self.c else t
        self.c <<= self.ct
        if self.c & 0xF8000000:
            # final carry-out (bit 27)
            if self._buffer >= 0:
                self._emit(self._buffer + 1)
            for _ in range(self._stack):
                self.bytes.append(0x00)
        else:
            if self._buffer >= 0:
                self._emit(self._buffer)
            for _ in range(self._stack):
                self._emit(0xFF)
        self._stack = 0
        self._buffer = -1
        self._emit((self.c >> 19) & 0xFF)
        self._emit((self.c >> 11) & 0xFF)
        return bytes(self.bytes)


class QMDecoder:
    """T.81 Annex D decoder, the exact inverse of :class:`QMEncoder`.

    Reads from ``data`` starting at ``pos``; performs 0xFF00
    unstuffing, and on hitting a real marker (0xFF followed by a
    non-zero, non-stuffing byte) feeds zero bytes for the remainder of
    the scan per D.2.7 and records ``marker_pos`` (offset of the 0xFF)
    so the caller can resume marker parsing."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.marker_pos: int | None = None
        # C holds the code-stream fraction aligned so that
        # (C >> 16) is comparable against the 16-bit interval A.
        # New bytes enter at bits 8..15: each renorm shift then moves
        # the next codeword bit into the compare region at bit 16
        # exactly when the interval doubles. CT counts the shifts
        # until the 8..15 staging area is free again.
        self.c = (
            (self._next_byte() << 24)
            | (self._next_byte() << 16)
            | (self._next_byte() << 8)
        )
        self.ct = 8
        self.a = 0x10000

    def _next_byte(self) -> int:
        if self.marker_pos is not None:
            return 0
        d = self.data
        if self.pos >= len(d):
            self.marker_pos = len(d)
            return 0
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
            if nxt == 0x00:
                self.pos += 2  # stuffed data byte 0xFF
                return 0xFF
            self.marker_pos = self.pos  # real marker: zero-feed now
            return 0
        self.pos += 1
        return b

    def decode(self, ctx: list) -> int:
        qe, nlps, nmps, switch = QE_TABLE[ctx[0]]
        self.a -= qe
        if (self.c >> 16) < self.a:
            # bottom subinterval (size A - Qe)
            if self.a >= 0x8000:
                return ctx[1]  # short path, mirrors the encoder's
            if self.a < qe:
                bit = ctx[1] ^ 1  # conditional exchange: bottom = LPS
                if switch:
                    ctx[1] ^= 1
                ctx[0] = nlps
            else:
                bit = ctx[1]
                ctx[0] = nmps
        else:
            # top subinterval (size Qe)
            self.c -= self.a << 16
            if self.a < qe:
                bit = ctx[1]  # conditional exchange: top = MPS
                ctx[0] = nmps
            else:
                bit = ctx[1] ^ 1
                if switch:
                    ctx[1] ^= 1
                ctx[0] = nlps
            self.a = qe
        while self.a < 0x8000:
            if self.ct == 0:
                self.c |= self._next_byte() << 8
                self.ct = 8
            self.a <<= 1
            self.c = (self.c << 1) & 0xFFFFFFFF
            self.ct -= 1
        return bit


def new_context() -> list:
    """Fresh adaptive context: state 0, MPS = 0 (F.1.4.4.1.4)."""
    return [0, 0]


def fixed_context() -> list:
    """Non-adaptive equiprobable context (AC sign): QE_TABLE row 113
    transitions to itself, so the 'adaptation' is a no-op."""
    return [FIXED_BIN, 0]
