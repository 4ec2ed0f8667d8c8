"""QM arithmetic entropy coder for JPEG (ITU-T T.81 Annexes D/F/G).

Closes the last codec gate: arithmetic-coded JPEGs (SOF9 sequential,
SOF10 progressive) decode natively in-sandbox.  This EXCEEDS the
reference pipeline, whose image loading inherits PIL/libjpeg without
arithmetic support (vllm/run_dpsk_ocr_eval_batch.py:101-107 — PIL
raises on SOF9/SOF10 streams).

What is implemented from the public spec:
- the 113-state Qe probability estimation table (T.81 Table D.3) plus
  the non-adapting "fixed 0.5" bin used for AC signs and progressive
  refinement (an extra self-looping state, the same trick libjpeg's
  jaricom.c uses for its 114th entry);
- the QM interval rules: MPS at the bottom of the interval, LPS (size
  Qe) at the top, conditional MPS/LPS exchange when A - Qe < Qe,
  renormalization to keep A in [0x8000, 0x10000);
- the JPEG byte layer: byte stuffing (a data 0xFF is followed by a
  stuffed 0x00; any other byte after 0xFF is a marker and ends the
  entropy segment — the decoder then feeds zero bytes), carry
  resolution that ripples through pending 0xFF bytes (they become
  0x00), and the D.1.8-style flush that zeroes the low 16 bits of the
  final code point;
- the statistical models of Annex F (sequential DC/AC conditioning:
  5-category DC contexts from the previous diff with L/U thresholds,
  3-bins-per-index AC contexts with the Kx split of the two X-chains)
  and Annex G (progressive: DC-first/refine, AC-first/refine with the
  previous-stage EOB index), matching libjpeg's jdarith.c reading of
  the spec.

Validation strategy (no arithmetic-capable codec exists in-sandbox to
cross-check against — PIL cannot decode these streams either): the
fast coder pair is pinned against an EXACT-ARITHMETIC reference
decoder in tests/test_jparith.py that shares only the Qe table and
exchange rules — it tracks the code stream as one exact big-integer
fraction with no renormalization, no carry machinery and no byte
registers, so a bug in the renorm/carry/flush plumbing cannot cancel
out between encode and decode.  Encoder/decoder register alignment
(CT=11 spacer-bit init against the 16-bit decoder preload) is derived,
not transcribed, and the derivation is asserted by that lane.

Hostile-input contract: decode raises ValueError only (wrapped by
kernels/jpeg.py's decode_jpeg guard); the encoder is only driven by
our own fixture writers.
"""

from __future__ import annotations

# T.81 Table D.3: (Qe, next-index after LPS, next-index after MPS,
# switch-MPS-sense-on-LPS).  Index 113 is the appended fixed
# equiprobable bin: it transitions to itself and never switches, so a
# decision coded through it cannot adapt (AC sign, refinement bits).
QE_TABLE: list[tuple[int, int, int, int]] = [
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
    (0x5522, 112, 109, 0), (0x59EB, 112, 111, 1),
    (0x5A1D, 113, 113, 0),  # fixed equiprobable bin (non-adapting)
]

FIXED_BIN = 113


def new_stats(n: int) -> bytearray:
    """A fresh statistics area: n state bytes, each (MPS << 7) | index,
    initialized to index 0 / MPS 0 per F.1.4.4.1.4."""
    return bytearray(n)


def fixed_stats() -> bytearray:
    """A one-byte stats area pinned to the fixed bin (never adapts)."""
    return bytearray([FIXED_BIN])


class ArithDecoder:
    """QM decoder over one entropy-coded segment of ``data`` starting at
    ``pos``.  Derived register relation: the decoder preloads 16 stream
    bits into C at scale A=0x10000 and compares C against
    (A - Qe) << CT, where CT counts stream bits consumed beyond the
    current renormalization count — matching the encoder's CT=11
    spacer-bit initialization (byte = C >> 19 of a 27-bit register).
    Byte feed: 0xFF 0x00 delivers a data 0xFF; 0xFF followed by
    anything else is a marker — the segment ends and zero bytes are fed
    from then on (``marker_pos`` records where the marker starts)."""

    __slots__ = ("data", "pos", "end", "done", "marker_pos", "a", "c", "ct")

    def __init__(self, data: bytes, pos: int, end: int | None = None):
        self.data = data
        self.pos = pos
        self.end = len(data) if end is None else end
        self.done = False
        self.marker_pos: int | None = None
        self.c = (self._next() << 8) | self._next()
        self.a = 0x10000
        self.ct = 0

    def _next(self) -> int:
        if self.done:
            return 0
        p = self.pos
        if p >= self.end:
            self.done = True
            self.marker_pos = p
            return 0
        b = self.data[p]
        if b != 0xFF:
            self.pos = p + 1
            return b
        if p + 1 < self.end and self.data[p + 1] == 0x00:
            self.pos = p + 2
            return 0xFF
        self.done = True
        self.marker_pos = p
        return 0

    def decode(self, st: bytearray, i: int) -> int:
        a, c, ct = self.a, self.c, self.ct
        while a < 0x8000:
            if ct == 0:
                c = (c << 8) | self._next()
                ct = 8
            a <<= 1
            ct -= 1
        sv = st[i]
        qe, nlps, nmps, sw = QE_TABLE[sv & 0x7F]
        a1 = a - qe
        th = a1 << ct
        if c >= th:
            # top subinterval (size Qe)
            c -= th
            a = qe
            if a1 < qe:  # conditional exchange: top carries the MPS
                bit = sv >> 7
                st[i] = (sv & 0x80) | nmps
            else:
                bit = (sv >> 7) ^ 1
                st[i] = (((sv ^ 0x80) if sw else sv) & 0x80) | nlps
        else:
            # bottom subinterval (size A - Qe)
            a = a1
            if a1 < 0x8000:
                if a1 < qe:  # conditional exchange: bottom carries the LPS
                    bit = (sv >> 7) ^ 1
                    st[i] = (((sv ^ 0x80) if sw else sv) & 0x80) | nlps
                else:
                    bit = sv >> 7
                    st[i] = (sv & 0x80) | nmps
            else:  # no renormalization -> no adaptation (D.2.5)
                bit = sv >> 7
        self.a, self.c, self.ct = a, c, ct
        return bit


class ArithEncoder:
    """QM encoder producing one entropy-coded segment.  Pending bytes
    stay un-finalized while a future carry could still ripple into them
    (exactly the trailing run of 0xFF bytes plus the byte before it);
    finalized 0xFF data bytes get their stuffed 0x00."""

    __slots__ = ("a", "c", "ct", "pending", "out", "carries")

    def __init__(self):
        self.a = 0x10000
        self.c = 0
        self.ct = 11  # 3 spacer bits: first byte is C bits 19..26
        self.pending: list[int] = []
        self.out = bytearray()
        self.carries = 0  # test observability: carry-ripple coverage

    def _byteout(self, t: int) -> None:
        p = self.pending
        if t > 0xFF:  # carry: ripple through pending 0xFF bytes
            self.carries += 1
            i = len(p) - 1
            while i >= 0 and p[i] == 0xFF:
                p[i] = 0x00
                i -= 1
            if i < 0:
                raise ValueError("arithmetic coder carry overflow")
            p[i] += 1
            t &= 0xFF
        p.append(t)
        j = len(p)
        while j > 0 and p[j - 1] == 0xFF:
            j -= 1
        # p[j-1] may still take a carry; everything before it is final
        for b in p[: j - 1]:
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)
        del p[: j - 1]

    def encode(self, st: bytearray, i: int, bit: int) -> None:
        sv = st[i]
        qe, nlps, nmps, sw = QE_TABLE[sv & 0x7F]
        a1 = self.a - qe
        if bit == (sv >> 7):
            if a1 >= 0x8000:
                self.a = a1
                return
            if a1 < qe:  # exchange: MPS coded in the top subinterval
                self.c += a1
                self.a = qe
            else:
                self.a = a1
            st[i] = (sv & 0x80) | nmps
        else:
            if a1 < qe:  # exchange: LPS coded in the bottom subinterval
                self.a = a1
            else:
                self.c += a1
                self.a = qe
            st[i] = (((sv ^ 0x80) if sw else sv) & 0x80) | nlps
        a, c, ct = self.a, self.c, self.ct
        while a < 0x8000:
            a <<= 1
            c <<= 1
            ct -= 1
            if ct == 0:
                self._byteout(c >> 19)
                c &= 0x7FFFF
                ct = 8
        self.a, self.c, self.ct = a, c, ct

    def flush(self) -> bytes:
        # D.1.8: pick the code point with 16 trailing zero bits inside
        # [C, C+A), then drain the 19-bit register through 3 byteouts.
        t = (self.c + self.a - 1) & ~0xFFFF
        if t < self.c:
            t += 0x8000
        c = t << self.ct
        self._byteout(c >> 19)
        c = (c & 0x7FFFF) << 8
        self._byteout(c >> 19)
        c = (c & 0x7FFFF) << 8
        self._byteout(c >> 19)
        for b in self.pending:
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)
        self.pending.clear()
        return bytes(self.out)


# --- Annex F/G statistical models -------------------------------------------
#
# DC statistics area (per conditioning table): 64 bytes.
#   0,4,8,12,16 : S0 (diff==0?) for the 5 contexts from the previous
#                 diff (zero / small+ / small- / large+ / large-);
#   ctx+1       : SS (sign); ctx+2 / ctx+3 : SP / SN (magnitude > 1?)
#   20..34      : X1..X15 magnitude-category chain
#   34..48      : M2..M15 magnitude bits (X position + 14)
# AC statistics area (per conditioning table): 256 bytes.
#   3(k-1)      : SE (end-of-block at index k?)
#   3(k-1)+1    : S0 (coefficient zero?)
#   3(k-1)+2    : magnitude >1? / >2?  (sign uses the fixed bin)
#   189.. / 217..: X-chains for k <= Kx / k > Kx; M bits at X + 14.

DC_STAT_BINS = 64
AC_STAT_BINS = 256
DC_DEFAULT_L = 0
DC_DEFAULT_U = 1
AC_DEFAULT_KX = 5


def dc_context(m: int, sign: int, lo: int, up: int) -> int:
    """Conditioning category for the NEXT block's DC decision, from this
    diff's magnitude-category MSB ``m`` (0 when |diff| == 1) and sign
    (F.1.4.4.1.2: thresholds (1<<L)>>1 and (1<<U)>>1)."""
    if m < (1 << lo) >> 1:
        return 0
    if m > (1 << up) >> 1:
        return 12 + 4 * sign
    return 4 + 4 * sign


def decode_dc_diff(
    dec: ArithDecoder, st: bytearray, ctx: int, lo: int, up: int
) -> tuple[int, int]:
    """One DC difference; returns (diff, next context)."""
    if dec.decode(st, ctx) == 0:
        return 0, 0
    sign = dec.decode(st, ctx + 1)
    i = ctx + 2 + sign
    m = dec.decode(st, i)
    if m:
        i = 20
        while dec.decode(st, i):
            m <<= 1
            if m == 0x8000:
                raise ValueError("arith DC magnitude overflow")
            i += 1
    nctx = dc_context(m, sign, lo, up)
    v = m
    i += 14
    while m > 1:
        m >>= 1
        if dec.decode(st, i):
            v |= m
    v += 1
    return (-v if sign else v), nctx


def encode_dc_diff(
    enc: ArithEncoder, st: bytearray, ctx: int, diff: int, lo: int, up: int
) -> int:
    """Mirror of decode_dc_diff; returns the next context."""
    if diff == 0:
        enc.encode(st, ctx, 0)
        return 0
    enc.encode(st, ctx, 1)
    sign = 1 if diff < 0 else 0
    v = (-diff if sign else diff) - 1
    enc.encode(st, ctx + 1, sign)
    i = ctx + 2 + sign
    if v == 0:
        enc.encode(st, i, 0)
        m = 0
    else:
        enc.encode(st, i, 1)
        n = v.bit_length()
        m = 1
        i = 20
        for _ in range(n - 1):
            enc.encode(st, i, 1)
            m <<= 1
            i += 1
        enc.encode(st, i, 0)
    nctx = dc_context(m, sign, lo, up)
    i += 14
    while m > 1:
        m >>= 1
        enc.encode(st, i, 1 if v & m else 0)
    return nctx


def decode_ac_coefs(
    dec: ArithDecoder,
    st: bytearray,
    fixed: bytearray,
    block,
    natural: list[int],
    ss: int,
    se: int,
    al: int,
    kx: int,
) -> None:
    """AC coefficients for one block, zigzag indices ss..se, values
    scaled by << al (al = 0 for sequential)."""
    k = ss
    while k <= se:
        i = 3 * (k - 1)
        if dec.decode(st, i):
            return  # EOB
        while dec.decode(st, i + 1) == 0:
            i += 3
            k += 1
            if k > se:
                raise ValueError("arith AC run overflow")
        sign = dec.decode(fixed, 0)
        i += 2
        m = dec.decode(st, i)
        if m:
            if dec.decode(st, i):
                m = 2
                i = 189 if k <= kx else 217
                while dec.decode(st, i):
                    m <<= 1
                    if m == 0x8000:
                        raise ValueError("arith AC magnitude overflow")
                    i += 1
        v = m
        i += 14
        while m > 1:
            m >>= 1
            if dec.decode(st, i):
                v |= m
        v += 1
        block[natural[k]] = (-v if sign else v) << al
        k += 1


def encode_ac_coefs(
    enc: ArithEncoder,
    st: bytearray,
    fixed: bytearray,
    block,
    natural: list[int],
    ss: int,
    se: int,
    al: int,
    kx: int,
) -> None:
    """Mirror of decode_ac_coefs over natural-order coefficients.  The
    point transform is SIGN-MAGNITUDE (abs >> al), the Annex G AC
    convention — a plain arithmetic shift would round negatives toward
    -inf and desynchronize the refinement stage."""
    vals: dict[int, int] = {}
    eob = ss - 1
    for k in range(ss, se + 1):
        raw = int(block[natural[k]])
        mag = abs(raw) >> al
        vals[k] = -mag if raw < 0 else mag
        if mag:
            eob = k
    k = ss
    while k <= eob:
        i = 3 * (k - 1)
        enc.encode(st, i, 0)  # not EOB yet
        v = vals[k]
        while v == 0:
            enc.encode(st, i + 1, 0)
            i += 3
            k += 1
            v = vals[k]
        enc.encode(st, i + 1, 1)
        sign = 1 if v < 0 else 0
        enc.encode(fixed, 0, sign)
        v = (-v if sign else v) - 1
        i += 2
        if v == 0:
            enc.encode(st, i, 0)
            m = 0
        else:
            enc.encode(st, i, 1)
            if v == 1:
                enc.encode(st, i, 0)
                m = 1
            else:
                enc.encode(st, i, 1)
                n = v.bit_length()
                m = 2
                i = 189 if k <= kx else 217
                for _ in range(n - 2):
                    enc.encode(st, i, 1)
                    m <<= 1
                    i += 1
                enc.encode(st, i, 0)
        i += 14
        while m > 1:
            m >>= 1
            enc.encode(st, i, 1 if v & m else 0)
        k += 1
    if eob < se:
        enc.encode(st, 3 * (k - 1), 1)  # EOB


def encode_ac_refine(
    enc: ArithEncoder,
    st: bytearray,
    fixed: bytearray,
    block,
    natural: list[int],
    ss: int,
    se: int,
    al: int,
) -> None:
    """Mirror of the AC refinement decode (G.1.3.3): kex is the last
    index visible after the PREVIOUS stage (abs >> (al+1) nonzero); the
    EOB decision exists only beyond it and fires when no remaining index
    has a set current-stage bit."""
    kex = ss - 1
    kend = ss - 1
    cur: dict[int, tuple[int, bool]] = {}
    for k in range(ss, se + 1):
        raw = int(block[natural[k]])
        mag = abs(raw) >> al
        cur[k] = (mag, raw < 0)
        if mag >> 1:
            kex = k
        if mag & 1:
            kend = k
    k = ss
    while k <= se:
        i = 3 * (k - 1)
        if k > kex:
            if k > kend:
                enc.encode(st, i, 1)  # EOB
                return
            enc.encode(st, i, 0)
        while True:
            mag, neg = cur[k]
            if mag >> 1:  # nonzero after previous stage: correction bit
                enc.encode(st, i + 2, mag & 1)
                break
            if mag:  # newly nonzero (necessarily ±1 at this stage)
                enc.encode(st, i + 1, 1)
                enc.encode(fixed, 0, 1 if neg else 0)
                break
            enc.encode(st, i + 1, 0)
            i += 3
            k += 1
        k += 1
