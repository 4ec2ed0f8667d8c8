"""Progressive JPEG decode: streams are built by a TEST-LOCAL progressive
encoder (spectral selection, successive approximation, EOB-run batching —
an independent transcription of the jcphuff.c emission rules) from the
SAME quantized coefficient blocks as a sequential stream; the decoder
must produce IDENTICAL pixels for both (the sequential path is itself
pinned against scalar references in tests/test_jpeg_kernel.py).  PIL
cross-parity on real progressive files runs in the codec-present lane."""

import struct

import numpy as np
import pytest

from deepseek_ocr_spark.kernels.jpeg import ZIGZAG, decode_jpeg
from tests.test_jpeg_kernel import (
    _AC_BITS, _AC_CODES, _AC_VALS, _DC_BITS, _DC_CODES, _DC_VALS,
    _W, _seg, _zz_from_natural, build_jpeg,
)


class _ScanWriter(_W):
    """Bit writer + EOB-run state for one progressive scan."""

    def __init__(self):
        super().__init__()
        self.eob_count = 0
        self.eob_bits = []

    def sym_ac(self, s):
        c, l = _AC_CODES[s]
        self.put(c, l)

    def sym_dc(self, s):
        c, l = _DC_CODES[s]
        self.put(c, l)

    def flush_eobrun(self):
        if self.eob_count == 0:
            return
        g = self.eob_count.bit_length() - 1
        self.sym_ac(g << 4)
        if g:
            self.put(self.eob_count - (1 << g), g)
        for b in self.eob_bits:
            self.put(b, 1)
        self.eob_count = 0
        self.eob_bits = []


def _shift(v, al):
    """AC point transform: magnitude shift toward zero (jcphuff AC_first);
    DC uses plain ARITHMETIC shift instead — the two differ on negatives
    and mixing them up breaks refinement."""
    return (abs(v) >> al) * (1 if v >= 0 else -1)


def _enc_dc_first(w, interleave_order, al):
    preds = {}
    for ci, zz in interleave_order:
        v = zz[0] >> al  # arithmetic (jcphuff IRIGHT_SHIFT)
        diff = v - preds.get(ci, 0)
        preds[ci] = v
        s = abs(diff).bit_length()
        w.sym_dc(s)
        if s:
            w.put(diff if diff >= 0 else diff + (1 << s) - 1, s)


def _enc_dc_refine(w, interleave_order, al):
    for _ci, zz in interleave_order:
        w.put((zz[0] >> al) & 1, 1)  # two's-complement bit, decoder ORs it


def _enc_ac_first(w, blocks, ss, se, al):
    for zz in blocks:
        band = [_shift(zz[k], al) for k in range(64)]
        last = max((k for k in range(ss, se + 1) if band[k]), default=0)
        if last < ss:  # empty band → covered by an EOB run
            w.eob_count += 1
            continue
        w.flush_eobrun()
        run = 0
        for k in range(ss, last + 1):
            v = band[k]
            if v == 0:
                run += 1
                continue
            while run > 15:
                w.sym_ac(0xF0)
                run -= 16
            s = abs(v).bit_length()
            w.sym_ac((run << 4) | s)
            w.put(v if v >= 0 else v + (1 << s) - 1, s)
            run = 0
        if last < se:
            w.eob_count += 1
    w.flush_eobrun()


def _enc_ac_refine(w, blocks, ss, se, al):
    """jcphuff encode_mcu_AC_refine transcription: newly-nonzero coeffs
    (abs>>Al == 1) emit (run|1)+sign, history coeffs (abs>>Al > 1) emit
    buffered correction bits, trailing content joins the EOB run."""
    for zz in blocks:
        absv = {k: abs(zz[k]) >> al for k in range(ss, se + 1)}
        eob = max((k for k in range(ss, se + 1) if absv[k] == 1), default=ss - 1)
        r = 0
        br = []
        for k in range(ss, se + 1):
            t = absv[k]
            if t == 0:
                r += 1
                continue
            while r > 15 and k <= eob:
                w.flush_eobrun()
                w.sym_ac(0xF0)
                r -= 16
                for b in br:
                    w.put(b, 1)
                br = []
            if t > 1:
                br.append(t & 1)
                continue
            w.flush_eobrun()
            w.sym_ac((r << 4) | 1)
            w.put(1 if zz[k] >= 0 else 0, 1)
            for b in br:
                w.put(b, 1)
            br = []
            r = 0
        if r > 0 or br:
            w.eob_count += 1
            w.eob_bits.extend(br)
    w.flush_eobrun()


def build_progressive_jpeg(w, h, comps, quants, comp_blocks, scans):
    """comps: [(h, v, tq)]; comp_blocks: per component, the list of
    zigzag-order blocks in that component's raster order (padded grid);
    scans: list of (comp_ixs, ss, se, ah, al)."""
    out = bytearray(b"\xff\xd8")
    for tq, q in quants.items():
        zzq = bytes(q[ZIGZAG[k]] for k in range(64))
        out += _seg(0xDB, bytes([tq]) + zzq)
    sof = struct.pack(">BHHB", 8, h, w, len(comps))
    for i, (ch_, cv, tq) in enumerate(comps):
        sof += bytes([i + 1, (ch_ << 4) | cv, tq])
    out += _seg(0xC2, sof)  # SOF2: progressive
    out += _seg(0xC4, bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_VALS))
    out += _seg(0xC4, bytes([0x10]) + bytes(_AC_BITS) + bytes(_AC_VALS))

    hmax = max(c[0] for c in comps)
    vmax = max(c[1] for c in comps)
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)

    for comp_ixs, ss, se, ah, al in scans:
        sos = bytes([len(comp_ixs)])
        for ci in comp_ixs:
            sos += bytes([ci + 1, 0x00])
        sos += bytes([ss, se, (ah << 4) | al])
        out += _seg(0xDA, sos)
        sw = _ScanWriter()
        if ss == 0:
            order = []
            for m in range(mcus_x * mcus_y):
                my, mx = divmod(m, mcus_x)
                for ci in comp_ixs:
                    ch_, cv, _tq = comps[ci]
                    bw = mcus_x * ch_
                    for by in range(cv):
                        for bx in range(ch_):
                            ix = (my * cv + by) * bw + (mx * ch_ + bx)
                            order.append((ci, comp_blocks[ci][ix]))
            if ah == 0:
                _enc_dc_first(sw, order, al)
            else:
                _enc_dc_refine(sw, order, al)
        else:
            (ci,) = comp_ixs
            ch_, cv, _tq = comps[ci]
            bw = mcus_x * ch_
            cw_blocks = ((w * ch_ + hmax - 1) // hmax + 7) // 8
            ch_blocks = ((h * cv + vmax - 1) // vmax + 7) // 8
            blocks = [
                comp_blocks[ci][row * bw + col]
                for row in range(ch_blocks)
                for col in range(cw_blocks)
            ]
            if ah == 0:
                _enc_ac_first(sw, blocks, ss, se, al)
            else:
                _enc_ac_refine(sw, blocks, ss, se, al)
        sw.flush()
        out += sw.out
    out += b"\xff\xd9"
    return bytes(out)


def _gray_blocks(rng, n, density=10):
    blocks = []
    for _ in range(n):
        b = [0] * 64
        for _ in range(rng.randint(1, density)):
            b[rng.randint(0, 64)] = int(rng.randint(-120, 120))
        blocks.append(b)
    return blocks


def _seq_pixels(w, h, q, blocks_nat):
    data = build_jpeg(w, h, [(1, 1, 0)], {0: q},
                      [[(0, _zz_from_natural(b))] for b in blocks_nat])
    return decode_jpeg(data)


SCRIPT_SPECTRAL = [((0,), 0, 0, 0, 0), ((0,), 1, 5, 0, 0), ((0,), 6, 63, 0, 0)]


@pytest.mark.parametrize("nblocks", [1, 2, 6])
def test_spectral_selection_equals_sequential(nblocks):
    rng = np.random.RandomState(21 + nblocks)
    q = list(rng.randint(1, 30, 64))
    blocks = _gray_blocks(rng, nblocks)
    seq = _seq_pixels(nblocks * 8, 8, q, blocks)
    zz = [_zz_from_natural(b) for b in blocks]
    prog = build_progressive_jpeg(
        nblocks * 8, 8, [(1, 1, 0)], {0: list(q)}, [zz], SCRIPT_SPECTRAL
    )
    assert decode_jpeg(prog) == seq


def test_successive_approximation_equals_sequential():
    rng = np.random.RandomState(5)
    q = list(rng.randint(1, 30, 64))
    blocks = _gray_blocks(rng, 4)
    seq = _seq_pixels(32, 8, q, blocks)
    zz = [_zz_from_natural(b) for b in blocks]
    script = [
        ((0,), 0, 0, 0, 1),
        ((0,), 1, 5, 0, 1),
        ((0,), 6, 63, 0, 1),
        ((0,), 0, 0, 1, 0),
        ((0,), 1, 5, 1, 0),
        ((0,), 6, 63, 1, 0),
    ]
    prog = build_progressive_jpeg(32, 8, [(1, 1, 0)], {0: list(q)}, [zz], script)
    assert decode_jpeg(prog) == seq


def test_two_stage_refinement_equals_sequential():
    """Al=2 first scan then two refinement passes (2→1→0)."""
    rng = np.random.RandomState(17)
    q = list(rng.randint(1, 20, 64))
    blocks = _gray_blocks(rng, 3, density=14)
    seq = _seq_pixels(24, 8, q, blocks)
    zz = [_zz_from_natural(b) for b in blocks]
    script = [
        ((0,), 0, 0, 0, 2),
        ((0,), 1, 63, 0, 2),
        ((0,), 0, 0, 1, 1),
        ((0,), 0, 0, 2, 0),
        ((0,), 1, 63, 1, 1),
        ((0,), 1, 63, 2, 0),
    ]
    prog = build_progressive_jpeg(24, 8, [(1, 1, 0)], {0: list(q)}, [zz], script)
    assert decode_jpeg(prog) == seq


def test_eob_runs_across_sparse_blocks():
    """Mostly-empty bands force multi-block EOB runs (first and refine)."""
    rng = np.random.RandomState(2)
    q = [8] * 64
    blocks = []
    for i in range(10):
        b = [0] * 64
        b[0] = 20 + i
        if i in (0, 7):  # only two blocks carry any AC
            b[9], b[33] = 6, -5
        blocks.append(b)
    seq = _seq_pixels(80, 8, q, blocks)
    zz = [_zz_from_natural(b) for b in blocks]
    for script in (SCRIPT_SPECTRAL, [
        ((0,), 0, 0, 0, 1), ((0,), 1, 63, 0, 1),
        ((0,), 0, 0, 1, 0), ((0,), 1, 63, 1, 0),
    ]):
        prog = build_progressive_jpeg(80, 8, [(1, 1, 0)], {0: list(q)}, [zz], script)
        assert decode_jpeg(prog) == seq


def test_color_420_progressive_equals_sequential():
    rng = np.random.RandomState(9)
    ql = list(rng.randint(1, 24, 64))
    qc = list(rng.randint(1, 24, 64))
    yb = _gray_blocks(rng, 4, density=8)
    cb = _gray_blocks(rng, 1, density=6)[0]
    cr = _gray_blocks(rng, 1, density=6)[0]
    mcu = [(0, _zz_from_natural(b)) for b in yb]
    mcu += [(1, _zz_from_natural(cb)), (2, _zz_from_natural(cr))]
    seq = decode_jpeg(build_jpeg(
        16, 16, [(2, 2, 0), (1, 1, 1), (1, 1, 1)], {0: ql, 1: qc}, [mcu]
    ))
    comp_blocks = [
        [_zz_from_natural(b) for b in yb],
        [_zz_from_natural(cb)],
        [_zz_from_natural(cr)],
    ]
    script = [
        ((0, 1, 2), 0, 0, 0, 1),
        ((0,), 1, 63, 0, 0),
        ((1,), 1, 63, 0, 0),
        ((2,), 1, 63, 0, 0),
        ((0, 1, 2), 0, 0, 1, 0),
    ]
    prog = build_progressive_jpeg(
        16, 16, [(2, 2, 0), (1, 1, 1), (1, 1, 1)], {0: list(ql), 1: list(qc)},
        comp_blocks, script,
    )
    assert decode_jpeg(prog) == seq


def test_fuzz_progressive_equals_sequential():
    rng = np.random.RandomState(77)
    for trial in range(6):
        n = int(rng.randint(1, 8))
        q = list(rng.randint(1, 40, 64))
        blocks = _gray_blocks(rng, n, density=int(rng.randint(2, 20)))
        seq = _seq_pixels(n * 8, 8, q, blocks)
        zz = [_zz_from_natural(b) for b in blocks]
        al = int(rng.randint(0, 3))
        script = [((0,), 0, 0, 0, al), ((0,), 1, 63, 0, al)]
        for a in range(al, 0, -1):
            script.append(((0,), 0, 0, al - a + 1, a - 1))
            script.append(((0,), 1, 63, al - a + 1, a - 1))
        prog = build_progressive_jpeg(n * 8, 8, [(1, 1, 0)], {0: list(q)}, [zz], script)
        assert decode_jpeg(prog) == seq, trial


def test_real_decode_handles_progressive():
    from deepseek_ocr_spark.operators.multimodal import _real_decode

    rng = np.random.RandomState(1)
    q = [12] * 64
    blocks = _gray_blocks(rng, 2)
    zz = [_zz_from_natural(b) for b in blocks]
    prog = build_progressive_jpeg(16, 8, [(1, 1, 0)], {0: q}, [zz], SCRIPT_SPECTRAL)
    assert _real_decode(prog) == (16, 8, 1)


def test_decode_matches_pil_progressive():
    PIL_Image = pytest.importorskip("PIL.Image")
    import io

    from tests.test_pixels import gradient

    img = gradient(37, 23, 3)
    pim = PIL_Image.frombytes("RGB", (37, 23), img[3])
    for subsampling in (0, 2):
        out = io.BytesIO()
        pim.save(out, "JPEG", quality=85, progressive=True,
                 subsampling=subsampling)
        data = out.getvalue()
        with PIL_Image.open(io.BytesIO(data)) as im:
            expected = im.convert("RGB").tobytes()
        w, h, ch, buf = decode_jpeg(data)
        assert (w, h, ch) == (37, 23, 3)
        assert buf == expected, f"subsampling={subsampling}"
