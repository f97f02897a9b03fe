"""Baseline JFIF/JPEG encode+decode, stdlib only — the real-codec core behind
functions/multimodal.synth_jpeg / decode_jpeg.

Grayscale (1 component), 8-bit, baseline sequential DCT with the
standard Annex K luminance Huffman tables. Encoder: level shift ->
forward DCT -> quantize -> zigzag -> DC-diff + AC run-length Huffman ->
byte-stuffed entropy stream inside SOI/DQT/SOF0/DHT/SOS/EOI. Decoder:
full marker walk, DHT tree build, bit reader with 0xFF00 unstuffing,
DC prediction, dequant, inverse zigzag, full 2-D IDCT, clamp.
"""
import math
import struct

import numpy as np

# standard luminance DC table (JPEG Annex K.3.1)
DC_BITS = [0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]  # BITS[1..16]
DC_VALS = list(range(12))
# standard luminance AC table (Annex K.3.2)
AC_BITS = [0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_VALS = [
0x01,0x02,0x03,0x00,0x04,0x11,0x05,0x12,0x21,0x31,0x41,0x06,0x13,0x51,0x61,
0x07,0x22,0x71,0x14,0x32,0x81,0x91,0xA1,0x08,0x23,0x42,0xB1,0xC1,0x15,0x52,
0xD1,0xF0,0x24,0x33,0x62,0x72,0x82,0x09,0x0A,0x16,0x17,0x18,0x19,0x1A,0x25,
0x26,0x27,0x28,0x29,0x2A,0x34,0x35,0x36,0x37,0x38,0x39,0x3A,0x43,0x44,0x45,
0x46,0x47,0x48,0x49,0x4A,0x53,0x54,0x55,0x56,0x57,0x58,0x59,0x5A,0x63,0x64,
0x65,0x66,0x67,0x68,0x69,0x6A,0x73,0x74,0x75,0x76,0x77,0x78,0x79,0x7A,0x83,
0x84,0x85,0x86,0x87,0x88,0x89,0x8A,0x92,0x93,0x94,0x95,0x96,0x97,0x98,0x99,
0x9A,0xA2,0xA3,0xA4,0xA5,0xA6,0xA7,0xA8,0xA9,0xAA,0xB2,0xB3,0xB4,0xB5,0xB6,
0xB7,0xB8,0xB9,0xBA,0xC2,0xC3,0xC4,0xC5,0xC6,0xC7,0xC8,0xC9,0xCA,0xD2,0xD3,
0xD4,0xD5,0xD6,0xD7,0xD8,0xD9,0xDA,0xE1,0xE2,0xE3,0xE4,0xE5,0xE6,0xE7,0xE8,
0xE9,0xEA,0xF1,0xF2,0xF3,0xF4,0xF5,0xF6,0xF7,0xF8,0xF9,0xFA]

ZIGZAG = [
 0, 1, 8,16, 9, 2, 3,10,17,24,32,25,18,11, 4, 5,
12,19,26,33,40,48,41,34,27,20,13, 6, 7,14,21,28,
35,42,49,56,57,50,43,36,29,22,15,23,30,37,44,51,
58,59,52,45,38,31,39,46,53,60,61,54,47,55,62,63]

# quant table (natural order): DC divisor 8 (exact for block-constant
# inputs: DCT DC of a constant block is 8*(v-128)), AC 16
QTABLE = [8] + [16] * 63


def _huff_codes(bits, vals):
    """(value -> (code, length)) per JPEG C.2 canonical code assignment."""
    codes, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln]):
            codes[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return codes

DC_ENC = _huff_codes(DC_BITS, DC_VALS)
AC_ENC = _huff_codes(AC_BITS, AC_VALS)


def _category(v: int) -> int:
    """Bit-category of a DC diff / AC coeff (JPEG F.1.2.1.1)."""
    a, c = abs(v), 0
    while a:
        a >>= 1
        c += 1
    return c


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)  # byte stuffing
            self.n -= 8
            self.acc &= (1 << self.n) - 1

    def flush(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.put((1 << pad) - 1, pad)  # 1-bits padding per spec
        return bytes(self.buf)


# 8x8 DCT basis matrix C[u, x] = c(u)/2 * cos((2x+1) u pi / 16): the JPEG
# A.3.3 reference DCT expressed as two matrix products (numpy) — identical
# math to the quadruple-loop spec formula, vectorized for Arrow batches.
_DCT_M = np.array(
    [
        [
            (math.sqrt(0.5) if u == 0 else 1.0) / 2.0
            * math.cos((2 * x + 1) * u * math.pi / 16)
            for x in range(8)
        ]
        for u in range(8)
    ]
)


def _fdct_block(block):
    """Forward 8x8 DCT (JPEG A.3.3, as C @ B @ C.T)."""
    b = np.asarray(block, dtype=np.float64).reshape(8, 8)
    return (_DCT_M @ b @ _DCT_M.T).reshape(64)


def _idct_block(coef):
    """Inverse 8x8 DCT (A.3.3, as C.T @ F @ C)."""
    f = np.asarray(coef, dtype=np.float64).reshape(8, 8)
    return (_DCT_M.T @ f @ _DCT_M).reshape(64)


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">HH", marker, len(payload) + 2) + payload


def _dht(tc_th: int, bits, vals) -> bytes:
    return _seg(0xFFC4, bytes([tc_th] + bits[1:]) + bytes(vals))


def encode_gray_jpeg(pixels, w: int, h: int) -> bytes:
    """Baseline JPEG bytes for an 8-bit grayscale image (w, h multiples
    of 8; ``pixels`` row-major)."""
    bw = _BitWriter()
    prev_dc = 0
    for by in range(h // 8):
        for bx in range(w // 8):
            block = [pixels[(by * 8 + y) * w + bx * 8 + x] - 128
                     for y in range(8) for x in range(8)]
            coef = _fdct_block(block)
            q = [int(round(float(coef[i]) / QTABLE[i])) for i in range(64)]
            zz = [q[ZIGZAG[i]] for i in range(64)]
            diff = zz[0] - prev_dc
            prev_dc = zz[0]
            cat = _category(diff)
            code, ln = DC_ENC[cat]
            bw.put(code, ln)
            if cat:
                bw.put(diff if diff >= 0 else diff + (1 << cat) - 1, cat)
            run = 0
            for k in range(1, 64):
                if zz[k] == 0:
                    run += 1
                    continue
                while run > 15:
                    c, l = AC_ENC[0xF0]  # ZRL
                    bw.put(c, l)
                    run -= 16
                cat = _category(zz[k])
                c, l = AC_ENC[(run << 4) | cat]
                bw.put(c, l)
                v = zz[k]
                bw.put(v if v >= 0 else v + (1 << cat) - 1, cat)
                run = 0
            if run:
                c, l = AC_ENC[0x00]  # EOB
                bw.put(c, l)
    scan = bw.flush()
    qz = bytes([QTABLE[ZIGZAG[i]] for i in range(64)])  # DQT is zigzag order
    return (
        b"\xFF\xD8"                                     # SOI
        + _seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
        + _seg(0xFFDB, b"\x00" + qz)                    # DQT, Pq=0 Tq=0
        + _seg(0xFFC0, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
        + _dht(0x00, DC_BITS, DC_VALS)
        + _dht(0x10, AC_BITS, AC_VALS)
        + _seg(0xFFDA, bytes([1, 1, 0x00, 0, 63, 0]))   # SOS
        + scan
        + b"\xFF\xD9"                                   # EOI
    )


def _huff_lut(bits, vals):
    """(code, length) -> value decode map."""
    lut, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln]):
            lut[(code, ln)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return lut


class _BitReader:
    def __init__(self, data: bytes):
        self.d = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def bit(self) -> int:
        if not self.n:
            if self.pos >= len(self.d):
                raise ValueError("scan underrun")
            b = self.d[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos >= len(self.d) or self.d[self.pos] != 0x00:
                    raise ValueError("marker in scan")
                self.pos += 1  # unstuff
            self.acc, self.n = b, 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v


def _huff_decode(br, lut):
    code, ln = 0, 0
    while ln < 16:
        code = (code << 1) | br.bit()
        ln += 1
        if (code, ln) in lut:
            return lut[(code, ln)]
    raise ValueError("bad huffman code")


def _extend(v: int, cat: int) -> int:
    return v if v >= (1 << (cat - 1)) else v - (1 << cat) + 1


def decode_gray_jpeg(data: bytes):
    """(w, h, pixels) from baseline grayscale JPEG bytes; raises
    ValueError on anything malformed."""
    if data[:2] != b"\xFF\xD8":
        raise ValueError("no SOI")
    pos, qt, dc_lut, ac_lut, dims = 2, None, None, None, None
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("bad marker")
        marker = data[pos + 1]
        if marker == 0xD9:
            raise ValueError("EOI before SOS")
        (ln,) = struct.unpack_from(">H", data, pos + 2)
        seg = data[pos + 4 : pos + 2 + ln]
        if marker == 0xDB:
            if seg[0] != 0:
                raise ValueError("unsupported DQT precision")
            zz = list(seg[1:65])
            qt = [0] * 64
            for i in range(64):
                qt[ZIGZAG[i]] = zz[i]
        elif marker == 0xC0:
            prec, h, w, ncomp = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8 or ncomp != 1 or seg[7] != 0x11:
                raise ValueError("not baseline grayscale")
            dims = (w, h)
        elif marker == 0xC4:
            i = 0
            while i < len(seg):
                tcth = seg[i]
                bits = [0] + list(seg[i + 1 : i + 17])
                nv = sum(bits)
                vals = list(seg[i + 17 : i + 17 + nv])
                lut = _huff_lut(bits, vals)
                if tcth == 0x00:
                    dc_lut = lut
                elif tcth == 0x10:
                    ac_lut = lut
                else:
                    raise ValueError("unexpected DHT id")
                i += 17 + nv
        elif marker == 0xDD:
            # DRI declares restart-marker intervals this decoder does not
            # implement: skipping it and decoding a scan that lacks (or
            # carries) RSTn markers would silently agree with streams a
            # compliant decoder resyncs or rejects — unsupported features
            # fail LOUD, same rule as the 16-bit DQT below
            raise ValueError("restart intervals (DRI) unsupported")
        elif marker == 0xDA:
            scan_start = pos + 2 + ln
            break
        pos += 2 + ln
    else:
        raise ValueError("no SOS")
    if qt is None or dc_lut is None or ac_lut is None or dims is None:
        raise ValueError("missing segments")
    w, h = dims
    if w % 8 or h % 8 or not w or not h:
        raise ValueError("bad dims")
    end = data.rfind(b"\xFF\xD9")
    if end < 0:
        raise ValueError("no EOI")
    br = _BitReader(data[scan_start:end])
    pixels = [0] * (w * h)
    prev_dc = 0
    for by in range(h // 8):
        for bx in range(w // 8):
            zz = [0] * 64
            cat = _huff_decode(br, dc_lut)
            diff = _extend(br.bits(cat), cat) if cat else 0
            prev_dc += diff
            zz[0] = prev_dc
            k = 1
            while k < 64:
                rs = _huff_decode(br, ac_lut)
                if rs == 0x00:      # EOB
                    break
                if rs == 0xF0:      # ZRL
                    k += 16
                    continue
                k += rs >> 4
                if k > 63:
                    raise ValueError("AC overrun")
                cat = rs & 0x0F
                zz[k] = _extend(br.bits(cat), cat)
                k += 1
            coef = [0] * 64
            for i in range(64):
                coef[ZIGZAG[i]] = zz[i] * qt[ZIGZAG[i]]
            blk = _idct_block(coef)
            for y in range(8):
                for x in range(8):
                    v = int(round(float(blk[y * 8 + x]))) + 128
                    pixels[(by * 8 + y) * w + bx * 8 + x] = max(0, min(255, v))
    return w, h, pixels


def separable_ramp_err_bound() -> float:
    """A-priori per-pixel reconstruction-error bound for images whose 8x8
    blocks are SEPARABLE (pixel = f(x) + g(y) within every block) — the
    DESIGN.md "JPEG oracle boundary" paragraph made executable.

    Derivation: the 2-D DCT of a separable block has support only on
    row 0 and column 0 (15 coefficients); quantization perturbs each
    surviving coefficient by at most q/2, and the IDCT is linear, so the
    per-pixel error is bounded by

        B(x, y) =   (q_dc/2)|C[0,x]||C[0,y]|
                  + sum_u>=1 (q_ac/2)|C[u,x]||C[0,y]|
                  + sum_v>=1 (q_ac/2)|C[0,x]||C[v,y]|

    maximized over (x, y) — no data-dependent term anywhere: the bound
    holds for EVERY separable-block image under this codec's QTABLE, not
    just the committed fixtures. (A general image has all 64
    coefficients live and the same derivation gives ~118 — the reason
    arbitrary photographs need a much looser gate.)"""
    q = np.asarray(QTABLE, dtype=np.float64).reshape(8, 8)
    a = np.abs(_DCT_M)  # |C[u, x]|
    worst = 0.0
    for x in range(8):
        for y in range(8):
            b = q[0, 0] / 2 * a[0, x] * a[0, y]
            b += sum(q[u, 0] / 2 * a[u, x] * a[0, y] for u in range(1, 8))
            b += sum(q[0, v] / 2 * a[0, x] * a[v, y] for v in range(1, 8))
            worst = max(worst, b)
    return worst
