"""Baseline JPEG codec (ITU-T T.81 sequential DCT, Huffman entropy
coding) in numpy + stdlib — closes the one entropy-coded image seam the
multimodal decoders had left (`multimodal._decode_real` raised
``NotImplementedError`` for JPEG): real crawl corpora are
JPEG-dominated, so the decode stage of a 100 TB media pipeline must
open them.

Scope (and honest limits, enforced with loud errors):

- DECODE: baseline sequential (SOF0), extended sequential (SOF1) and
  PROGRESSIVE (SOF2 — spectral-selection bands, successive
  approximation with the libjpeg correction-bit walk, EOB runs, DC/AC
  refinement scans), 8-bit samples, 1 or 3 components, any sampling
  factors ≤ 4 (4:4:4 / 4:2:2 / 4:2:0 covered), restart intervals
  (DRI/RSTn), stuffed-byte handling, multi-table DQT/DHT segments.
  Arithmetic coding, hierarchical and 12-bit modes raise
  ``ValueError`` with the mode name — in-band error rows upstream,
  never a crash.
- ENCODE: baseline JFIF writer (quality-scaled Annex-K quantization
  tables, standard Annex-K Huffman tables, 4:4:4 or 4:2:0, optional
  restart interval) plus a progressive (SOF2) writer whose scan script
  covers every progressive decoder path — so the synthetic corpora can
  plant REAL entropy-coded payloads for the pipeline tests without any
  image library in the container. The decode of a progressive encode
  is pixel-identical to the baseline decode of the same image
  (entropy coding is lossless; the tests pin that equality).

Numerics: entropy coding is lossless, so a decode of this encoder's
output recovers the quantized DCT coefficients EXACTLY; the only float
steps are the 8×8 DCT basis multiply and the YCbCr↔RGB transform, both
plain float64 matmuls in a fixed order (bit-deterministic across runs
and layouts — the same contract as ``multimodal.dhash64``). The IDCT is
vectorized over all blocks of a component (one einsum per component);
only the Huffman bit walk is a Python loop, bounded by the compressed
byte count.

Chroma upsampling is nearest (sample replication), the fastest correct
choice and the one whose area means the dHash grid preserves; decoders
differ here by spec design (T.81 leaves interpolation open).
"""

from __future__ import annotations

import struct
from typing import Dict, List, Tuple

import numpy as np

# zigzag index k -> raster position in the 8x8 block (T.81 Figure 5)
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)
_UNZIG = np.argsort(ZIGZAG)

# Annex K.1 / K.2 base quantization tables (raster order)
QT_LUM = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)
QT_CHROM = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)

# Annex K.3-K.6 standard Huffman table specs: (BITS[1..16], HUFFVAL)
HUFF_DC_LUM = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
HUFF_DC_CHROM = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
HUFF_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
HUFF_AC_CHROM = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)


def _dct_basis() -> np.ndarray:
    """Orthonormal 8-point DCT-II matrix A: forward F = A f Aᵀ,
    inverse f = Aᵀ F A."""
    x = np.arange(8)
    u = x[:, None]
    a = np.cos((2 * x[None, :] + 1) * u * np.pi / 16) / 2.0
    a[0] /= np.sqrt(2)
    return a


_A = _dct_basis()


def _canonical_codes(bits: List[int], vals: List[int]) -> Dict[int, Tuple[int, int]]:
    """symbol -> (code, length) per the T.81 canonical construction."""
    out: Dict[int, Tuple[int, int]] = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(bits: List[int], vals: List[int]) -> Dict[Tuple[int, int], int]:
    """(length, code) -> symbol, the walk table the bit reader probes."""
    return {(ln, code): sym for sym, (code, ln) in _canonical_codes(bits, vals).items()}


class _Bits:
    """MSB-first reader over an UNSTUFFED entropy segment."""

    __slots__ = ("d", "i", "acc", "n")

    def __init__(self, d: bytes):
        self.d = d
        self.i = 0
        self.acc = 0
        self.n = 0

    def bit(self) -> int:
        if self.n == 0:
            if self.i >= len(self.d):
                # T.81 allows the final code to be padded with 1-bits;
                # feeding 0s instead makes truncation fail loudly in
                # the Huffman walk rather than fabricate EOBs
                raise ValueError("JPEG entropy segment truncated")
            self.acc = self.d[self.i]
            self.i += 1
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v


def _receive_extend(bits: "_Bits", s: int) -> int:
    if s == 0:
        return 0
    v = bits.bits(s)
    if v < (1 << (s - 1)):
        v -= (1 << s) - 1
    return v


def _huff_decode(bits: "_Bits", table: Dict[Tuple[int, int], int]) -> int:
    code = 0
    for ln in range(1, 17):
        code = (code << 1) | bits.bit()
        sym = table.get((ln, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code")


def _split_entropy(buf: bytes, pos: int) -> Tuple[List[bytes], int]:
    """Entropy-coded data from ``pos``: unstuff 0xFF00, split at RSTn,
    stop at the first real marker. Returns (segments, end_pos)."""
    segs: List[bytes] = []
    cur = bytearray()
    i = pos
    n = len(buf)
    while i < n:
        b = buf[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        m = buf[i + 1] if i + 1 < n else 0xD9
        if m == 0x00:
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= m <= 0xD7:  # RSTn
            segs.append(bytes(cur))
            cur = bytearray()
            i += 2
        else:
            break
    segs.append(bytes(cur))
    return segs, i


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JPEG → (h, w, 3) uint8 RGB (grayscale replicates)."""
    if not payload.startswith(b"\xff\xd8"):
        raise ValueError("not a JPEG (missing SOI)")
    qt: Dict[int, np.ndarray] = {}
    huff_dc: Dict[int, Dict[Tuple[int, int], int]] = {}
    huff_ac: Dict[int, Dict[Tuple[int, int], int]] = {}
    frame = None  # (h, w, [(cid, hs, vs, tq)])
    ri = 0
    progressive = False
    prog_state = None
    pos = 2
    n = len(payload)
    while pos < n:
        if payload[pos] != 0xFF:
            raise ValueError("JPEG marker expected")
        while pos < n and payload[pos] == 0xFF:
            pos += 1  # fill bytes
        marker = payload[pos]
        pos += 1
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone
        (seg_len,) = struct.unpack_from(">H", payload, pos)
        data = payload[pos + 2 : pos + seg_len]
        pos += seg_len
        if marker == 0xDB:  # DQT (possibly several tables)
            i = 0
            while i < len(data):
                pq, tq = data[i] >> 4, data[i] & 0xF
                i += 1
                if pq == 0:
                    tbl = np.frombuffer(data, np.uint8, 64, i).astype(np.int64)
                    i += 64
                else:
                    tbl = np.frombuffer(data, ">u2", 64, i).astype(np.int64)
                    i += 128
                out = np.empty(64, np.int64)
                out[ZIGZAG] = tbl  # store in raster order
                qt[tq] = out
        elif marker in (0xC0, 0xC1):  # SOF0 / SOF1
            prec, h, w, nc = data[0], *struct.unpack_from(">HH", data, 1), data[5]
            if prec != 8:
                raise ValueError(f"unsupported JPEG precision {prec}")
            comps = []
            for c in range(nc):
                cid, samp, tq_i = data[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, samp >> 4, samp & 0xF, tq_i))
            frame = (h, w, comps)
        elif marker == 0xC2:  # SOF2: progressive DCT
            prec, h, w, nc = data[0], *struct.unpack_from(">HH", data, 1), data[5]
            if prec != 8:
                raise ValueError(f"unsupported JPEG precision {prec}")
            comps = []
            for c in range(nc):
                cid, samp, tq_i = data[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, samp >> 4, samp & 0xF, tq_i))
            frame = (h, w, comps)
            progressive = True
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(f"unsupported JPEG mode (SOF marker 0x{marker:02X})")
        elif marker == 0xC4:  # DHT (possibly several tables)
            i = 0
            while i < len(data):
                tc, th = data[i] >> 4, data[i] & 0xF
                bits_spec = list(data[i + 1 : i + 17])
                cnt = sum(bits_spec)
                vals = list(data[i + 17 : i + 17 + cnt])
                i += 17 + cnt
                (huff_dc if tc == 0 else huff_ac)[th] = _decode_table(bits_spec, vals)
        elif marker == 0xDD:  # DRI
            (ri,) = struct.unpack_from(">H", data, 0)
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = data[0]
            scan = []
            for c in range(ns):
                cs, tt = data[1 + 2 * c], data[2 + 2 * c]
                scan.append((cs, tt >> 4, tt & 0xF))
            segs, pos = _split_entropy(payload, pos)
            if not progressive:
                # baseline: exactly one scan, decode and return
                return _decode_scan(frame, scan, qt, huff_dc, huff_ac, ri, segs)
            ss, se = data[1 + 2 * ns], data[2 + 2 * ns]
            ahal = data[3 + 2 * ns]
            if prog_state is None:
                prog_state = _ProgState(frame)
            _progressive_scan(
                prog_state, scan, huff_dc, huff_ac, ri, segs,
                ss, se, ahal >> 4, ahal & 0xF,
            )
        # APPn / COM / others: skipped
    if progressive and prog_state is not None:
        return _reconstruct_progressive(prog_state, qt)
    raise ValueError("JPEG has no SOS scan")


def _decode_scan(frame, scan, qt, huff_dc, huff_ac, ri, segs) -> np.ndarray:
    h, w, comps = frame
    by_id = {cid: (hs, vs, tq) for cid, hs, vs, tq in comps}
    order = []  # (hs, vs, qtbl, dc_table, ac_table) in scan order
    for cs, td, ta in scan:
        hs, vs, tq = by_id[cs]
        order.append((hs, vs, qt[tq], huff_dc[td], huff_ac[ta]))
    hmax = max(o[0] for o in order)
    vmax = max(o[1] for o in order)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    coeffs = [
        np.zeros((mcuy * vs, mcux * hs, 64), np.int64) for hs, vs, *_ in order
    ]
    n_mcu = mcux * mcuy
    mcu_i = 0
    seg_i = 0
    bits = _Bits(segs[0])
    preds = [0] * len(order)
    while mcu_i < n_mcu:
        if ri and mcu_i and mcu_i % ri == 0:
            seg_i += 1  # restart: new segment, DC predictors reset
            if seg_i >= len(segs):
                raise ValueError("JPEG missing restart segment")
            bits = _Bits(segs[seg_i])
            preds = [0] * len(order)
        my, mx = divmod(mcu_i, mcux)
        for ci, (hs, vs, qtbl, dct, act) in enumerate(order):
            for v in range(vs):
                for hh in range(hs):
                    blk = np.zeros(64, np.int64)
                    s = _huff_decode(bits, dct)
                    preds[ci] += _receive_extend(bits, s)
                    blk[0] = preds[ci]
                    k = 1
                    while k < 64:
                        rs = _huff_decode(bits, act)
                        r, s = rs >> 4, rs & 0xF
                        if s == 0:
                            if r == 15:  # ZRL
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise ValueError("JPEG AC run overflow")
                        blk[k] = _receive_extend(bits, s)
                        k += 1
                    coeffs[ci][my * vs + v, mx * hs + hh] = blk * qtbl[ZIGZAG]
        mcu_i += 1
    samps = [(hs, vs) for hs, vs, *_rest in order]
    return _planes_to_rgb(coeffs, samps, hmax, vmax, h, w)


def _planes_to_rgb(dequant, samps, hmax, vmax, h, w) -> np.ndarray:
    """(bh, bw, 64) DEQUANTIZED zigzag coefficient arrays → RGB image:
    one einsum IDCT per component, nearest chroma upsample, JFIF
    YCbCr→RGB. Shared by the sequential and progressive paths."""
    planes = []
    for c, (hs, vs) in zip(dequant, samps):
        bh, bw = c.shape[0], c.shape[1]
        rast = np.zeros((bh, bw, 64), np.float64)
        rast[:, :, ZIGZAG] = c  # zigzag -> raster
        blocks = rast.reshape(bh, bw, 8, 8)
        spatial = np.einsum("ij,abjk,kl->abil", _A.T, blocks, _A) + 128.0
        plane = spatial.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
        plane = np.repeat(np.repeat(plane, vmax // vs, 0), hmax // hs, 1)
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        y = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return np.repeat(y[:, :, None], 3, axis=2)
    if len(planes) != 3:
        raise ValueError(f"unsupported JPEG component count {len(planes)}")
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# progressive (SOF2) decoding — T.81 Annex G: coefficients accumulate
# across scans (spectral selection bands + successive-approximation bit
# planes); dequantization and the IDCT run ONCE at EOI.


class _ProgState:
    """Per-component raw-coefficient accumulators at MCU-padded grid
    size, plus the component geometry both scan shapes need."""

    def __init__(self, frame):
        h, w, comps = frame
        self.h, self.w = h, w
        self.comps = comps  # [(cid, hs, vs, tq)] frame order
        self.hmax = max(c[1] for c in comps)
        self.vmax = max(c[2] for c in comps)
        self.mcux = -(-w // (8 * self.hmax))
        self.mcuy = -(-h // (8 * self.vmax))
        self.coef = []  # (bh_padded, bw_padded, 64) int32, zigzag order
        self.true_bw = []  # non-interleaved scan grid (true comp dims)
        self.true_bh = []
        for _cid, hs, vs, _tq in comps:
            self.coef.append(
                np.zeros((self.mcuy * vs, self.mcux * hs, 64), np.int32)
            )
            cw = -(-w * hs // self.hmax)
            ch = -(-h * vs // self.vmax)
            self.true_bw.append(-(-cw // 8))
            self.true_bh.append(-(-ch // 8))

    def comp_index(self, cid: int) -> int:
        for i, c in enumerate(self.comps):
            if c[0] == cid:
                return i
        raise ValueError(f"scan references unknown component {cid}")


def _refine_nonzero(coef, zi, bits, p1):
    """AC-refinement correction bit for an already-nonzero coefficient."""
    if bits.bit():
        v = int(coef[zi])
        if (abs(v) & p1) == 0:
            coef[zi] = v + p1 if v >= 0 else v - p1


def _progressive_scan(st, scan, huff_dc, huff_ac, ri, segs, ss, se, ah, al):
    if ss == 0:
        _progressive_dc_scan(st, scan, huff_dc, ri, segs, ah, al)
    else:
        if len(scan) != 1:
            raise ValueError("progressive AC scan must be non-interleaved")
        _progressive_ac_scan(st, scan[0], huff_ac, ri, segs, ss, se, ah, al)


def _progressive_dc_scan(st, scan, huff_dc, ri, segs, ah, al):
    idxs = [st.comp_index(cs) for cs, _td, _ta in scan]
    tables = [huff_dc.get(td) for _cs, td, _ta in scan]
    interleaved = len(scan) > 1
    n_units = (
        st.mcux * st.mcuy
        if interleaved
        else st.true_bw[idxs[0]] * st.true_bh[idxs[0]]
    )
    seg_i = 0
    bits = _Bits(segs[0])
    preds = [0] * len(scan)
    for u in range(n_units):
        if ri and u and u % ri == 0:
            seg_i += 1
            if seg_i >= len(segs):
                raise ValueError("JPEG missing restart segment")
            bits = _Bits(segs[seg_i])
            preds = [0] * len(scan)
        for si, ci in enumerate(idxs):
            _cid, hs, vs, _tq = st.comps[ci]
            if interleaved:
                my, mx = divmod(u, st.mcux)
                blocks = [
                    (my * vs + v, mx * hs + hh)
                    for v in range(vs)
                    for hh in range(hs)
                ]
            else:
                by, bx = divmod(u, st.true_bw[ci])
                blocks = [(by, bx)]
            for by, bx in blocks:
                blk = st.coef[ci]
                if ah == 0:  # first DC scan: diff-coded, scaled by 2^al
                    s = _huff_decode(bits, tables[si])
                    preds[si] += _receive_extend(bits, s)
                    blk[by, bx, 0] = preds[si] << al
                else:  # refinement: one bit per block
                    if bits.bit():
                        blk[by, bx, 0] = int(blk[by, bx, 0]) | (1 << al)


def _progressive_ac_scan(st, comp_scan, huff_ac, ri, segs, ss, se, ah, al):
    cs, _td, ta = comp_scan
    ci = st.comp_index(cs)
    table = huff_ac.get(ta)
    bw, bh = st.true_bw[ci], st.true_bh[ci]
    coef3 = st.coef[ci]
    p1 = 1 << al
    seg_i = 0
    bits = _Bits(segs[0])
    eobrun = 0
    for u in range(bw * bh):
        if ri and u and u % ri == 0:
            seg_i += 1
            if seg_i >= len(segs):
                raise ValueError("JPEG missing restart segment")
            bits = _Bits(segs[seg_i])
            eobrun = 0
        by, bx = divmod(u, bw)
        coef = coef3[by, bx]
        if ah == 0:  # first AC scan for this band / bit position
            if eobrun > 0:
                eobrun -= 1
                continue
            k = ss
            while k <= se:
                rs = _huff_decode(bits, table)
                r, s = rs >> 4, rs & 0xF
                if s == 0:
                    if r == 15:  # ZRL
                        k += 16
                        continue
                    eobrun = (1 << r) - 1
                    if r:
                        eobrun += bits.bits(r)
                    break
                k += r
                if k > se:
                    raise ValueError("JPEG AC run overflow")
                coef[k] = _receive_extend(bits, s) << al
                k += 1
        else:  # refinement scan (the libjpeg correction-bit walk)
            k = ss
            if eobrun == 0:
                while k <= se:
                    rs = _huff_decode(bits, table)
                    r, s = rs >> 4, rs & 0xF
                    if s == 0:
                        if r < 15:  # EOBn: finish block under eob rules
                            eobrun = (1 << r)
                            if r:
                                eobrun += bits.bits(r)
                            break
                        newval = 0  # ZRL: skip 16 zero-history coeffs
                    else:
                        if s != 1:
                            raise ValueError("bad AC refinement size")
                        newval = p1 if bits.bit() else -p1
                    # advance r zero-HISTORY positions; history-nonzero
                    # coefficients crossed on the way receive their
                    # correction bit
                    while k <= se:
                        if coef[k] != 0:
                            _refine_nonzero(coef, k, bits, p1)
                        else:
                            if r == 0:
                                break
                            r -= 1
                        k += 1
                    if newval and k <= se:
                        coef[k] = newval
                    k += 1
            if eobrun > 0:
                while k <= se:
                    if coef[k] != 0:
                        _refine_nonzero(coef, k, bits, p1)
                    k += 1
                eobrun -= 1


def _reconstruct_progressive(st, qt) -> np.ndarray:
    dequant = []
    samps = []
    for ci, (_cid, hs, vs, tq) in enumerate(st.comps):
        dequant.append(st.coef[ci].astype(np.int64) * qt[tq][ZIGZAG])
        samps.append((hs, vs))
    return _planes_to_rgb(dequant, samps, st.hmax, st.vmax, st.h, st.w)


# ---------------------------------------------------------------------------
# encoder


class _BitWriter:
    __slots__ = ("out", "acc", "n")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        for k in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> k) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self) -> None:
        if self.n:
            self.acc = (self.acc << (8 - self.n)) | ((1 << (8 - self.n)) - 1)
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.n = 0


def _quality_tables(quality: int) -> Tuple[np.ndarray, np.ndarray]:
    """libjpeg-style quality scaling of the Annex-K base tables."""
    q = min(max(int(quality), 1), 100)
    scale = 5000 // q if q < 50 else 200 - 2 * q
    lum = np.clip((QT_LUM * scale + 50) // 100, 1, 255)
    chrom = np.clip((QT_CHROM * scale + 50) // 100, 1, 255)
    return lum, chrom


def _magnitude(v: int) -> Tuple[int, int]:
    """(category s, s-bit code) for a DC diff / AC coefficient."""
    a = abs(v)
    s = int(a).bit_length()
    code = v if v >= 0 else v + (1 << s) - 1
    return s, code


def _pad_to(img: np.ndarray, mult_h: int, mult_w: int) -> np.ndarray:
    h, w = img.shape
    ph = (-h) % mult_h
    pw = (-w) % mult_w
    if ph or pw:
        img = np.pad(img, ((0, ph), (0, pw)), mode="edge")
    return img


def _encode_plane(
    plane: np.ndarray,
    qtbl: np.ndarray,
) -> np.ndarray:
    """float plane (multiple-of-8 dims) → (by, bw, 64) quantized zigzag
    coefficients."""
    h, w = plane.shape
    blocks = plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3) - 128.0
    f = np.einsum("ij,abjk,kl->abil", _A, blocks, _A.T)
    q = np.round(f.reshape(h // 8, w // 8, 64) / qtbl.astype(np.float64)).astype(
        np.int64
    )
    # zz[k] = raster[ZIGZAG[k]]: reorder the raster vector into zigzag
    return q[:, :, ZIGZAG]


def _dht_segment(tc: int, th: int, spec) -> bytes:
    bits_spec, vals = spec
    return bytes([tc << 4 | th] + bits_spec + list(vals))


def encode_jpeg(
    img: np.ndarray,
    quality: int = 90,
    subsampling: str = "4:4:4",
    restart_interval: int = 0,
) -> bytes:
    """(h, w, 3) uint8 RGB → baseline JFIF bytes."""
    if subsampling not in ("4:4:4", "4:2:0"):
        raise ValueError(f"unsupported subsampling {subsampling}")
    img = np.asarray(img, np.uint8)
    h, w, _ = img.shape
    rgb = img.astype(np.float64)
    r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    sub = subsampling == "4:2:0"
    if sub:
        y_p = _pad_to(y, 16, 16)
        cb_p = _pad_to(cb, 16, 16)
        cr_p = _pad_to(cr, 16, 16)
        # 2x2 box-mean chroma downsample
        cb_p = cb_p.reshape(cb_p.shape[0] // 2, 2, cb_p.shape[1] // 2, 2).mean((1, 3))
        cr_p = cr_p.reshape(cr_p.shape[0] // 2, 2, cr_p.shape[1] // 2, 2).mean((1, 3))
        samps = [(2, 2), (1, 1), (1, 1)]
    else:
        y_p = _pad_to(y, 8, 8)
        cb_p = _pad_to(cb, 8, 8)
        cr_p = _pad_to(cr, 8, 8)
        samps = [(1, 1), (1, 1), (1, 1)]
    qlum, qchrom = _quality_tables(quality)
    planes_q = [
        _encode_plane(y_p, qlum),
        _encode_plane(cb_p, qchrom),
        _encode_plane(cr_p, qchrom),
    ]
    dc_codes = [_canonical_codes(*HUFF_DC_LUM)] + [_canonical_codes(*HUFF_DC_CHROM)] * 2
    ac_codes = [_canonical_codes(*HUFF_AC_LUM)] + [_canonical_codes(*HUFF_AC_CHROM)] * 2

    # ---- headers
    out = bytearray(b"\xff\xd8")  # SOI
    out += (
        b"\xff\xe0"
        + struct.pack(">H", 16)
        + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    )
    for tq, tbl in ((0, qlum), (1, qchrom)):
        zz = tbl[ZIGZAG].astype(np.uint8).tobytes()
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq]) + zz
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([3])
    for ci, (hs, vs) in enumerate(samps):
        sof += bytes([ci + 1, hs << 4 | vs, 0 if ci == 0 else 1])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    dht = (
        _dht_segment(0, 0, HUFF_DC_LUM)
        + _dht_segment(1, 0, HUFF_AC_LUM)
        + _dht_segment(0, 1, HUFF_DC_CHROM)
        + _dht_segment(1, 1, HUFF_AC_CHROM)
    )
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(dht)) + dht
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    # ---- entropy-coded data
    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    writer = _BitWriter()
    preds = [0, 0, 0]
    rst = 0
    for mcu_i in range(mcux * mcuy):
        if restart_interval and mcu_i and mcu_i % restart_interval == 0:
            writer.flush()
            out += writer.out
            writer = _BitWriter()
            out += bytes([0xFF, 0xD0 + rst])
            rst = (rst + 1) & 7
            preds = [0, 0, 0]
        my, mx = divmod(mcu_i, mcux)
        for ci, (hs, vs) in enumerate(samps):
            for v in range(vs):
                for hh in range(hs):
                    blk = planes_q[ci][my * vs + v, mx * hs + hh]
                    diff = int(blk[0]) - preds[ci]
                    preds[ci] = int(blk[0])
                    s, code = _magnitude(diff)
                    c, ln = dc_codes[ci][s]
                    writer.write(c, ln)
                    if s:
                        writer.write(code, s)
                    run = 0
                    last_nz = int(np.max(np.nonzero(blk)[0])) if np.any(blk[1:]) else 0
                    for k in range(1, 64):
                        vco = int(blk[k])
                        if vco == 0:
                            run += 1
                            continue
                        while run > 15:
                            c, ln = ac_codes[ci][0xF0]  # ZRL
                            writer.write(c, ln)
                            run -= 16
                        s, code = _magnitude(vco)
                        c, ln = ac_codes[ci][(run << 4) | s]
                        writer.write(c, ln)
                        writer.write(code, s)
                        run = 0
                        if k == last_nz:
                            break
                    if last_nz < 63:
                        c, ln = ac_codes[ci][0x00]  # EOB
                        writer.write(c, ln)
    writer.flush()
    out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# progressive (SOF2) encoder — spectral selection + one bit of
# successive approximation, so every decoder path (DC first/refine, AC
# first with EOB runs, AC refinement correction bits) is exercised by a
# true roundtrip. Entropy coding is lossless, so the progressive decode
# of this output is pixel-identical to the baseline decode of the same
# quantized coefficients (the test pins exactly that).

# Uniform-length canonical Huffman specs: the STANDARD sequential AC
# tables carry no EOBn symbols (r>0, s=0), so progressive scans define
# their own tables in the DHT — all 12 DC categories at 4 bits
# (Kraft 12/16), and every (r, s) symbol incl. EOB1..EOB14 at 9 bits
# (176 + 14 = 190 symbols ≤ 2^9).
_PROG_DC_SPEC = ([0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0], list(range(12)))
_PROG_AC_SYMS = sorted(
    {(r << 4) | s for r in range(16) for s in range(1, 11)}
    | {0x00, 0xF0}
    | {r << 4 for r in range(1, 15)}  # EOB1..EOB14
)
_PROG_AC_SPEC = (
    [0, 0, 0, 0, 0, 0, 0, 0, len(_PROG_AC_SYMS), 0, 0, 0, 0, 0, 0, 0],
    _PROG_AC_SYMS,
)


class _AcFirstScan:
    """AC first-scan emitter for one band: run/size symbols + EOB-run
    accumulation across blocks."""

    def __init__(self, writer, codes):
        self.w = writer
        self.codes = codes
        self.eobrun = 0

    def flush_eob(self):
        if self.eobrun == 0:
            return
        r = self.eobrun.bit_length() - 1
        c, ln = self.codes[r << 4]
        self.w.write(c, ln)
        if r:
            self.w.write(self.eobrun - (1 << r), r)
        self.eobrun = 0

    def block(self, vals, ss, se):
        run = 0
        for k in range(ss, se + 1):
            v = int(vals[k])
            if v == 0:
                run += 1
                continue
            self.flush_eob()
            while run > 15:
                c, ln = self.codes[0xF0]
                self.w.write(c, ln)
                run -= 16
            s, code = _magnitude(v)
            c, ln = self.codes[(run << 4) | s]
            self.w.write(c, ln)
            self.w.write(code, s)
            run = 0
        if run > 0:
            self.eobrun += 1
            if self.eobrun == 0x7FFF:
                self.flush_eob()


class _AcRefineScan:
    """AC refinement emitter (the libjpeg encode_mcu_AC_refine walk):
    newly-significant coefficients as (run, 1) + sign, correction bits
    for history coefficients buffered and appended in order, EOB runs
    carrying their buffered bits."""

    def __init__(self, writer, codes, al):
        self.w = writer
        self.codes = codes
        self.al = al
        self.eobrun = 0
        self.eob_bits = []

    def _flush_eob(self):
        if self.eobrun > 0:
            r = self.eobrun.bit_length() - 1
            c, ln = self.codes[r << 4]
            self.w.write(c, ln)
            if r:
                self.w.write(self.eobrun - (1 << r), r)
            self.eobrun = 0
        for b in self.eob_bits:
            self.w.write(b, 1)
        self.eob_bits = []

    def block(self, coefs, ss, se):
        absv = [abs(int(coefs[k])) >> self.al for k in range(64)]
        eob = ss - 1
        for k in range(ss, se + 1):
            if absv[k] == 1:
                eob = k
        r = 0
        br = []
        for k in range(ss, se + 1):
            t = absv[k]
            if t == 0:
                r += 1
                continue
            while r > 15 and k <= eob:
                self._flush_eob()
                c, ln = self.codes[0xF0]
                self.w.write(c, ln)
                r -= 16
                for b in br:
                    self.w.write(b, 1)
                br = []
            if t > 1:  # history coefficient: correction bit only
                br.append(t & 1)
                continue
            # newly significant
            self._flush_eob()
            c, ln = self.codes[(r << 4) | 1]
            self.w.write(c, ln)
            self.w.write(1 if int(coefs[k]) >= 0 else 0, 1)
            for b in br:
                self.w.write(b, 1)
            br = []
            r = 0
        if r > 0 or br:
            self.eobrun += 1
            self.eob_bits.extend(br)
            if self.eobrun == 0x7FFF:
                self._flush_eob()

    def finish(self):
        self._flush_eob()


def encode_jpeg_progressive(
    img: np.ndarray,
    quality: int = 90,
    subsampling: str = "4:4:4",
) -> bytes:
    """(h, w, 3) uint8 RGB → progressive (SOF2) JFIF bytes.

    Scan script (T.81 Annex G shapes, all decoder paths covered):
    DC interleaved Al=1 → per-component AC first scans Al=1 (luma split
    into bands 1–5 and 6–63, chroma 1–63) → DC refinement → matching
    AC refinement scans. No restart intervals (decoder supports them;
    this writer keeps scans contiguous)."""
    if subsampling not in ("4:4:4", "4:2:0"):
        raise ValueError(f"unsupported subsampling {subsampling}")
    img = np.asarray(img, np.uint8)
    h, w, _ = img.shape
    rgb = img.astype(np.float64)
    r_, g_, b_ = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
    y = 0.299 * r_ + 0.587 * g_ + 0.114 * b_
    cb = 128.0 - 0.168736 * r_ - 0.331264 * g_ + 0.5 * b_
    cr = 128.0 + 0.5 * r_ - 0.418688 * g_ - 0.081312 * b_
    sub = subsampling == "4:2:0"
    if sub:
        y_p = _pad_to(y, 16, 16)
        cb_p = _pad_to(cb, 16, 16)
        cr_p = _pad_to(cr, 16, 16)
        cb_p = cb_p.reshape(cb_p.shape[0] // 2, 2, cb_p.shape[1] // 2, 2).mean((1, 3))
        cr_p = cr_p.reshape(cr_p.shape[0] // 2, 2, cr_p.shape[1] // 2, 2).mean((1, 3))
        samps = [(2, 2), (1, 1), (1, 1)]
    else:
        y_p = _pad_to(y, 8, 8)
        cb_p = _pad_to(cb, 8, 8)
        cr_p = _pad_to(cr, 8, 8)
        samps = [(1, 1), (1, 1), (1, 1)]
    qlum, qchrom = _quality_tables(quality)
    planes_q = [
        _encode_plane(y_p, qlum),
        _encode_plane(cb_p, qchrom),
        _encode_plane(cr_p, qchrom),
    ]
    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    true_bw = [-(-(-(-w * hs // hmax)) // 8) for hs, _vs in samps]
    true_bh = [-(-(-(-h * vs // vmax)) // 8) for _hs, vs in samps]
    dc_codes = _canonical_codes(*_PROG_DC_SPEC)
    ac_codes = _canonical_codes(*_PROG_AC_SPEC)

    out = bytearray(b"\xff\xd8")
    out += (
        b"\xff\xe0"
        + struct.pack(">H", 16)
        + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    )
    for tq, tbl in ((0, qlum), (1, qchrom)):
        zz = tbl[ZIGZAG].astype(np.uint8).tobytes()
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq]) + zz
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([3])
    for ci, (hs, vs) in enumerate(samps):
        sof += bytes([ci + 1, hs << 4 | vs, 0 if ci == 0 else 1])
    out += b"\xff\xc2" + struct.pack(">H", 2 + len(sof)) + sof
    dht = _dht_segment(0, 0, _PROG_DC_SPEC) + _dht_segment(1, 0, _PROG_AC_SPEC)
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(dht)) + dht

    def sos_header(comps, ss, se, ah, al):
        body = bytes([len(comps)])
        for cid in comps:
            body += bytes([cid, 0x00])  # DC table 0 / AC table 0
        body += bytes([ss, se, (ah << 4) | al])
        return b"\xff\xda" + struct.pack(">H", 2 + len(body)) + body

    # ---- scan 1: DC, interleaved, Ah=0 Al=1 (diffs of dc >> 1)
    out += sos_header([1, 2, 3], 0, 0, 0, 1)
    wtr = _BitWriter()
    preds = [0, 0, 0]
    for mcu_i in range(mcux * mcuy):
        my, mx = divmod(mcu_i, mcux)
        for ci, (hs, vs) in enumerate(samps):
            for v in range(vs):
                for hh in range(hs):
                    dc = int(planes_q[ci][my * vs + v, mx * hs + hh, 0]) >> 1
                    diff = dc - preds[ci]
                    preds[ci] = dc
                    s, code = _magnitude(diff)
                    c, ln = dc_codes[s]
                    wtr.write(c, ln)
                    if s:
                        wtr.write(code, s)
    wtr.flush()
    out += wtr.out

    def pt(v):  # AC point transform: truncate toward zero by 2^1
        v = int(v)
        return -((-v) >> 1) if v < 0 else v >> 1

    # ---- AC first scans, Al=1: luma bands 1-5 / 6-63, chroma 1-63
    ac_bands = [(0, 1, 5), (0, 6, 63), (1, 1, 63), (2, 1, 63)]
    for ci, ss, se in ac_bands:
        out += sos_header([ci + 1], ss, se, 0, 1)
        wtr = _BitWriter()
        scan = _AcFirstScan(wtr, ac_codes)
        for u in range(true_bw[ci] * true_bh[ci]):
            by, bx = divmod(u, true_bw[ci])
            vals = [pt(v) for v in planes_q[ci][by, bx]]
            scan.block(vals, ss, se)
        scan.flush_eob()
        wtr.flush()
        out += wtr.out

    # ---- DC refinement, Ah=1 Al=0: the low bit of every DC
    out += sos_header([1, 2, 3], 0, 0, 1, 0)
    wtr = _BitWriter()
    for mcu_i in range(mcux * mcuy):
        my, mx = divmod(mcu_i, mcux)
        for ci, (hs, vs) in enumerate(samps):
            for v in range(vs):
                for hh in range(hs):
                    wtr.write(int(planes_q[ci][my * vs + v, mx * hs + hh, 0]) & 1, 1)
    wtr.flush()
    out += wtr.out

    # ---- AC refinement scans, Ah=1 Al=0
    for ci, ss, se in ac_bands:
        out += sos_header([ci + 1], ss, se, 1, 0)
        wtr = _BitWriter()
        scan = _AcRefineScan(wtr, ac_codes, al=0)
        for u in range(true_bw[ci] * true_bh[ci]):
            by, bx = divmod(u, true_bw[ci])
            scan.block(planes_q[ci][by, bx], ss, se)
        scan.finish()
        wtr.flush()
        out += wtr.out

    out += b"\xff\xd9"
    return bytes(out)
