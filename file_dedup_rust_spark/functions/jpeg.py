"""Baseline JPEG codec in pure numpy + stdlib — no codec library.

Round 5 made PNG decode native (stdlib zlib inflate + numpy unfilter);
this module does the same for the dominant LOSSY format, so the real
compressed-decode branch of the media ingest path (the reference
ingests user images straight into its embedding model —
/root/reference/backend/src/worker/deduplicator.rs:78-84) runs in the
default sandbox for JPEG payloads too, with PIL needed only for the
long tail (WebP/TIFF/...).

Scope (ITU-T T.81 baseline sequential DCT, the format ~all JPEG files
use): 8-bit precision, Huffman entropy coding, grayscale or YCbCr with
any sampling factors up to 2x2 (4:4:4 / 4:2:2 / 4:2:0), restart
markers, multi-segment DQT/DHT.  Rejected loudly: progressive (SOF2),
arithmetic coding, 12-bit, hierarchical — decode_image quarantines
those rows.  The decoder returns LUMA: the Y channel of a JFIF file
*is* BT.601 luma, the exact quantity every image feature in this
engine keys on, so chroma blocks are entropy-decoded (the bitstream
demands it) but skip dequant/IDCT — deliberate work avoidance, not a
correctness shortcut.

The encoder (gray, color 4:4:4, or 4:2:0 via ``subsample=True``)
exists so tests can exercise the decoder without any fixture files:
standard Annex K quantization tables scaled by libjpeg's quality
formula, standard Annex K Huffman tables.  Vectorized where it
matters: DCT/IDCT run as one einsum over all blocks of a plane;
per-block work is only the entropy coding, which is proportional to
compressed size, not pixels.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# tables (ITU-T T.81 Annex K) and derived constants
# ---------------------------------------------------------------------------

_QLUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)

_QCHR = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)


def _zigzag() -> np.ndarray:
    """Raster index for each zigzag position (generated, not typed)."""
    order = []
    for s in range(15):
        diag = [(i, s - i) for i in range(max(0, s - 7), min(s, 7) + 1)]
        # even diagonals run bottom-left -> top-right, odd the reverse
        for i, j in diag if s % 2 else reversed(diag):
            order.append(i * 8 + j)
    return np.array(order, dtype=np.int64)


_ZZ = _zigzag()

# standard Huffman tables: (bits[1..16], symbol values)
_DC_LUM = (
    bytes([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]),
    bytes(range(12)),
)
_DC_CHR = (
    bytes([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]),
    bytes(range(12)),
)
_AC_LUM = (
    bytes([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]),
    bytes([
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
    ]),
)
_AC_CHR = (
    bytes([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]),
    bytes([
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
    ]),
)


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II matrix: forward F = D B Dt, inverse
    B = Dt F D — exactly T.81's scaled cosine transform."""
    n = np.arange(8)
    d = np.cos((2 * n[None, :] + 1) * n[:, None] * np.pi / 16)
    d[0] *= np.sqrt(1.0 / 2.0)
    return d * 0.5


_DCT = _dct_matrix()


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """libjpeg quality scaling: 50 keeps Annex K verbatim, 100 -> all-1
    steps (near-lossless), 1 -> 255-clipped coarse steps."""
    q = max(1, min(100, int(quality)))
    sf = 5000 // q if q < 50 else 200 - 2 * q
    def scale(t: np.ndarray) -> np.ndarray:
        return np.clip((t * sf + 50) // 100, 1, 255)
    return scale(_QLUM), scale(_QCHR)


# ---------------------------------------------------------------------------
# bit I/O with 0xFF byte stuffing
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, val: int, nbits: int) -> None:
        if nbits <= 0:
            return
        self.acc = (self.acc << nbits) | (val & ((1 << nbits) - 1))
        self.n += nbits
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(b)
            if b == 0xFF:  # byte stuffing
                self.buf.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> None:
        if self.n:
            pad = 8 - self.n
            b = ((self.acc << pad) | ((1 << pad) - 1)) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)
            self.acc = 0
            self.n = 0


class _BitReader:
    """Reads entropy-coded bits, un-stuffing 0xFF00; a bare marker in
    the stream is a bitstream error except RST, consumed by restart()."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.d = data
        self.p = pos
        self.acc = 0
        self.n = 0

    def bit(self) -> int:
        if self.n == 0:
            if self.p >= len(self.d):
                raise ValueError("JPEG entropy stream truncated")
            b = self.d[self.p]
            if b == 0xFF:
                nxt = self.d[self.p + 1] if self.p + 1 < len(self.d) else None
                if nxt != 0x00:
                    raise ValueError(
                        f"unexpected marker 0xFF{nxt:02X} in entropy data"
                        if nxt is not None else "JPEG truncated at 0xFF"
                    )
                self.p += 2
            else:
                self.p += 1
            self.acc = b
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def receive(self, nbits: int) -> int:
        v = 0
        for _ in range(nbits):
            v = (v << 1) | self.bit()
        return v

    def restart(self) -> None:
        """Byte-align and consume an RSTn marker (resets nothing here —
        the caller resets DC predictors)."""
        self.n = 0
        if (
            self.p + 1 >= len(self.d)
            or self.d[self.p] != 0xFF
            or not (0xD0 <= self.d[self.p + 1] <= 0xD7)
        ):
            raise ValueError("expected RST marker at restart interval")
        self.p += 2


# ---------------------------------------------------------------------------
# Huffman coding
# ---------------------------------------------------------------------------


def _build_enc(bits: bytes, vals: bytes) -> dict[int, tuple[int, int]]:
    enc: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            enc[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return enc


def _build_dec(bits: bytes, vals: bytes):
    """Canonical mincode/maxcode/valptr decoder state (T.81 F.2.2.3)."""
    if sum(bits) != len(vals) or sum(bits) == 0:
        raise ValueError("malformed DHT segment")
    maxcode = [-1] * 17
    mincode = [0] * 17
    valptr = [0] * 17
    code = 0
    k = 0
    for length in range(1, 17):
        if bits[length - 1]:
            valptr[length] = k
            mincode[length] = code
            code += bits[length - 1]
            k += bits[length - 1]
            maxcode[length] = code - 1
        code <<= 1
    return maxcode, mincode, valptr, vals


def _decode_sym(br: _BitReader, tbl) -> int:
    maxcode, mincode, valptr, vals = tbl
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.bit()
        if maxcode[length] >= code:
            return vals[valptr[length] + code - mincode[length]]
    raise ValueError("invalid Huffman code in JPEG stream")


def _extend(v: int, size: int) -> int:
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


def _plane_to_zigzag_blocks(plane: np.ndarray, qtab_zz: np.ndarray) -> np.ndarray:
    """(H8, W8) uint8-valued plane (8-multiple dims) -> quantized
    zigzag coefficients (nby, nbx, 64) int64, one einsum for all DCTs."""
    h, w = plane.shape
    blocks = (
        plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3)
        .astype(np.float64) - 128.0
    )
    coef = np.einsum("ij,abjk,lk->abil", _DCT, blocks, _DCT, optimize=True)
    zz = coef.reshape(h // 8, w // 8, 64)[..., _ZZ]
    q = np.round(zz / qtab_zz[None, None, :]).astype(np.int64)
    # baseline Huffman categories stop at size 10 for AC (|v| <= 1023);
    # an adversarial block at quality 100 (step 1) can just exceed it
    q[..., 1:] = np.clip(q[..., 1:], -1023, 1023)
    return q


def _pad_edge(plane: np.ndarray, mult: int) -> np.ndarray:
    h, w = plane.shape
    ph = (-h) % mult
    pw = (-w) % mult
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    return plane


def _encode_block(bw: _BitWriter, zz: np.ndarray, pred: int, dc_enc, ac_enc) -> int:
    dc = int(zz[0])
    diff = dc - pred
    size = abs(diff).bit_length()
    code, ln = dc_enc[size]
    bw.put(code, ln)
    if size:
        bw.put(diff if diff > 0 else diff + (1 << size) - 1, size)
    nz = np.nonzero(zz[1:])[0]
    last = int(nz[-1]) + 1 if nz.size else 0
    run = 0
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_enc[0xF0]  # ZRL
            bw.put(code, ln)
            run -= 16
        size = abs(v).bit_length()
        code, ln = ac_enc[(run << 4) | size]
        bw.put(code, ln)
        bw.put(v if v > 0 else v + (1 << size) - 1, size)
        run = 0
    if last < 63:
        code, ln = ac_enc[0x00]  # EOB
        bw.put(code, ln)
    return dc


def _prepare(img: np.ndarray, color: bool, quality: int, subsample: bool):
    """Shared encoder prep: color transform, padding, DCT+quantize.
    Returns (h, w, comps, planes, qlum_zz, qchr_zz) where comps is
    [(id, (h, v), tq)] and planes maps id -> (nby, nbx, 64) zigzag
    coefficient blocks."""
    if color and img.ndim == 2:
        img = np.repeat(img[..., None], 3, axis=2)
    u8 = np.clip(np.round(np.asarray(img, dtype=np.float64) * 255.0), 0, 255)
    qlum, qchr = _quality_tables(quality)
    qlum_zz = qlum[_ZZ]
    qchr_zz = qchr[_ZZ]

    if u8.ndim == 2:
        h, w = u8.shape
        comps = [(1, (1, 1), 0)]  # (id, (h, v), quant-table id)
        y = _pad_edge(u8, 8)
        planes = {1: _plane_to_zigzag_blocks(y, qlum_zz)}
    else:
        h, w, _ = u8.shape
        r, g, b = u8[..., 0], u8[..., 1], u8[..., 2]
        yp = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample:
            comps = [(1, (2, 2), 0), (2, (1, 1), 1), (3, (1, 1), 1)]
            yp = _pad_edge(yp, 16)
            # 2x2 box mean, then pad the half-res chroma plane to 8
            def half(p: np.ndarray) -> np.ndarray:
                p = _pad_edge(p, 2)
                hh, hw = p.shape
                q = p.reshape(hh // 2, 2, hw // 2, 2).mean(axis=(1, 3))
                return _pad_edge(q, 8)
            planes = {
                1: _plane_to_zigzag_blocks(yp, qlum_zz),
                2: _plane_to_zigzag_blocks(half(cb), qchr_zz),
                3: _plane_to_zigzag_blocks(half(cr), qchr_zz),
            }
        else:
            comps = [(1, (1, 1), 0), (2, (1, 1), 1), (3, (1, 1), 1)]
            planes = {
                1: _plane_to_zigzag_blocks(_pad_edge(yp, 8), qlum_zz),
                2: _plane_to_zigzag_blocks(_pad_edge(cb, 8), qchr_zz),
                3: _plane_to_zigzag_blocks(_pad_edge(cr, 8), qchr_zz),
            }
    return h, w, comps, planes, qlum_zz, qchr_zz


def _frame_headers(
    h: int, w: int, comps, qlum_zz, qchr_zz, sof_marker: bytes,
    restart_interval: int = 0,
) -> bytearray:
    """SOI + APP0 + DQT(+DQT) + optional DRI + SOFn + all DHTs."""
    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00"
    out += struct.pack(">HHBB", 1, 1, 0, 0)  # density 1x1, no thumbnail
    out += b"\xff\xdb" + struct.pack(">H", 2 + 65) + b"\x00"
    out += bytes(qlum_zz.astype(np.uint8))
    if len(comps) > 1:
        out += b"\xff\xdb" + struct.pack(">H", 2 + 65) + b"\x01"
        out += bytes(qchr_zz.astype(np.uint8))
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += sof_marker + struct.pack(">HBHHB", 8 + 3 * len(comps), 8, h, w,
                                    len(comps))
    for cid, (ch, cv), tq in comps:
        out += struct.pack("BBB", cid, (ch << 4) | cv, tq)
    for klass, tid, (bits, vals) in (
        (0, 0, _DC_LUM), (1, 0, _AC_LUM),
        *(((0, 1, _DC_CHR), (1, 1, _AC_CHR)) if len(comps) > 1 else ()),
    ):
        out += b"\xff\xc4" + struct.pack(">HB", 3 + 16 + len(vals),
                                         (klass << 4) | tid)
        out += bits + vals
    return out


def encode_jpeg(
    img: np.ndarray,
    color: bool = False,
    quality: int = 92,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """float32 [0,1] -> baseline JFIF bytes.

    (H, W) gray -> one component; ``color=True`` (or (H, W, 3) RGB
    input) -> YCbCr, 4:4:4 by default or 4:2:0 with
    ``subsample=True``.  ``restart_interval`` > 0 emits DRI + RSTn
    markers every that many MCUs (exercises the decoder's resync
    path)."""
    h, w, comps, planes, qlum_zz, qchr_zz = _prepare(
        img, color, quality, subsample
    )
    hmax = max(c[1][0] for c in comps)
    vmax = max(c[1][1] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    dc_lum_enc = _build_enc(*_DC_LUM)
    ac_lum_enc = _build_enc(*_AC_LUM)
    dc_chr_enc = _build_enc(*_DC_CHR)
    ac_chr_enc = _build_enc(*_AC_CHR)

    bw = _BitWriter()
    preds = {cid: 0 for cid, _, _ in comps}
    mcu_count = 0
    rst_idx = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                bw.flush()
                bw.buf += bytes([0xFF, 0xD0 + (rst_idx % 8)])
                rst_idx += 1
                preds = {cid: 0 for cid, _, _ in comps}
            for cid, (ch, cv), tq in comps:
                blocks = planes[cid]
                dce = dc_lum_enc if tq == 0 else dc_chr_enc
                ace = ac_lum_enc if tq == 0 else ac_chr_enc
                for by in range(cv):
                    for bx in range(ch):
                        zz = blocks[my * cv + by, mx * ch + bx]
                        preds[cid] = _encode_block(bw, zz, preds[cid], dce, ace)
            mcu_count += 1
    bw.flush()

    out = _frame_headers(h, w, comps, qlum_zz, qchr_zz, b"\xff\xc0",
                         restart_interval)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * len(comps), len(comps))
    for cid, _, tq in comps:
        out += struct.pack("BB", cid, (tq << 4) | tq)  # Td=Ta=tq here
    out += b"\x00\x3f\x00"  # Ss=0 Se=63 Ah/Al=0
    out += bw.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# progressive encoder (SOF2): spectral selection + optional successive
# approximation — exists to test the progressive decoder without any
# fixture files, the same role the baseline encoder plays
# ---------------------------------------------------------------------------


def _flat_ac_table() -> tuple[bytes, bytes]:
    """AC Huffman table for the progressive encoder: the standard 162
    run/size symbols PLUS the EOBn symbols 0x10..0xE0 (which baseline
    tables never contain — only progressive scans emit EOB runs), all
    at a flat 8 bits.  176 symbols < 255, so the single-length
    canonical code is trivially valid; compression is worse than an
    optimized table, which is irrelevant for a test fixture encoder.
    The decoder reads whatever tables the file carries."""
    syms = sorted(set(_AC_LUM[1]) | {r << 4 for r in range(1, 15)})
    bits = bytes([0] * 7 + [len(syms)] + [0] * 8)
    return bits, bytes(syms)


class _EobState:
    """Per-scan EOB-run accumulator with buffered refinement bits."""

    __slots__ = ("run", "pending")

    def __init__(self) -> None:
        self.run = 0
        self.pending: list[int] = []


def _emit_eobrun(bw: _BitWriter, ac_enc, st: _EobState) -> None:
    if st.run > 0:
        nbits = st.run.bit_length() - 1
        code, ln = ac_enc[nbits << 4]
        bw.put(code, ln)
        if nbits:
            bw.put(st.run - (1 << nbits), nbits)
        for b in st.pending:
            bw.put(b, 1)
        st.run = 0
        st.pending = []


def _enc_ac_first_block(bw, ac_enc, zz, ss, se, al, st: _EobState) -> None:
    r = 0
    for k in range(ss, se + 1):
        v = int(zz[k])
        t = v >> al if v >= 0 else -((-v) >> al)  # AC: truncate toward 0
        if t == 0:
            r += 1
            continue
        _emit_eobrun(bw, ac_enc, st)
        while r > 15:
            code, ln = ac_enc[0xF0]
            bw.put(code, ln)
            r -= 16
        size = abs(t).bit_length()
        code, ln = ac_enc[(r << 4) | size]
        bw.put(code, ln)
        bw.put(t if t > 0 else t + (1 << size) - 1, size)
        r = 0
    if r > 0:
        st.run += 1
        if st.run == 0x7FFF:
            _emit_eobrun(bw, ac_enc, st)


def _enc_ac_refine_block(bw, ac_enc, zz, ss, se, al, st: _EobState) -> None:
    absv = []
    eobpos = ss - 1
    for k in range(ss, se + 1):
        t = abs(int(zz[k])) >> al
        absv.append(t)
        if t == 1:  # newly-significant at this precision
            eobpos = k
    r = 0
    br_bits: list[int] = []
    for k in range(ss, se + 1):
        t = absv[k - ss]
        if t == 0:
            r += 1
            continue
        while r > 15 and k <= eobpos:
            _emit_eobrun(bw, ac_enc, st)
            code, ln = ac_enc[0xF0]
            bw.put(code, ln)
            r -= 16
            for b in br_bits:
                bw.put(b, 1)
            br_bits = []
        if t > 1:  # history-nonzero: buffered correction bit
            br_bits.append(t & 1)
            continue
        _emit_eobrun(bw, ac_enc, st)
        code, ln = ac_enc[(r << 4) | 1]
        bw.put(code, ln)
        r = 0
        bw.put(1 if int(zz[k]) >= 0 else 0, 1)
        for b in br_bits:
            bw.put(b, 1)
        br_bits = []
    if r > 0 or br_bits:
        st.run += 1
        st.pending.extend(br_bits)
        if st.run == 0x7FFF:
            _emit_eobrun(bw, ac_enc, st)


def _comp_block_dims(h, w, ch, cv, hmax, vmax) -> tuple[int, int]:
    """A component's own (non-interleaved) block-grid dims."""
    cw = -(-(w * ch) // hmax)
    chh = -(-(h * cv) // vmax)
    return -(-chh // 8), -(-cw // 8)


def encode_jpeg_progressive(
    img: np.ndarray,
    color: bool = False,
    quality: int = 92,
    subsample: bool = False,
    successive: bool = True,
    ac_split: int = 5,
) -> bytes:
    """float32 [0,1] -> progressive JFIF bytes (SOF2).

    Scan script: interleaved DC first, per-component AC bands split at
    ``ac_split`` (spectral selection); ``successive=True`` additionally
    point-transforms every scan by one bit (Al=1) and appends DC + AC
    refinement scans (successive approximation) — together covering
    all four progressive scan kinds the decoder implements."""
    h, w, comps, planes, qlum_zz, qchr_zz = _prepare(
        img, color, quality, subsample
    )
    hmax = max(c[1][0] for c in comps)
    vmax = max(c[1][1] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    al1 = 1 if successive else 0
    dc_enc = {0: _build_enc(*_DC_LUM), 1: _build_enc(*_DC_CHR)}
    flat = _flat_ac_table()
    ac_enc = {0: _build_enc(*flat), 1: _build_enc(*flat)}

    out = _frame_headers(h, w, comps, qlum_zz, qchr_zz, b"\xff\xc2")
    # redefine the AC table slots with the EOBn-capable flat table
    for tid in range(2 if len(comps) > 1 else 1):
        out += b"\xff\xc4" + struct.pack(
            ">HB", 3 + 16 + len(flat[1]), (1 << 4) | tid
        ) + flat[0] + flat[1]

    def sos(scomps: list[tuple[int, int, int]], ss, se, ah, al) -> bytes:
        seg = b"\xff\xda" + struct.pack(">HB", 6 + 2 * len(scomps),
                                        len(scomps))
        for cid, td, ta in scomps:
            seg += struct.pack("BB", cid, (td << 4) | ta)
        return seg + struct.pack("BBB", ss, se, (ah << 4) | al)

    # ---- DC first scan: interleaved over all components, Al=al1 ----
    bw = _BitWriter()
    preds = {cid: 0 for cid, _, _ in comps}
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for cid, (ch, cv), tq in comps:
                blocks = planes[cid]
                for by in range(cv):
                    for bx in range(ch):
                        dc = int(blocks[my * cv + by, mx * ch + bx, 0]) >> al1
                        diff = dc - preds[cid]
                        preds[cid] = dc
                        size = abs(diff).bit_length()
                        code, ln = dc_enc[tq][size]
                        bw.put(code, ln)
                        if size:
                            bw.put(
                                diff if diff > 0 else diff + (1 << size) - 1,
                                size,
                            )
    bw.flush()
    out += sos([(cid, tq, 0) for cid, _, tq in comps], 0, 0, 0, al1) + bw.buf

    # ---- AC first scans: per component, band split, Al=al1 ----
    bands = [(1, ac_split), (ac_split + 1, 63)] if 1 <= ac_split < 63 \
        else [(1, 63)]
    for cid, (ch, cv), tq in comps:
        hb, wb = _comp_block_dims(h, w, ch, cv, hmax, vmax)
        for ss, se in bands:
            bw = _BitWriter()
            st = _EobState()
            for byi in range(hb):
                for bxi in range(wb):
                    _enc_ac_first_block(
                        bw, ac_enc[tq], planes[cid][byi, bxi], ss, se, al1, st
                    )
            _emit_eobrun(bw, ac_enc[tq], st)
            bw.flush()
            out += sos([(cid, 0, tq)], ss, se, 0, al1) + bw.buf

    if successive:
        # ---- DC refinement: interleaved, one raw bit per block ----
        bw = _BitWriter()
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for cid, (ch, cv), tq in comps:
                    blocks = planes[cid]
                    for by in range(cv):
                        for bx in range(ch):
                            bw.put(
                                int(blocks[my * cv + by, mx * ch + bx, 0]) & 1,
                                1,
                            )
        bw.flush()
        out += sos([(cid, 0, 0) for cid, _, _ in comps], 0, 0, 1, 0) + bw.buf
        # ---- AC refinement scans ----
        for cid, (ch, cv), tq in comps:
            hb, wb = _comp_block_dims(h, w, ch, cv, hmax, vmax)
            for ss, se in bands:
                bw = _BitWriter()
                st = _EobState()
                for byi in range(hb):
                    for bxi in range(wb):
                        _enc_ac_refine_block(
                            bw, ac_enc[tq], planes[cid][byi, bxi],
                            ss, se, 0, st,
                        )
                _emit_eobrun(bw, ac_enc[tq], st)
                bw.flush()
                out += sos([(cid, 0, tq)], ss, se, 1, 0) + bw.buf

    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def _next_marker(data: bytes, p: int) -> int:
    """Index of the 0xFF of the next REAL marker at/after p — skips
    entropy data, stuffed 0xFF00, fill 0xFF bytes, and RST markers.
    This is also how chroma-only progressive scans are skipped without
    entropy-decoding them (only Y is ever reconstructed)."""
    n = len(data)
    while p + 1 < n:
        if data[p] != 0xFF:
            p += 1
        elif data[p + 1] == 0x00:
            p += 2
        elif data[p + 1] == 0xFF:
            p += 1
        elif 0xD0 <= data[p + 1] <= 0xD7:
            p += 2
        else:
            return p
    return n


def _seq_block(br, blk, pred, dc_t, ac_t) -> int:
    """One baseline-sequential block: DC diff + full AC band.  blk is
    the Y coefficient row (written) or None (chroma: decode-and-drop)."""
    size = _decode_sym(br, dc_t)
    diff = _extend(br.receive(size), size) if size else 0
    pred += diff
    if blk is not None:
        blk[0] = pred
    k = 1
    while k < 64:
        rs = _decode_sym(br, ac_t)
        if rs == 0x00:  # EOB
            break
        if rs == 0xF0:  # ZRL
            k += 16
            continue
        k += rs >> 4
        size = rs & 0x0F
        v = _extend(br.receive(size), size)
        if k > 63:
            raise ValueError("AC index overran block")
        if blk is not None:
            blk[k] = v
        k += 1
    return pred


def _ac_first_block(br, blk, ss, se, al, ac_t, eob: list) -> None:
    """Progressive AC first scan, one block (T.81 G.1.2.2)."""
    if eob[0] > 0:
        eob[0] -= 1
        return
    k = ss
    while k <= se:
        rs = _decode_sym(br, ac_t)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r < 15:
                eob[0] = (1 << r) - 1
                if r:
                    eob[0] += br.receive(r)
                return
            k += 16  # ZRL
            continue
        k += r
        if k > se:
            raise ValueError("AC index overran band")
        v = _extend(br.receive(s), s)
        if blk is not None:
            blk[k] = v * (1 << al)
        k += 1


def _ac_refine_block(br, blk, ss, se, al, ac_t, eob: list) -> None:
    """Progressive AC refinement, one block (T.81 G.1.2.3): correction
    bits for history-nonzero coefficients, new +-1<<Al insertions."""
    p1, m1 = 1 << al, -1 << al

    def correct(k_):
        c = int(blk[k_])
        if br.bit() and (c & p1) == 0:
            blk[k_] = c + (p1 if c >= 0 else m1)

    k = ss
    if eob[0] == 0:
        while k <= se:
            rs = _decode_sym(br, ac_t)
            r, s = rs >> 4, rs & 0x0F
            val = 0
            if s == 0:
                if r < 15:
                    eob[0] = 1 << r
                    if r:
                        eob[0] += br.receive(r)
                    break
            else:  # s must be 1 in a refinement scan
                val = p1 if br.bit() else m1
            while k <= se:
                if int(blk[k]) != 0:
                    correct(k)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                blk[k] = val
            k += 1
    if eob[0] > 0:
        while k <= se:
            if int(blk[k]) != 0:
                correct(k)
            k += 1
        eob[0] -= 1


def decode_jpeg(data: bytes) -> np.ndarray:
    """JFIF bytes -> (H, W) float32 luma in [0,1].

    Accepts SOF0 (baseline), SOF1 (extended sequential — identical
    decode at 8-bit), and SOF2 (PROGRESSIVE: spectral selection and
    successive approximation, DC and AC refinement scans, multi-scan
    accumulation — round 5).  Only the Y channel is reconstructed;
    interleaved scans entropy-decode chroma to stay in sync, while
    chroma-only progressive scans are skipped outright via marker
    search.  Raises ValueError on arithmetic-coded / hierarchical /
    12-bit streams and malformed payloads (quarantined upstream)."""
    if len(data) < 4 or data[0] != 0xFF or data[1] != 0xD8:
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], object] = {}  # (class, id) -> decoder tbl
    comps: list[tuple[int, int, int, int]] = []  # id, h, v, tq
    hsize = wsize = 0
    hmax = vmax = 1
    restart = 0
    progressive = False
    ycid = None
    ycoef = None
    saw_scan = False

    def decode_scan(body: bytes, start: int) -> int:
        """Decode (or skip) one scan's entropy data; return the
        position of the next marker."""
        nonlocal saw_scan
        ns = body[0]
        bycid = {c[0]: c for c in comps}
        scomps = []
        for i in range(ns):
            cid, tds = struct.unpack_from("BB", body, 1 + 2 * i)
            if cid not in bycid:
                raise ValueError("SOS references unknown component")
            _, ch, cv, tq_id = bycid[cid]
            scomps.append(
                (cid, ch, cv, huff.get((0, tds >> 4)),
                 huff.get((1, tds & 0x0F)))
            )
        if progressive:
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            a = body[3 + 2 * ns]
            ah, al = a >> 4, a & 0x0F
            if ss == 0 and se != 0:
                raise ValueError(
                    "malformed progressive scan (DC scan needs Se=0)"
                )
            if ss > 0 and (ns != 1 or not ss <= se <= 63):
                raise ValueError(
                    "malformed progressive AC scan (must be one component)"
                )
        else:
            ss, se, ah, al = 0, 63, 0, 0
        if not any(c[0] == ycid for c in scomps):
            # no luma in this scan: nothing we reconstruct — skip the
            # entropy data wholesale
            saw_scan = True
            return _next_marker(data, start)
        for cid, ch, cv, dc_t, ac_t in scomps:
            if (ss == 0 and ah == 0 and dc_t is None) or (
                (ss > 0 or not progressive) and ac_t is None
            ):
                raise ValueError("SOS references missing DHT")
        br = _BitReader(data, start)
        eob = [0]
        preds = {c[0]: 0 for c in scomps}
        unit = 0  # restart counting: MCUs, or blocks when ns == 1

        def maybe_restart():
            nonlocal preds
            if restart and unit and unit % restart == 0:
                br.restart()
                preds = {c[0]: 0 for c in scomps}
                eob[0] = 0

        if ns == 1:
            cid, ch, cv, dc_t, ac_t = scomps[0]
            hb, wb = _comp_block_dims(hsize, wsize, ch, cv, hmax, vmax)
            is_y = cid == ycid
            for byi in range(hb):
                for bxi in range(wb):
                    maybe_restart()
                    blk = ycoef[byi, bxi] if is_y else None
                    if not progressive:
                        preds[cid] = _seq_block(br, blk, preds[cid],
                                                dc_t, ac_t)
                    elif ss == 0:
                        if ah == 0:
                            size = _decode_sym(br, dc_t)
                            diff = (_extend(br.receive(size), size)
                                    if size else 0)
                            preds[cid] += diff
                            if blk is not None:
                                blk[0] = preds[cid] * (1 << al)
                        else:
                            b = br.bit()
                            if b and blk is not None:
                                blk[0] = float(int(blk[0]) | (1 << al))
                    elif ah == 0:
                        _ac_first_block(br, blk, ss, se, al, ac_t, eob)
                    else:
                        _ac_refine_block(br, blk, ss, se, al, ac_t, eob)
                    unit += 1
        else:
            if progressive and ss > 0:
                raise ValueError("interleaved progressive AC scan")
            mcx = -(-wsize // (8 * hmax))
            mcy = -(-hsize // (8 * vmax))
            for my in range(mcy):
                for mx in range(mcx):
                    maybe_restart()
                    for cid, ch, cv, dc_t, ac_t in scomps:
                        is_y = cid == ycid
                        for by in range(cv):
                            for bx in range(ch):
                                blk = (
                                    ycoef[my * cv + by, mx * ch + bx]
                                    if is_y else None
                                )
                                if not progressive:
                                    preds[cid] = _seq_block(
                                        br, blk, preds[cid], dc_t, ac_t
                                    )
                                elif ah == 0:
                                    size = _decode_sym(br, dc_t)
                                    diff = (
                                        _extend(br.receive(size), size)
                                        if size else 0
                                    )
                                    preds[cid] += diff
                                    if blk is not None:
                                        blk[0] = preds[cid] * (1 << al)
                                else:
                                    b = br.bit()
                                    if b and blk is not None:
                                        blk[0] = float(
                                            int(blk[0]) | (1 << al)
                                        )
                    unit += 1
        saw_scan = True
        return _next_marker(data, br.p)

    while pos + 2 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("bad JPEG marker alignment")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if marker == 0xFF:  # fill byte
            pos += 1
            continue
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:  # TEM / stray RST
            pos += 2
            continue
        if pos + 4 > len(data):
            break
        ln = struct.unpack_from(">H", data, pos + 2)[0]
        body = data[pos + 4 : pos + 2 + ln]
        seg_start = pos + 2 + ln
        pos = seg_start
        if marker == 0xDB:  # DQT: one or more tables per segment
            o = 0
            while o < len(body):
                pq, tq_id = body[o] >> 4, body[o] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quant tables not supported")
                qt[tq_id] = np.frombuffer(
                    body, dtype=np.uint8, count=64, offset=o + 1
                ).astype(np.int64)
                o += 65
        elif marker == 0xC4:  # DHT: one or more tables per segment
            o = 0
            while o < len(body):
                tc, th = body[o] >> 4, body[o] & 0x0F
                bits = body[o + 1 : o + 17]
                nv = sum(bits)
                vals = body[o + 17 : o + 17 + nv]
                huff[(tc, th)] = _build_dec(bits, vals)
                o += 17 + nv
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1/2
            progressive = marker == 0xC2
            prec, hsize, wsize, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise ValueError(f"{prec}-bit JPEG not supported")
            comps = []
            for i in range(nc):
                cid, hv, tq_id = struct.unpack_from("BBB", body, 6 + 3 * i)
                comps.append((cid, hv >> 4, hv & 0x0F, tq_id))
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            # luma is the first frame component (JFIF ordering)
            ycid = comps[0][0]
            mcx = -(-wsize // (8 * hmax))
            mcy = -(-hsize // (8 * vmax))
            ycoef = np.zeros(
                (mcy * comps[0][2], mcx * comps[0][1], 64), dtype=np.float64
            )
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(
                "unsupported JPEG variant (lossless/arithmetic/"
                f"hierarchical, SOF{marker - 0xC0})"
            )
        elif marker == 0xDD:  # DRI
            restart = struct.unpack_from(">H", body, 0)[0]
        elif marker == 0xDA:  # SOS
            if not comps or ycoef is None:
                raise ValueError("SOS before SOF")
            for cid, _, _, tq_id in comps:
                if tq_id not in qt:
                    raise ValueError("SOS references missing DQT")
            pos = decode_scan(body, seg_start)
        # APPn / COM / anything else: skipped via ln

    if not saw_scan or ycoef is None:
        raise ValueError("JPEG has no scan data")

    ytq = next(c[3] for c in comps if c[0] == ycid)
    yq = qt[ytq].astype(np.float64)
    # dequantize (zigzag domain), de-zigzag, IDCT every Y block at once
    nby, nbx, _ = ycoef.shape
    raster = np.zeros((nby, nbx, 64), dtype=np.float64)
    raster[..., _ZZ] = ycoef * yq[None, None, :]
    blocks = raster.reshape(nby, nbx, 8, 8)
    pix = np.einsum("ji,abjk,kl->abil", _DCT, blocks, _DCT, optimize=True)
    plane = (
        pix.transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8) + 128.0
    )
    plane = np.clip(plane, 0.0, 255.0)[:hsize, :wsize]
    return (plane / np.float32(255.0)).astype(np.float32)
