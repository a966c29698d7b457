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
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * len(comps), 8, h, w,
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
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * len(comps), len(comps))
    for cid, _, tq in comps:
        out += struct.pack("BB", cid, (tq << 4) | tq)  # Td=Ta=tq here
    out += b"\x00\x3f\x00"  # Ss=0 Se=63 Ah/Al=0
    out += bw.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JFIF bytes -> (H, W) float32 luma in [0,1].

    Accepts SOF0 (baseline) and SOF1 (extended sequential, identical
    decode path at 8-bit); raises ValueError on progressive/arithmetic/
    12-bit streams and on malformed payloads, which quarantines the
    row upstream (image_signatures decode_ok=false)."""
    if len(data) < 4 or data[0] != 0xFF or data[1] != 0xD8:
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], object] = {}  # (class, id) -> decoder tbl
    comps: list[tuple[int, int, int, int]] = []  # id, h, v, tq
    hsize = wsize = 0
    restart = 0
    br = None
    scan: list[tuple[int, int, int, object, object]] = []

    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("bad JPEG marker alignment")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI (no scan seen)
            break
        ln = struct.unpack_from(">H", data, pos + 2)[0]
        body = data[pos + 4 : pos + 2 + ln]
        pos += 2 + ln
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
        elif marker in (0xC0, 0xC1):  # SOF0/1
            prec, hsize, wsize, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise ValueError(f"{prec}-bit JPEG not supported")
            comps = []
            for i in range(nc):
                cid, hv, tq_id = struct.unpack_from("BBB", body, 6 + 3 * i)
                comps.append((cid, hv >> 4, hv & 0x0F, tq_id))
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(
                "only baseline sequential JPEG supported (got SOF"
                f"{marker - 0xC0})"
            )
        elif marker == 0xDD:  # DRI
            restart = struct.unpack_from(">H", body, 0)[0]
        elif marker == 0xDA:  # SOS: map tables, then entropy data follows
            if not comps:
                raise ValueError("SOS before SOF")
            ns = body[0]
            bycid = {c[0]: c for c in comps}
            scan = []
            for i in range(ns):
                cid, tds = struct.unpack_from("BB", body, 1 + 2 * i)
                _, ch, cv, tq_id = bycid[cid]
                dc_t = huff.get((0, tds >> 4))
                ac_t = huff.get((1, tds & 0x0F))
                if dc_t is None or ac_t is None or tq_id not in qt:
                    raise ValueError("SOS references missing DHT/DQT")
                scan.append((cid, ch, cv, dc_t, ac_t))
            br = _BitReader(data, pos)
            break
        # APPn / COM / anything else: skipped via ln

    if br is None or not scan:
        raise ValueError("JPEG has no scan data")

    hmax = max(c[1] for c in scan)
    vmax = max(c[2] for c in scan)
    mcus_x = -(-wsize // (8 * hmax))
    mcus_y = -(-hsize // (8 * vmax))
    ycid, yh, yv = scan[0][0], scan[0][1], scan[0][2]
    ytq = next(c[3] for c in comps if c[0] == ycid)
    yq = qt[ytq].astype(np.float64)
    # Y coefficient store, zigzag order; dequant + IDCT vectorized after
    ycoef = np.zeros((mcus_y * yv, mcus_x * yh, 64), dtype=np.float64)

    preds = {cid: 0 for cid, *_ in scan}
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart and mcu_count and mcu_count % restart == 0:
                br.restart()
                preds = {cid: 0 for cid, *_ in scan}
            for cid, ch, cv, dc_t, ac_t in scan:
                is_y = cid == ycid
                for by in range(cv):
                    for bx in range(ch):
                        size = _decode_sym(br, dc_t)
                        diff = _extend(br.receive(size), size) if size else 0
                        preds[cid] += diff
                        if is_y:
                            blk = ycoef[my * cv + by, mx * ch + bx]
                            blk[0] = preds[cid]
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
                            if is_y:
                                blk[k] = v
                            k += 1
            mcu_count += 1

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
