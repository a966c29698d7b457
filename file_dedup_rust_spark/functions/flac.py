"""FLAC decoder (and fixture encoder) in pure Python + numpy.

Why this matters to the engine: FLAC is LOSSLESS, so a clip re-shipped
as FLAC decodes to bit-identical PCM — the `pcm_exact` codec-invariant
tier (operators/exact.py) catches a wav->flac container flip with NO
new machinery, in batch and at streaming ingest, exactly as it catches
wav->raw-PCM flips.  That makes the tier's "codec-invariant" claim
real across an actually-compressed real-world format.  (G.711/ADPCM
are lossy: those re-encodes land in the SimHash near-dup tier instead;
see functions/audio.py.)

Decoder scope (covers what real encoders emit for CD-style audio):
16-bit streams, mono or stereo with all four channel assignments
(independent, left/side, right/side, mid/side), CONSTANT / VERBATIM /
FIXED(0-4) / LPC subframes, wasted bits, both Rice coding methods
(4- and 5-bit parameters) with partitions and escape codes, fixed or
variable blocksize, CRC-8 and CRC-16 verified.  Rejected loudly
(quarantine contract): other bit depths, >2 channels.

The encoder exists so tests need no fixture files: mono 16-bit, FIXED
order-2 prediction, one Rice partition per subframe — a small but
fully conformant subset (the decoder is exercised on everything else
via hand-built streams in tests).

Reference ingest analog: the reference routes uploads by extension
into its embedding worker (/root/reference/backend/src/worker/
deduplication_service.rs:247-254); FLAC is the compressed-audio leg.
"""

from __future__ import annotations

import struct

import numpy as np

_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _crc_table(poly: int, width: int) -> list[int]:
    top, mask = 1 << (width - 1), (1 << width) - 1
    table = []
    for b in range(256):
        crc = b << (width - 8)
        for _ in range(8):
            crc = ((crc << 1) ^ poly) & mask if crc & top else (crc << 1) & mask
        table.append(crc)
    return table


_CRC8_TABLE = _crc_table(0x07, 8)
_CRC16_TABLE = _crc_table(0x8005, 16)


def _crc8(data: bytes) -> int:
    crc = 0
    t = _CRC8_TABLE
    for b in data:
        crc = t[crc ^ b]
    return crc


def _crc16(data: bytes) -> int:
    # table-driven: runs over every frame byte on the decode hot path
    crc = 0
    t = _CRC16_TABLE
    for b in data:
        crc = ((crc << 8) & 0xFFFF) ^ t[(crc >> 8) ^ b]
    return crc


class _Bits:
    """MSB-first bit reader over bytes."""

    __slots__ = ("d", "pos")

    def __init__(self, data: bytes, bytepos: int = 0) -> None:
        self.d = data
        self.pos = bytepos * 8

    def read(self, n: int) -> int:
        p, d = self.pos, self.d
        end = p + n
        if end > len(d) * 8:
            raise ValueError("FLAC bitstream truncated")
        v = 0
        # gather the covered bytes, then shift out the tail
        first, last = p >> 3, (end + 7) >> 3
        for i in range(first, last):
            v = (v << 8) | d[i]
        v >>= (last << 3) - end
        v &= (1 << n) - 1
        self.pos = end
        return v

    def sread(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >= (1 << (n - 1)) else v

    def unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    @property
    def bytepos(self) -> int:
        return self.pos >> 3


def _read_utf8_number(bits: _Bits) -> int:
    """The UTF-8-style frame/sample number coding (up to 36 bits)."""
    b0 = bits.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    mask = 0x80
    while b0 & mask:
        n += 1
        mask >>= 1
    if n < 2 or n > 7:
        raise ValueError("bad FLAC frame number coding")
    val = b0 & (mask - 1)
    for _ in range(n - 1):
        c = bits.read(8)
        if c & 0xC0 != 0x80:
            raise ValueError("bad FLAC frame number continuation")
        val = (val << 6) | (c & 0x3F)
    return val


_BLOCKSIZE_CODE = {
    1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
    13: 8192, 14: 16384, 15: 32768,
}

_SAMPLE_SIZE_CODE = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def _decode_residual(bits: _Bits, blocksize: int, order: int) -> list[int]:
    method = bits.read(2)
    if method > 1:
        raise ValueError("reserved FLAC residual coding method")
    plen = 4 if method == 0 else 5
    escape = (1 << plen) - 1
    porder = bits.read(4)
    nparts = 1 << porder
    res: list[int] = []
    for p in range(nparts):
        count = blocksize >> porder
        if p == 0:
            count -= order
        if count < 0:
            raise ValueError("malformed FLAC partition order")
        param = bits.read(plen)
        if param == escape:
            raw = bits.read(5)
            for _ in range(count):
                res.append(bits.sread(raw) if raw else 0)
        else:
            for _ in range(count):
                q = bits.unary()
                u = (q << param) | bits.read(param)
                res.append((u >> 1) ^ -(u & 1))  # zigzag
    return res


def _decode_subframe(bits: _Bits, blocksize: int, depth: int) -> np.ndarray:
    if bits.read(1) != 0:
        raise ValueError("bad FLAC subframe sync bit")
    ftype = bits.read(6)
    wasted = 0
    if bits.read(1):  # wasted-bits flag: unary count - 1 follows
        wasted = bits.unary() + 1
    eff = depth - wasted

    if ftype == 0:  # CONSTANT
        out = np.full(blocksize, bits.sread(eff), dtype=np.int64)
    elif ftype == 1:  # VERBATIM
        out = np.array([bits.sread(eff) for _ in range(blocksize)],
                       dtype=np.int64)
    elif 8 <= ftype <= 12:  # FIXED order 0-4
        order = ftype - 8
        warm = [bits.sread(eff) for _ in range(order)]
        res = _decode_residual(bits, blocksize, order)
        coefs = _FIXED_COEFS[order]
        vals = list(warm)
        for r in res:
            pred = sum(c * vals[-i - 1] for i, c in enumerate(coefs))
            vals.append(pred + r)
        out = np.array(vals, dtype=np.int64)
    elif ftype >= 32:  # LPC, order = (ftype & 31) + 1
        order = (ftype & 31) + 1
        warm = [bits.sread(eff) for _ in range(order)]
        prec = bits.read(4)
        if prec == 15:
            raise ValueError("invalid FLAC LPC precision")
        prec += 1
        shift = bits.sread(5)
        if shift < 0:
            raise ValueError("negative FLAC LPC shift")
        coefs = [bits.sread(prec) for _ in range(order)]
        res = _decode_residual(bits, blocksize, order)
        vals = list(warm)
        for r in res:
            acc = 0
            for i, c in enumerate(coefs):
                acc += c * vals[-i - 1]
            vals.append((acc >> shift) + r)
        out = np.array(vals, dtype=np.int64)
    else:
        raise ValueError(f"reserved FLAC subframe type {ftype}")
    return out << wasted


def decode_flac(data: bytes) -> np.ndarray:
    """FLAC bytes -> float32 mono in [-1, 1).

    16-bit mono/stereo; stereo is decorrelated per the frame's channel
    assignment then averaged to mono (the decode_wav convention).
    Frame CRC-16 and header CRC-8 are verified — corruption raises
    (and quarantines) instead of emitting garbage samples."""
    if len(data) < 42 or data[:4] != b"fLaC":
        raise ValueError("not a FLAC payload")
    pos = 4
    channels = bits_per = None
    total = -1
    while pos + 4 <= len(data):  # metadata blocks
        hdr = data[pos]
        (blen,) = struct.unpack(">I", b"\x00" + data[pos + 1 : pos + 4])
        body = data[pos + 4 : pos + 4 + blen]
        if hdr & 0x7F == 0:  # STREAMINFO
            channels = ((body[12] >> 1) & 0x07) + 1
            bits_per = (((body[12] & 1) << 4) | (body[13] >> 4)) + 1
            total = ((body[13] & 0x0F) << 32) | struct.unpack(
                ">I", body[14:18]
            )[0]
            if total == 0:  # spec: 0 = unknown (piped/streamed encodes)
                total = -1
        pos += 4 + blen
        if hdr & 0x80:  # last metadata block
            break
    if channels is None:
        raise ValueError("FLAC missing STREAMINFO")
    if bits_per != 16 or channels > 2:
        raise ValueError(
            f"unsupported FLAC: {bits_per}-bit, {channels} channels"
        )

    chunks: list[np.ndarray] = []
    got = 0
    while pos < len(data) and (total < 0 or got < total):
        frame_start = pos
        bits = _Bits(data, pos)
        sync = bits.read(14)
        if sync != 0x3FFE:
            raise ValueError("bad FLAC frame sync")
        bits.read(1)  # reserved
        bits.read(1)  # blocking strategy
        bs_code = bits.read(4)
        sr_code = bits.read(4)
        ch_code = bits.read(4)
        ss_code = bits.read(3)
        bits.read(1)  # reserved
        _read_utf8_number(bits)
        if bs_code == 0:
            raise ValueError("reserved FLAC blocksize code")
        elif bs_code == 6:
            blocksize = bits.read(8) + 1
        elif bs_code == 7:
            blocksize = bits.read(16) + 1
        else:
            blocksize = _BLOCKSIZE_CODE[bs_code]
        if sr_code == 12:
            bits.read(8)
        elif sr_code in (13, 14):
            bits.read(16)
        if ss_code == 0:
            depth = bits_per
        else:
            depth = _SAMPLE_SIZE_CODE.get(ss_code)
            if depth is None:
                raise ValueError("reserved FLAC sample size code")
        if depth != 16:
            raise ValueError("FLAC frame depth != 16 unsupported")
        crc8_end = bits.bytepos
        if _crc8(data[frame_start:crc8_end]) != bits.read(8):
            raise ValueError("FLAC frame header CRC-8 mismatch")

        if ch_code < 8:
            nch = ch_code + 1
            if nch > 2:
                raise ValueError("FLAC >2 channels unsupported")
            subs = [
                _decode_subframe(bits, blocksize, depth) for _ in range(nch)
            ]
            mono = subs[0] if nch == 1 else (subs[0] + subs[1]) / 2.0
        elif ch_code == 8:  # left/side
            left = _decode_subframe(bits, blocksize, depth)
            side = _decode_subframe(bits, blocksize, depth + 1)
            right = left - side
            mono = (left + right) / 2.0
        elif ch_code == 9:  # right/side
            side = _decode_subframe(bits, blocksize, depth + 1)
            right = _decode_subframe(bits, blocksize, depth)
            left = right + side
            mono = (left + right) / 2.0
        elif ch_code == 10:  # mid/side
            mid = _decode_subframe(bits, blocksize, depth)
            side = _decode_subframe(bits, blocksize, depth + 1)
            m2 = (mid << 1) | (side & 1)
            left = (m2 + side) >> 1
            right = (m2 - side) >> 1
            mono = (left + right) / 2.0
        else:
            raise ValueError("reserved FLAC channel assignment")
        bits.align()
        if _crc16(data[frame_start : bits.bytepos]) != bits.read(16):
            raise ValueError("FLAC frame CRC-16 mismatch")
        pos = bits.bytepos
        chunks.append(np.asarray(mono, dtype=np.float64))
        got += blocksize

    if not chunks:
        raise ValueError("FLAC has no audio frames")
    out = np.concatenate(chunks)
    if total >= 0:
        out = out[:total]
    return (out / 32768.0).astype(np.float32)


# ---------------------------------------------------------------------------
# fixture encoder: mono 16-bit, FIXED order-2, one Rice partition
# ---------------------------------------------------------------------------


class _BitW:
    __slots__ = ("buf", "acc", "n")

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, val: int, nbits: int) -> None:
        if nbits == 0:
            return
        self.acc = (self.acc << nbits) | (val & ((1 << nbits) - 1))
        self.n += nbits
        while self.n >= 8:
            self.buf.append((self.acc >> (self.n - 8)) & 0xFF)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def align(self) -> None:
        if self.n:
            self.write(0, 8 - self.n)


def _utf8_number(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    out = []
    nbytes = 2
    while n >= (1 << (nbytes * 5 + 1)) and nbytes < 7:
        nbytes += 1
    lead = (0xFF << (8 - nbytes)) & 0xFF
    shift = 6 * (nbytes - 1)
    out.append(lead | (n >> shift))
    for i in range(nbytes - 1):
        shift -= 6
        out.append(0x80 | ((n >> shift) & 0x3F))
    return bytes(out)


def encode_flac(pcm: np.ndarray, sr_hz: int, blocksize: int = 4096) -> bytes:
    """float [-1,1] mono -> FLAC bytes (16-bit, FIXED order-2, single
    Rice partition, 4-bit params with escape fallback)."""
    x = np.clip(np.round(pcm * 32767.0), -32768, 32767).astype(np.int64)
    n = len(x)
    out = bytearray(b"fLaC")
    # STREAMINFO (last metadata block)
    si = bytearray()
    si += struct.pack(">HH", blocksize, blocksize)
    si += b"\x00\x00\x00" * 2  # min/max framesize unknown
    si += bytes([
        (sr_hz >> 12) & 0xFF, (sr_hz >> 4) & 0xFF,
        ((sr_hz & 0x0F) << 4) | (0 << 1) | ((16 - 1) >> 4),
        (((16 - 1) & 0x0F) << 4) | ((n >> 32) & 0x0F),
    ])
    si += struct.pack(">I", n & 0xFFFFFFFF)
    si += b"\x00" * 16  # md5 unset
    out += bytes([0x80]) + struct.pack(">I", len(si))[1:] + si

    for fi, s in enumerate(range(0, n, blocksize)):
        chunk = x[s : s + blocksize]
        bs = len(chunk)
        hdr = _BitW()
        hdr.write(0x3FFE, 14)
        hdr.write(0, 1)  # reserved
        hdr.write(0, 1)  # fixed blocksize strategy
        # blocksize: use 4096 code when exact, else 16-bit form
        if bs == 4096:
            hdr.write(12, 4)
        else:
            hdr.write(7, 4)
        hdr.write(0, 4)   # sample rate: from STREAMINFO
        hdr.write(0, 4)   # mono
        hdr.write(4, 3)   # 16-bit
        hdr.write(0, 1)   # reserved
        hdr.align()
        head = bytes(hdr.buf) + _utf8_number(fi)
        if bs != 4096:
            head += struct.pack(">H", bs - 1)
        head += bytes([_crc8(head)])

        body = _BitW()
        order = 2 if bs > 2 else 0
        body.write(0, 1)
        body.write(8 + order, 6)  # FIXED
        body.write(0, 1)          # no wasted bits
        for w in chunk[:order]:
            body.write(int(w) & 0xFFFF, 16)
        if order:
            res = chunk[2:] - 2 * chunk[1:-1] + chunk[:-2]
        else:
            res = chunk
        # zigzag + single-partition Rice; param from mean magnitude
        u = (np.abs(res) * 2 - (res < 0)).astype(np.int64) if len(res) \
            else np.zeros(0, dtype=np.int64)
        mean = float(u.mean()) if len(u) else 0.0
        param = 0
        while (1 << (param + 1)) < mean + 1 and param < 14:
            param += 1
        body.write(0, 2)   # 4-bit Rice params
        body.write(0, 4)   # partition order 0
        # escape to raw if unary parts would explode
        if mean > (1 << 14):
            # escape: raw 18-bit residuals (order-2 residual range)
            body.write(15, 4)
            body.write(18, 5)
            for r in res:
                body.write(int(r) & 0x3FFFF, 18)
        else:
            body.write(param, 4)
            for r in res:
                uu = (abs(int(r)) << 1) - (1 if r < 0 else 0)  # zigzag
                for _ in range(uu >> param):
                    body.write(0, 1)
                body.write(1, 1)
                body.write(uu & ((1 << param) - 1), param)
        body.align()
        frame = head + bytes(body.buf)
        frame += struct.pack(">H", _crc16(frame))
        out += frame
    return bytes(out)
