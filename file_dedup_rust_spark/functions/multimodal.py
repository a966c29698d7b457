"""Multimodal columns: image / video payloads as opaque binary columns
with typed metadata, processed by Arrow-batched mapInPandas UDFs.

The reference routes uploads by file extension into an image-vs-text
embedding model (/root/reference/backend/src/worker/
deduplication_service.rs:247-254, deduplicator.rs:78-84: base64 of the
raw bytes into Bedrock Titan image).  This module is the batch-engine
analog generalized to image and video payloads; audio is fully real in
functions/audio.py.

Sandbox constraint: no image/video codec LIBRARIES are installed, but
four image formats decode for real anyway — uncompressed BMP and
binary PNM (pure numpy), PNG (stdlib zlib inflate + numpy scanline
unfilter, round 5), and JPEG — baseline AND progressive (pure-numpy
Huffman + IDCT, spectral selection + successive approximation,
`functions/jpeg.py`, round 5) — so uncompressed, lossless-compressed,
and lossy-compressed real decode branches all run in every test pass.
Remaining formats (WebP/TIFF/...) and video codecs stay
capability-gated: `decode_image` raises NotImplementedError for them
unless PIL is importable, and tests/fakes use `fake_decode_image`, a
deterministic pure-numpy pixel synthesizer seeded from the payload
bytes.  Everything AROUND the decode — the typed schema, Arrow batch
shape, resize/pooling math, frame sampling, feature vectors, SimHash
— is real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from file_dedup_rust_spark.functions.hashing import rng_u64, splitmix64

# typed metadata schema for opaque media payloads
MEDIA_SCHEMA = (
    "media_id string, bytes binary, media_type string, mime string, "
    "width int, height int, n_frames int, fps double"
)

IMAGE_FEATURE_DIM = 64  # 8x8 luma grid
FRAME_FEATURE_DIM = 16  # 4x4 luma grid per sampled frame


def try_import_pil():
    try:
        from PIL import Image  # noqa: F401

        return Image
    except ImportError:
        return None


# ---------------------------------------------------------------------------
# real codecs, pure numpy: uncompressed BMP (8/24 bpp) and binary PNM
# (P5 gray / P6 RGB).  These run in the default environment with no
# codec library, so the REAL decode branch (the reference's image
# ingest, deduplicator.rs:78-84) is exercised by every test run; PIL
# remains the capability-gated path for compressed formats (PNG/JPEG).
# ---------------------------------------------------------------------------

_LUMA = np.array([0.299, 0.587, 0.114])  # ITU-R BT.601


def encode_bmp(luma: np.ndarray) -> bytes:
    """(H, W) float32 luma in [0,1] -> 24-bpp uncompressed BMP bytes
    (BITMAPINFOHEADER, bottom-up rows, 4-byte row padding).  Gray is
    stored as R=G=B so any conformant decoder round-trips the luma."""
    import struct

    h, w = luma.shape
    u8 = np.clip(np.round(luma * 255.0), 0, 255).astype(np.uint8)
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    body = np.zeros((h, row_bytes + pad), dtype=np.uint8)
    # bottom-up scan order; BGR per pixel (equal channels here)
    body[:, :row_bytes] = np.repeat(u8[::-1], 3, axis=1)
    data_off = 14 + 40
    file_size = data_off + body.size
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, data_off)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, body.size, 2835, 2835, 0, 0
    )
    return header + info + body.tobytes()


def decode_bmp(data: bytes) -> np.ndarray:
    """Uncompressed 8/24/32-bpp BMP -> (H, W) float32 luma in [0,1].
    Handles bottom-up (positive height) and top-down (negative) rows
    and the 4-byte row padding; rejects compressed/paletted variants."""
    import struct

    if len(data) < 54 or data[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", data, 10)[0]
    hdr_size = struct.unpack_from("<I", data, 14)[0]
    if hdr_size < 40:
        raise ValueError("BITMAPCOREHEADER not supported")
    w, h_raw = struct.unpack_from("<ii", data, 18)
    bpp = struct.unpack_from("<H", data, 28)[0]
    compression = struct.unpack_from("<I", data, 30)[0]
    if compression != 0 or bpp not in (8, 24, 32):
        raise ValueError(f"unsupported BMP: bpp={bpp} compression={compression}")
    h = abs(h_raw)
    nch = bpp // 8
    row_bytes = w * nch
    stride = row_bytes + ((-row_bytes) % 4)
    need = data_off + stride * h
    if w <= 0 or h == 0 or len(data) < need:
        raise ValueError("truncated BMP")
    rows = np.frombuffer(
        data, dtype=np.uint8, count=stride * h, offset=data_off
    ).reshape(h, stride)[:, :row_bytes]
    if h_raw > 0:
        rows = rows[::-1]  # bottom-up -> top-down
    if nch == 1:
        # 8-bpp without reading the palette: treat index as gray (the
        # common grayscale-ramp palette); paletted color is out of scope
        luma = rows.astype(np.float32)
    else:
        px = rows.reshape(h, w, nch).astype(np.float32)
        b, g, r = px[..., 0], px[..., 1], px[..., 2]
        luma = (
            np.float32(_LUMA[0]) * r
            + np.float32(_LUMA[1]) * g
            + np.float32(_LUMA[2]) * b
        )
    return (luma / np.float32(255.0)).astype(np.float32)


def encode_pnm(img: np.ndarray, color: bool = False) -> bytes:
    """float32 [0,1] -> binary PNM: P5 from (H, W) gray, P6 from
    (H, W, 3) RGB (color=True replicates gray into RGB)."""
    if color and img.ndim == 2:
        img = np.repeat(img[..., None], 3, axis=2)
    u8 = np.clip(np.round(img * 255.0), 0, 255).astype(np.uint8)
    if u8.ndim == 3:
        h, w, _ = u8.shape
        magic = b"P6"
    else:
        h, w = u8.shape
        magic = b"P5"
    return magic + f"\n{w} {h}\n255\n".encode() + u8.tobytes()


def decode_pnm(data: bytes) -> np.ndarray:
    """Binary PNM (P5 gray / P6 RGB, maxval <= 255) -> (H, W) float32
    luma in [0,1].  Header tokens may be separated by any whitespace
    and '#' comments (the format's full grammar)."""
    if len(data) < 2 or data[:2] not in (b"P5", b"P6"):
        raise ValueError("not a binary PNM payload")
    # tokenize the header: magic, width, height, maxval
    pos, toks = 2, []
    while len(toks) < 3:
        if pos >= len(data):
            raise ValueError("truncated PNM header")
        c = data[pos]
        if c in b" \t\r\n":
            pos += 1
        elif c == ord("#"):
            nl = data.find(b"\n", pos)
            pos = len(data) if nl < 0 else nl + 1
        else:
            end = pos
            while end < len(data) and data[end] not in b" \t\r\n":
                end += 1
            toks.append(int(data[pos:end]))
            pos = end
    w, h, maxval = toks
    if not (0 < maxval <= 255) or w <= 0 or h <= 0:
        raise ValueError("unsupported PNM geometry/maxval")
    pos += 1  # exactly one whitespace byte after maxval per spec
    nch = 3 if data[:2] == b"P6" else 1
    need = w * h * nch
    px = np.frombuffer(data, dtype=np.uint8, count=need, offset=pos)
    if px.size < need:
        raise ValueError("truncated PNM body")
    if nch == 1:
        luma = px.reshape(h, w).astype(np.float32)
    else:
        rgb = px.reshape(h, w, 3).astype(np.float32)
        luma = (
            np.float32(_LUMA[0]) * rgb[..., 0]
            + np.float32(_LUMA[1]) * rgb[..., 1]
            + np.float32(_LUMA[2]) * rgb[..., 2]
        )
    return (luma / np.float32(maxval)).astype(np.float32)


# ---------------------------------------------------------------------------
# real COMPRESSED codec, stdlib zlib + numpy: PNG (RFC 2083 / ISO
# 15948).  8-bit depth, color types 0 (gray), 2 (RGB), 3 (palette),
# 4 (gray+alpha), 6 (RGBA), non-interlaced; all five scanline filters.
# Closes the round-4 "compressed image decode needs PIL" gap for the
# dominant lossless web format; JPEG (lossy DCT) stays PIL-gated.
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CH = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}  # color type -> samples/px


def encode_png(img: np.ndarray, color: bool = False) -> bytes:
    """float32 [0,1] -> PNG bytes (8-bit, filter 0 rows, one IDAT).
    (H, W) gray -> color type 0; color=True / (H, W, 3) -> type 2."""
    import struct
    import zlib

    if color and img.ndim == 2:
        img = np.repeat(img[..., None], 3, axis=2)
    u8 = np.clip(np.round(img * 255.0), 0, 255).astype(np.uint8)
    if u8.ndim == 3:
        h, w, _ = u8.shape
        ctype = 2
    else:
        h, w = u8.shape
        ctype = 0

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    raw = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8), u8.reshape(h, -1)], axis=1
    ).tobytes()
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def _png_unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Filtered scanlines (h rows of 1 filter byte + stride bytes) ->
    reconstructed (h, stride) uint8.  Sub/None/Up vectorize; Average
    and Paeth walk x (numpy per-pixel column ops, h-parallel per row)."""
    rows = raw.reshape(h, 1 + stride)
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        f = int(rows[y, 0])
        cur = rows[y, 1:].astype(np.int32)
        prior = out[y - 1].astype(np.int32) if y else np.zeros(stride, np.int32)
        if f == 0:
            rec = cur
        elif f == 1:  # Sub: per-channel prefix sum mod 256
            c = cur.reshape(-1, bpp).cumsum(axis=0) % 256
            rec = c.reshape(-1)
        elif f == 2:  # Up
            rec = (cur + prior) % 256
        elif f in (3, 4):  # Average / Paeth: sequential in x
            rec = np.zeros(stride, np.int32)
            for x in range(stride):
                a = rec[x - bpp] if x >= bpp else 0
                b = prior[x]
                if f == 3:
                    rec[x] = (cur[x] + ((a + b) >> 1)) % 256
                else:
                    c = prior[x - bpp] if x >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (
                        b if pb <= pc else c
                    )
                    rec[x] = (cur[x] + pred) % 256
        else:
            raise ValueError(f"unknown PNG filter {f}")
        out[y] = rec.astype(np.uint8)
    return out


def decode_png(data: bytes) -> np.ndarray:
    """PNG -> (H, W) float32 luma in [0,1].  8-bit depth, color types
    0/2/3/4/6, non-interlaced; alpha is ignored for luma (dedup
    features key on content, not transparency)."""
    import struct
    import zlib

    if not data.startswith(_PNG_SIG):
        raise ValueError("not a PNG payload")
    pos = len(_PNG_SIG)
    ihdr = None
    palette = None
    idat = bytearray()
    while pos + 8 <= len(data):
        ln, tag = struct.unpack_from(">I4s", data, pos)
        body = data[pos + 8 : pos + 8 + ln]
        pos += 12 + ln  # len + tag + body + crc
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"PLTE":
            palette = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, ctype, comp, filt, interlace = ihdr
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
        raise ValueError(
            f"unsupported PNG: depth={depth} interlace={interlace}"
        )
    if ctype not in _PNG_CH:
        raise ValueError(f"unsupported PNG color type {ctype}")
    nch = _PNG_CH[ctype]
    stride = w * nch
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    if raw.size != h * (stride + 1):
        raise ValueError("PNG scanline size mismatch")
    px = _png_unfilter(raw, h, stride, nch).reshape(h, w, nch)
    if ctype == 3:
        if palette is None:
            raise ValueError("paletted PNG without PLTE")
        rgb = palette[px[..., 0]].astype(np.float32)
    elif ctype in (0, 4):
        luma = px[..., 0].astype(np.float32)
        return (luma / np.float32(255.0)).astype(np.float32)
    else:  # 2, 6: first three samples are RGB
        rgb = px[..., :3].astype(np.float32)
    luma = (
        np.float32(_LUMA[0]) * rgb[..., 0]
        + np.float32(_LUMA[1]) * rgb[..., 1]
        + np.float32(_LUMA[2]) * rgb[..., 2]
    )
    return (luma / np.float32(255.0)).astype(np.float32)


def decode_image(data: bytes, mime: str) -> np.ndarray:
    """Decode an encoded image payload -> (H, W) float32 luma in [0,1].

    Uncompressed BMP, binary PNM, PNG (stdlib zlib inflate + numpy
    unfilter), and JPEG, baseline and progressive (pure-numpy Huffman
    + IDCT, `functions/jpeg.py`) — REAL compressed decode, no codec
    library —
    are magic-byte sniffed and decode natively in the default sandbox;
    remaining formats (WebP/TIFF/...) need PIL and raise
    NotImplementedError without it, quarantining the row."""
    if len(data) >= 2 and data[:2] == b"BM":
        return decode_bmp(data)
    if len(data) >= 2 and data[:2] in (b"P5", b"P6"):
        return decode_pnm(data)
    if data.startswith(_PNG_SIG):
        return decode_png(data)
    if len(data) >= 3 and data[:3] == b"\xff\xd8\xff":
        from file_dedup_rust_spark.functions.jpeg import decode_jpeg

        return decode_jpeg(data)
    pil = try_import_pil()
    if pil is None:
        raise NotImplementedError(
            "image decode beyond BMP/PNM/PNG/JPEG (WebP/TIFF/...) "
            "requires PIL/pillow (not in this sandbox); "
            "fake_decode_image is the deterministic test fallback"
        )
    import io

    img = pil.open(io.BytesIO(data)).convert("L")
    return np.asarray(img, dtype=np.float32) / 255.0


def fake_decode_image(data: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic fake decoder: (height, width) float32 luma derived
    purely from sha256(bytes) — byte-identical payloads give identical
    pixels, so exact-dup semantics survive the stub."""
    if not data or width <= 0 or height <= 0:
        raise ValueError("empty payload or degenerate dimensions")
    seed = int.from_bytes(hashlib.sha256(data).digest()[:8], "little")
    n = int(width) * int(height)
    # splitmix64 directly, NOT rng_u64: per-payload seeds are unique, so
    # going through the (seed, n) cache would only evict the hot
    # signature-UDF streams while pinning w*h*8 bytes per distinct image
    raw = splitmix64(
        np.arange(1, n + 1, dtype=np.uint64)
        + np.uint64(seed & 0xFFFFFFFFFFFFFFFF)
    )
    u = raw.astype(np.float64) / 2**64
    return u.reshape(int(height), int(width)).astype(np.float32)


def resize_luma(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Area-style resize by block averaging (pure numpy, no codec lib).
    Handles non-divisible shapes by index-mapped nearest rows/cols of a
    block-mean pyramid — deterministic and vectorized."""
    h, w = img.shape
    ys = (np.arange(out_h) * h // out_h).astype(int)
    xs = (np.arange(out_w) * w // out_w).astype(int)
    ye = np.append(ys[1:], h)
    xe = np.append(xs[1:], w)
    # integral image makes each output cell an O(1) box mean
    ii = np.zeros((h + 1, w + 1), dtype=np.float64)
    ii[1:, 1:] = np.cumsum(np.cumsum(img, axis=0), axis=1)
    out = (
        ii[ye][:, xe] - ii[ys][:, xe] - ii[ye][:, xs] + ii[ys][:, xs]
    )
    area = (ye - ys)[:, None] * (xe - xs)[None, :]
    return (out / np.maximum(area, 1)).astype(np.float32)


def image_feature_vector(luma: np.ndarray) -> np.ndarray:
    """(H, W) luma -> contrast-normalized 8x8 grid, flattened (64,)."""
    g = resize_luma(luma, 8, 8).astype(np.float64).reshape(-1)
    g = g - g.mean()
    n = np.linalg.norm(g)
    if n > 1e-12:
        g = g / n
    return g.astype(np.float32)


def image_simhash64(feat: np.ndarray, seed: int = 0x51D_0003) -> int:
    """64-bit sign-of-projection SimHash over an image feature vector."""
    raw = rng_u64(seed, 64 * feat.size * 4)
    u = (raw.astype(np.float64) / 2**64) - 0.5
    planes = u.reshape(64, feat.size, 4).sum(axis=2)
    bits = (planes @ feat.astype(np.float64)) >= 0.0
    val = 0
    for b in bits:
        val = (val << 1) | int(b)
    return val - (1 << 64) if val >= (1 << 63) else val


IMAGE_SIG_SCHEMA = (
    "media_id string, sha256 string, decode_ok boolean, "
    "feat array<float>, simhash long"
)


def image_signatures(media: DataFrame, use_fake_decode: bool = True) -> DataFrame:
    """media(MEDIA_SCHEMA) -> per-image signatures.

    One mapInPandas pass (bytes never cross a shuffle — same hygiene
    rule as the audio path, SURVEY.md §7.3 item 4).  Rows whose decode
    fails are quarantined with decode_ok=false, not dropped."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in
                   ["media_id", "sha256", "decode_ok", "feat", "simhash"]}
            for row in pdf.itertuples(index=False):
                data = bytes(row.bytes) if row.bytes is not None else b""
                out["media_id"].append(row.media_id)
                out["sha256"].append(hashlib.sha256(data).hexdigest())
                try:
                    if use_fake_decode:
                        luma = fake_decode_image(data, row.width, row.height)
                    else:
                        luma = decode_image(data, row.mime)
                    feat = image_feature_vector(luma)
                    out["feat"].append(feat.tolist())
                    out["simhash"].append(image_simhash64(feat))
                    out["decode_ok"].append(True)
                except Exception:
                    out["feat"].append([])
                    out["simhash"].append(None)
                    out["decode_ok"].append(False)
            yield pd.DataFrame(out)

    cols = ["media_id", "bytes", "media_type", "mime", "width", "height"]
    return media.select(*cols).mapInPandas(run, schema=IMAGE_SIG_SCHEMA)


FRAME_SCHEMA = (
    "media_id string, frame_idx int, frame_feat array<float>, decode_ok boolean"
)


def _frame_feature(luma: np.ndarray) -> list[float]:
    g = resize_luma(luma, 4, 4).astype(np.float64).reshape(-1)
    g = g - g.mean()
    n = np.linalg.norm(g)
    if n > 1e-12:
        g = g / n
    return g.astype(np.float32).tolist()


def sample_video_frames(
    media: DataFrame, every_n: int = 10, use_fake_decode: bool = True
) -> DataFrame:
    """Video frame sampling: one output row per sampled frame with a
    per-frame feature vector — the UDTF-shaped (1 row -> N rows)
    multimodal operator.

    With ``use_fake_decode=False`` the frames decode FOR REAL via
    `functions/video.open_video` (Y4M and MJPEG/AVI, pure numpy +
    stdlib — round 5); both readers are random-access, so sampling
    every Nth frame decodes only 1/N of the frames.  Unknown codecs
    and malformed payloads quarantine with decode_ok=false.  The fake
    path remains the deterministic fixture for plumbing tests."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from file_dedup_rust_spark.functions.video import open_video

        for pdf in batches:
            out = {k: [] for k in
                   ["media_id", "frame_idx", "frame_feat", "decode_ok"]}
            for row in pdf.itertuples(index=False):
                data = bytes(row.bytes) if row.bytes is not None else b""
                if use_fake_decode:
                    n_frames = int(row.n_frames or 0)
                    for fi in range(0, max(n_frames, 0), every_n):
                        out["media_id"].append(row.media_id)
                        out["frame_idx"].append(fi)
                        # deterministic per-frame payload: frame index
                        # mixed into the content hash
                        fdata = data + fi.to_bytes(4, "little")
                        luma = fake_decode_image(fdata, row.width, row.height)
                        out["frame_feat"].append(_frame_feature(luma))
                        out["decode_ok"].append(True)
                    continue
                try:
                    reader = open_video(data)
                    for fi in range(0, reader.frame_count, every_n):
                        out["media_id"].append(row.media_id)
                        out["frame_idx"].append(fi)
                        out["frame_feat"].append(_frame_feature(reader.get(fi)))
                        out["decode_ok"].append(True)
                except Exception:
                    # quarantine marker row: frame_idx -1, no features
                    out["media_id"].append(row.media_id)
                    out["frame_idx"].append(-1)
                    out["frame_feat"].append([])
                    out["decode_ok"].append(False)
            yield pd.DataFrame(out)

    cols = ["media_id", "bytes", "width", "height", "n_frames"]
    return media.select(*cols).mapInPandas(run, schema=FRAME_SCHEMA)


def real_media_table(
    spark, n: int, seed: int = 11, noise: float = 0.02,
    dup_every: int = 5, near_every: int = 7,
):
    """Media table whose payloads are REAL encoded images (rotating
    24-bpp BMP / binary P6 PNM / compressed PNG / lossy baseline JPEG
    at 4:2:0) with planted structure: every `dup_every`-th image gets
    an exact byte copy, every `near_every`-th a noisy re-encode
    (near-dup).  Images are low-frequency (blocky upsampled noise) so
    feature/SimHash separation is meaningful, as with the audio
    fixtures."""
    from file_dedup_rust_spark.functions.jpeg import encode_jpeg

    rng = np.random.default_rng(seed)
    rows = []

    def enc(img, i):
        if i % 4 == 0:
            return encode_bmp(img), "image/bmp"
        if i % 4 == 1:
            return encode_pnm(img, color=True), "image/x-portable-pixmap"
        if i % 4 == 2:
            return encode_png(img), "image/png"
        return encode_jpeg(img, color=True, subsample=True), "image/jpeg"

    imgs = []
    for i in range(n):
        h, w = 24 + (i % 3) * 8, 32 + (i % 4) * 16
        base = rng.random((h // 8, w // 8))
        img = np.kron(base, np.ones((8, 8))).astype(np.float32)
        imgs.append(img)
        payload, mime = enc(img, i)
        rows.append((f"r{i:06d}", payload, "image", mime, w, h, 1, 0.0))
    for j, i in enumerate(range(0, n, dup_every)):
        src = rows[i]
        rows.append((f"x{j:06d}", *src[1:]))  # exact byte copy
    for j, i in enumerate(range(0, n, near_every)):
        img = np.clip(
            imgs[i] + noise * rng.standard_normal(imgs[i].shape), 0, 1
        ).astype(np.float32)
        payload, mime = enc(img, i)
        rows.append(
            (f"n{j:06d}", payload, "image", mime,
             imgs[i].shape[1], imgs[i].shape[0], 1, 0.0)
        )
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


def real_video_table(spark, n: int, seed: int = 13, n_frames: int = 12):
    """Media table whose payloads are REAL encoded videos (rotating
    Y4M C420 / Y4M mono / MJPEG-AVI) of blocky moving content: frame
    f of video i shifts a low-frequency base image by f pixels, so
    per-frame features are distinct within a video while every
    `3rd` video is an exact byte copy of its predecessor's content
    re-encoded in the SAME format (exact-dup pairs)."""
    from file_dedup_rust_spark.functions.video import (
        encode_mjpeg_avi,
        encode_y4m,
    )

    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        h, w = 32, 48
        base = np.kron(rng.random((h // 8, w // 8 + 2)),
                       np.ones((8, 8))).astype(np.float32)
        frames = np.stack(
            [base[:, f : f + w] for f in range(n_frames)], axis=0
        )
        kind = i % 3
        if kind == 0:
            payload = encode_y4m(frames)
        elif kind == 1:
            payload = encode_y4m(frames, mono=True)
        else:
            payload = encode_mjpeg_avi(frames)
        rows.append((f"v{i:06d}", payload, "video",
                     ["video/x-yuv4mpeg", "video/x-yuv4mpeg",
                      "video/x-msvideo"][kind],
                     w, h, n_frames, 25.0))
        if i % 3 == 2:  # exact byte copy of this video
            rows.append((f"c{i:06d}", payload, "video", rows[-1][3],
                         w, h, n_frames, 25.0))
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


def fake_media_table(spark, n: int, seed: int = 7, n_dup: int | None = None):
    """Deterministic media table for tests: n unique payloads plus
    n_dup byte-identical copies (exact-dup planted structure)."""
    n_dup = n // 5 if n_dup is None else n_dup
    rows = []
    for i in range(n):
        payload = splitmix64(
            np.arange(64, dtype=np.uint64) + np.uint64(seed * 1000003 + i)
        ).tobytes()
        kind = "video" if i % 3 == 0 else "image"
        rows.append((
            f"m{i:06d}", payload, kind,
            "video/fake" if kind == "video" else "image/fake",
            32 + (i % 4) * 16, 24 + (i % 3) * 8,
            30 if kind == "video" else 1,
            12.5 if kind == "video" else 0.0,
        ))
    for j in range(n_dup):
        src = rows[j * (n // max(n_dup, 1)) % n]
        rows.append((f"d{j:06d}", *src[1:]))
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
