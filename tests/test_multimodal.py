"""Multimodal plumbing: typed media schema, Arrow batch shapes, stubbed
decode with quarantine, deterministic fake decoder, frame sampling
fan-out, and exact-dup semantics surviving the stub."""

from __future__ import annotations

import numpy as np
import pytest

from file_dedup_rust_spark.functions import multimodal as M


def test_fake_decode_deterministic_and_shaped():
    a = M.fake_decode_image(b"payload", 32, 24)
    b = M.fake_decode_image(b"payload", 32, 24)
    c = M.fake_decode_image(b"other", 32, 24)
    assert a.shape == (24, 32) and a.dtype == np.float32
    assert np.array_equal(a, b)
    assert not np.array_equal(a, c)


def test_decode_image_stub_raises_without_pil():
    # the long tail (WebP/TIFF) stays PIL-gated; PNG decodes natively
    # since round 5 and baseline JPEG since round 5 too
    if M.try_import_pil() is not None:
        pytest.skip("PIL installed; stub path not applicable")
    with pytest.raises(NotImplementedError):
        M.decode_image(b"RIFF\x00\x00\x00\x00WEBPVP8 ", "image/webp")


def test_resize_luma_block_means():
    img = np.arange(16, dtype=np.float64).reshape(4, 4)
    out = M.resize_luma(img, 2, 2)
    assert out.shape == (2, 2)
    assert np.allclose(out, [[2.5, 4.5], [10.5, 12.5]])


def test_image_signatures_schema_and_dups(spark):
    media = M.fake_media_table(spark, 25, n_dup=5)
    sigs = M.image_signatures(media).cache()
    assert sigs.schema.simpleString() == (
        "struct<media_id:string,sha256:string,decode_ok:boolean,"
        "feat:array<float>,simhash:bigint>"
    )
    rows = sigs.collect()
    assert len(rows) == 30 and all(r.decode_ok for r in rows)
    assert all(len(r.feat) == M.IMAGE_FEATURE_DIM for r in rows)
    # byte-identical payloads -> identical sha256, features, simhash
    by_sha = {}
    for r in rows:
        by_sha.setdefault(r.sha256, []).append(r)
    dup_groups = [g for g in by_sha.values() if len(g) > 1]
    assert len(dup_groups) >= 5
    for g in dup_groups:
        assert len({r.simhash for r in g}) == 1
        assert len({tuple(r.feat) for r in g}) == 1


def test_image_signatures_quarantines_bad_rows(spark):
    media = M.fake_media_table(spark, 4, n_dup=0)
    bad = spark.createDataFrame(
        [("bad1", None, "image", "image/fake", 0, 0, 1, 0.0)],
        schema=M.MEDIA_SCHEMA,
    )
    sigs = M.image_signatures(media.unionByName(bad)).collect()
    bad_rows = [r for r in sigs if r.media_id == "bad1"]
    assert len(bad_rows) == 1 and not bad_rows[0].decode_ok
    assert sum(1 for r in sigs if r.decode_ok) == 4


def test_sample_video_frames_fanout(spark):
    media = M.fake_media_table(spark, 9, n_dup=0)
    frames = M.sample_video_frames(media, every_n=10).collect()
    videos = [r for r in M.fake_media_table(spark, 9, n_dup=0).collect()
              if r.media_type == "video"]
    # 30 frames, every 10th -> 3 rows per video; images have n_frames=1 -> 1 row
    per_media = {}
    for r in frames:
        per_media.setdefault(r.media_id, []).append(r)
    for v in videos:
        assert len(per_media[v.media_id]) == 3
        assert [r.frame_idx for r in sorted(per_media[v.media_id],
                                            key=lambda r: r.frame_idx)] == [0, 10, 20]
        assert all(len(r.frame_feat) == M.FRAME_FEATURE_DIM
                   for r in per_media[v.media_id])
    # frames of the same video differ (frame idx mixed into payload)
    v0 = per_media[videos[0].media_id]
    assert len({tuple(r.frame_feat) for r in v0}) == 3


# ---------------------------------------------------------------------------
# REAL codec path (pure-numpy BMP / binary PNM — runs in the default
# sandbox, no codec library; VERDICT r2 item 3)
# ---------------------------------------------------------------------------


def test_bmp_roundtrip_exact_quantized():
    rng = np.random.default_rng(3)
    img = rng.random((23, 31)).astype(np.float32)  # odd width -> row padding
    data = M.encode_bmp(img)
    assert data[:2] == b"BM"
    out = M.decode_bmp(data)
    assert out.shape == img.shape and out.dtype == np.float32
    # gray BMP stores R=G=B: decode luma == the 8-bit quantized input
    assert np.allclose(out, np.round(img * 255) / 255, atol=1.5e-3)
    # sniffing dispatcher takes the same branch
    assert np.array_equal(M.decode_image(data, "image/bmp"), out)


def test_bmp_topdown_and_malformed():
    import struct

    img = np.linspace(0, 1, 12, dtype=np.float32).reshape(3, 4)
    data = bytearray(M.encode_bmp(img))
    up = M.decode_bmp(bytes(data))
    # flip to top-down: negative height + reversed row order
    h = struct.unpack_from("<i", data, 22)[0]
    struct.pack_into("<i", data, 22, -h)
    stride = ((4 * 3 + 3) // 4) * 4
    body = bytes(data[54:])
    rows = [body[i * stride:(i + 1) * stride] for i in range(h)]
    td = bytes(data[:54]) + b"".join(reversed(rows))
    assert np.array_equal(M.decode_bmp(td), up)
    with pytest.raises(ValueError):
        M.decode_bmp(bytes(data[:40]))  # truncated
    rle = bytearray(M.encode_bmp(img))
    struct.pack_into("<I", rle, 30, 1)  # compression=RLE8
    with pytest.raises(ValueError):
        M.decode_bmp(bytes(rle))


def test_pnm_roundtrip_and_header_grammar():
    rng = np.random.default_rng(4)
    img = rng.random((10, 17)).astype(np.float32)
    for color in (False, True):
        data = M.encode_pnm(img, color=color)
        out = M.decode_pnm(data)
        assert out.shape == img.shape
        assert np.allclose(out, np.round(img * 255) / 255, atol=1.5e-3)
    # comments + arbitrary whitespace in the header are legal PNM
    body = M.encode_pnm(img)
    _, rest = body.split(b"\n", 1)
    weird = b"P5 # a comment\n# another\n  17\t10 # dims\n255\n" + rest.split(b"\n", 2)[2]
    out = M.decode_pnm(weird)
    assert out.shape == img.shape
    with pytest.raises(ValueError):
        M.decode_pnm(b"P6\n4 4\n65535\n" + b"\x00" * 96)  # 16-bit maxval


def test_image_signatures_over_real_codec_payloads(spark):
    """The default test run exercises the REAL decode branch end-to-end:
    encoded BMP/PNM payloads through image_signatures(use_fake_decode=
    False) — exact byte copies collapse to one sha256+simhash, noisy
    re-encodes land within a small Hamming distance, unrelated images
    far away (the audio SimHash separation argument, image modality)."""
    media = M.real_media_table(spark, 24)
    sigs = M.image_signatures(media, use_fake_decode=False).collect()
    assert all(r.decode_ok for r in sigs)
    by_id = {r.media_id: r for r in sigs}

    def ham(a, b):
        return bin((a ^ b) & (2**64 - 1)).count("1")

    # exact copies: identical hash + signature
    for j, i in enumerate(range(0, 24, 5)):
        assert by_id[f"x{j:06d}"].sha256 == by_id[f"r{i:06d}"].sha256
        assert by_id[f"x{j:06d}"].simhash == by_id[f"r{i:06d}"].simhash
    # near-dups: different bytes, close signatures
    near = []
    for j, i in enumerate(range(0, 24, 7)):
        assert by_id[f"n{j:06d}"].sha256 != by_id[f"r{i:06d}"].sha256
        near.append(ham(by_id[f"n{j:06d}"].simhash, by_id[f"r{i:06d}"].simhash))
    assert max(near) <= 10, near
    # unrelated pairs: far apart
    far = [
        ham(by_id[f"r{i:06d}"].simhash, by_id[f"r{i+1:06d}"].simhash)
        for i in range(0, 23)
    ]
    assert min(far) >= 15, far


def test_real_codec_decode_when_available(spark):
    """PNG decodes NATIVELY since round 5 (stdlib zlib + numpy) — the
    compressed real-decode branch runs in every environment; only
    lossy formats (JPEG) stay PIL-gated.  A malformed PNG payload
    must quarantine through image_signatures, not crash."""
    arr = (np.outer(np.arange(24), np.arange(32)) % 256).astype("uint8")
    payload = M.encode_png(arr.astype(np.float32) / 255.0)
    luma = M.decode_image(payload, "image/png")
    assert luma.shape == (24, 32)
    assert np.allclose(luma, arr.astype("float32") / 255.0, atol=1e-6)
    media = spark.createDataFrame(
        [
            ("r0", payload, "image", "image/png", 32, 24, 1, 0.0),
            # garbage after a valid PNG magic -> quarantined row
            ("p0", b"\x89PNG\r\n\x1a\nnot-really", "image", "image/png",
             8, 8, 1, 0.0),
        ],
        schema=M.MEDIA_SCHEMA,
    )
    rows = {r.media_id: r for r in
            M.image_signatures(media, use_fake_decode=False).collect()}
    assert rows["r0"].decode_ok
    assert len(rows["r0"].feat) == M.IMAGE_FEATURE_DIM
    assert not rows["p0"].decode_ok

    if M.try_import_pil() is None:
        # non-native formats must quarantine, not crash, without PIL
        with pytest.raises(NotImplementedError):
            M.decode_image(b"RIFF\x00\x00\x00\x00WEBPVP8 ", "image/webp")
    # truncated JPEG magic quarantines through the native decoder
    with pytest.raises(ValueError):
        M.decode_image(b"\xff\xd8\xff\xe0\x00\x10JFIF", "image/jpeg")


def test_codec_roundtrip_property():
    """Property-based: any float32 luma in [0,1] of any (odd/even)
    shape round-trips through both codecs to its 8-bit quantization."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=25, deadline=None)
    @given(
        h=st.integers(min_value=1, max_value=40),
        w=st.integers(min_value=1, max_value=40),
        seed=st.integers(min_value=0, max_value=2**31 - 1),
    )
    def check(h, w, seed):
        rng = np.random.default_rng(seed)
        img = rng.random((h, w)).astype(np.float32)
        want = np.round(img * 255) / 255
        for data in (M.encode_bmp(img), M.encode_pnm(img),
                     M.encode_pnm(img, color=True), M.encode_png(img),
                     M.encode_png(img, color=True)):
            out = M.decode_image(data, "image/any")
            assert out.shape == (h, w)
            assert np.allclose(out, want, atol=1.6e-3)

    check()


def _png_forward_filter(u8: np.ndarray, filters: list[int], bpp: int) -> bytes:
    """Independent forward implementation of the PNG scanline filters
    (RFC 2083 §6) to exercise every unfilter branch with data the
    encoder (filter 0 only) never emits."""
    h, stride = u8.shape
    out = bytearray()
    rec = u8.astype(np.int32)
    for y in range(h):
        f = filters[y % len(filters)]
        out.append(f)
        prior = rec[y - 1] if y else np.zeros(stride, np.int32)
        for x in range(stride):
            a = int(rec[y, x - bpp]) if x >= bpp else 0
            b = int(prior[x])
            c = int(prior[x - bpp]) if (x >= bpp and y) else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            out.append((int(rec[y, x]) - pred) % 256)
    return bytes(out)


def _png_chunks(ihdr_body: bytes, extra: list[tuple[bytes, bytes]],
                idat_raw: bytes) -> bytes:
    import struct
    import zlib

    def chunk(tag, body):
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))

    out = M._PNG_SIG + chunk(b"IHDR", ihdr_body)
    for tag, body in extra:
        out += chunk(tag, body)
    return out + chunk(b"IDAT", zlib.compress(idat_raw)) + chunk(b"IEND", b"")


def test_png_all_filters_decode_exactly():
    """Hand-filtered scanlines (Sub/Up/Average/Paeth/None cycling) must
    reconstruct the exact pixels — pins every unfilter branch against
    an independent forward-filter implementation."""
    import struct

    rng = np.random.default_rng(3)
    for nch, ctype in ((1, 0), (3, 2), (4, 6), (2, 4)):
        h, w = 11, 7
        u8 = rng.integers(0, 256, (h, w * nch)).astype(np.uint8)
        raw = _png_forward_filter(u8, [1, 2, 3, 4, 0], nch)
        data = _png_chunks(
            struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0), [], raw
        )
        got = M.decode_png(data)
        px = u8.reshape(h, w, nch).astype(np.float32)
        if ctype in (0, 4):
            want = px[..., 0] / 255.0
        else:
            want = (
                0.299 * px[..., 0] + 0.587 * px[..., 1] + 0.114 * px[..., 2]
            ) / 255.0
        assert got.shape == (h, w)
        assert np.allclose(got, want, atol=1e-5), ctype


def test_png_palette_and_malformed():
    import struct

    # 2x3 paletted image: indices 0..2 -> red/green/blue
    pal = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])
    idx = np.array([[0, 1, 2], [2, 1, 0]], dtype=np.uint8)
    raw = b"".join(b"\x00" + r.tobytes() for r in idx)
    data = _png_chunks(
        struct.pack(">IIBBBBB", 3, 2, 8, 3, 0, 0, 0),
        [(b"PLTE", pal)], raw,
    )
    got = M.decode_png(data)
    assert got.shape == (2, 3)
    assert got[0, 0] == pytest.approx(0.299, abs=1e-3)   # red
    assert got[0, 1] == pytest.approx(0.587, abs=1e-3)   # green
    assert got[1, 0] == pytest.approx(0.114, abs=1e-3)   # blue

    with pytest.raises(ValueError):
        M.decode_png(b"\x89PNG\r\n\x1a\x08 not a png")
    # 16-bit depth rejected loudly, not mis-decoded
    bad = _png_chunks(
        struct.pack(">IIBBBBB", 3, 2, 16, 0, 0, 0, 0), [], b"\x00" * 14
    )
    with pytest.raises(ValueError):
        M.decode_png(bad)


# ---------------------------------------------------------------------------
# baseline JPEG codec (functions/jpeg.py) — native lossy decode
# ---------------------------------------------------------------------------


def _blocky(h, w, seed):
    rng = np.random.default_rng(seed)
    base = rng.random((max(1, h // 8) + 1, max(1, w // 8) + 1))
    return np.kron(base, np.ones((8, 8)))[:h, :w].astype(np.float32)


def test_jpeg_roundtrip_all_modes():
    """Gray / color 4:4:4 / color 4:2:0 / restart markers / quality
    sweep all round-trip within lossy tolerance on low-frequency
    images (the fixture regime) AND on full-band noise."""
    from file_dedup_rust_spark.functions import jpeg as J

    img = _blocky(37, 51, 0)
    for kw in (
        dict(),
        dict(color=True),
        dict(color=True, subsample=True),
        dict(restart_interval=3),
        dict(color=True, subsample=True, restart_interval=2),
        dict(quality=75),
        dict(quality=100),
    ):
        out = J.decode_jpeg(J.encode_jpeg(img, **kw))
        assert out.shape == img.shape and out.dtype == np.float32
        err = np.abs(out - img)
        assert float(err.mean()) < 5e-3 and float(err.max()) < 2e-2, kw

    noise = np.random.default_rng(1).random((24, 33)).astype(np.float32)
    for kw in (dict(quality=95), dict(color=True, subsample=True)):
        out = J.decode_jpeg(J.encode_jpeg(noise, **kw))
        err = np.abs(out - noise)
        assert float(err.mean()) < 0.02 and float(err.max()) < 0.15, kw


def test_jpeg_roundtrip_property():
    """Property-based: any shape (incl. 1x1 and non-8-multiples), any
    seed, both sampling modes — decode succeeds, shape is exact, and
    error stays within lossy bounds."""
    from hypothesis import given, settings, strategies as st

    from file_dedup_rust_spark.functions import jpeg as J

    @settings(max_examples=20, deadline=None)
    @given(
        h=st.integers(min_value=1, max_value=40),
        w=st.integers(min_value=1, max_value=40),
        seed=st.integers(min_value=0, max_value=2**31 - 1),
        sub=st.booleans(),
    )
    def check(h, w, seed, sub):
        rng = np.random.default_rng(seed)
        img = rng.random((h, w)).astype(np.float32)
        out = J.decode_jpeg(J.encode_jpeg(img, color=sub, subsample=sub))
        assert out.shape == (h, w)
        assert float(np.abs(out - img).mean()) < 0.04

    check()


def test_jpeg_rejects_unsupported_and_malformed():
    from file_dedup_rust_spark.functions import jpeg as J

    img = _blocky(16, 16, 2)
    data = J.encode_jpeg(img)
    # patch SOF0 -> SOF2: the full-band interleaved scan is ILLEGAL in
    # progressive mode — must reject loudly, not mis-decode
    prog = data.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(ValueError, match="progressive"):
        J.decode_jpeg(prog)
    # arithmetic-coded SOF9: unsupported variant
    with pytest.raises(ValueError, match="variant"):
        J.decode_jpeg(data.replace(b"\xff\xc0", b"\xff\xc9", 1))
    with pytest.raises(ValueError):
        J.decode_jpeg(b"\x00\x01not a jpeg")
    with pytest.raises(ValueError):
        J.decode_jpeg(data[: len(data) // 2])  # truncated entropy data


def test_jpeg_progressive_matches_baseline_exactly():
    """The progressive decoder (SOF2: spectral selection + successive
    approximation, DC/AC refinement, EOB runs, chroma-scan skipping)
    must reconstruct BIT-IDENTICAL luma to the baseline decoder for
    the same quantized coefficients — progressive is a transmission
    reordering, not a different image."""
    from file_dedup_rust_spark.functions import jpeg as J

    img = _blocky(37, 51, 3)
    noise = np.random.default_rng(4).random((24, 33)).astype(np.float32)
    for src in (img, noise):
        for kw in (
            dict(),
            dict(successive=False),       # spectral selection only
            dict(color=True),
            dict(color=True, subsample=True),
            dict(color=True, subsample=True, successive=False),
        ):
            prog = J.decode_jpeg(J.encode_jpeg_progressive(src, **kw))
            base = J.decode_jpeg(J.encode_jpeg(
                src, color=kw.get("color", False),
                subsample=kw.get("subsample", False),
            ))
            assert np.array_equal(prog, base), kw
    # shape preservation incl. degenerate dims
    rng = np.random.default_rng(5)
    for h, w in ((1, 1), (8, 8), (9, 17), (40, 3)):
        im = rng.random((h, w)).astype(np.float32)
        o = J.decode_jpeg(J.encode_jpeg_progressive(
            im, color=True, subsample=True
        ))
        assert o.shape == (h, w)


def test_jpeg_through_image_signatures(spark):
    """JPEG payloads run the REAL decode branch of image_signatures:
    exact byte copies collapse to one sha256+simhash; a JPEG and a PNG
    of the SAME image land within a small SimHash Hamming distance
    (cross-codec near-dup, the property lossy re-encodes must keep)."""
    from file_dedup_rust_spark.functions.jpeg import encode_jpeg

    img = _blocky(32, 48, 5)
    jay = encode_jpeg(img, color=True, subsample=True)
    png = M.encode_png(img)
    media = spark.createDataFrame(
        [
            ("j0", jay, "image", "image/jpeg", 48, 32, 1, 0.0),
            ("j1", jay, "image", "image/jpeg", 48, 32, 1, 0.0),
            ("p0", png, "image", "image/png", 48, 32, 1, 0.0),
        ],
        schema=M.MEDIA_SCHEMA,
    )
    rows = {r.media_id: r for r in
            M.image_signatures(media, use_fake_decode=False).collect()}
    assert all(r.decode_ok for r in rows.values())
    assert rows["j0"].sha256 == rows["j1"].sha256
    assert rows["j0"].simhash == rows["j1"].simhash
    ham = bin((rows["j0"].simhash ^ rows["p0"].simhash) & (2**64 - 1)).count("1")
    assert ham <= 6, ham


# ---------------------------------------------------------------------------
# real video containers (functions/video.py): Y4M + MJPEG/AVI
# ---------------------------------------------------------------------------


def _moving(n, h, w, seed):
    rng = np.random.default_rng(seed)
    base = np.kron(rng.random((h // 8, w // 8 + 2)),
                   np.ones((8, 8))).astype(np.float32)
    return np.stack([base[:, f : f + w] for f in range(n)], axis=0)


def test_video_containers_roundtrip_random_access():
    from file_dedup_rust_spark.functions import video as V

    frames = _moving(6, 32, 48, 0)
    for enc in (lambda f: V.encode_y4m(f),
                lambda f: V.encode_y4m(f, mono=True),
                lambda f: V.encode_mjpeg_avi(f)):
        r = V.open_video(enc(frames))
        assert r.frame_count == 6
        # random access: frame 4 without touching 0..3
        assert float(np.abs(r.get(4) - frames[4]).mean()) < 5e-3
        for i in range(6):
            assert r.get(i).shape == (32, 48)
            assert float(np.abs(r.get(i) - frames[i]).mean()) < 5e-3

    with pytest.raises(NotImplementedError):
        V.open_video(b"\x00\x01\x02unknown-codec")
    with pytest.raises(ValueError):
        V.open_video(b"YUV4MPEG2 W10 H10\nFRAME\nshort")
    with pytest.raises(ValueError):
        V.open_video(b"RIFF\x04\x00\x00\x00AVI ")  # no frame chunks


def test_sample_video_frames_real_decode(spark):
    """The real-decode branch of the frame-sampling operator: Y4M and
    MJPEG-AVI payloads fan out to per-frame rows with REAL features;
    exact byte-copy videos produce identical feature sequences; frames
    within a video differ (moving content); garbage quarantines."""
    media = M.real_video_table(spark, 6, n_frames=12)
    bad = spark.createDataFrame(
        [("bad0", b"\x00not-a-video", "video", "video/unknown",
          8, 8, 3, 25.0)],
        schema=M.MEDIA_SCHEMA,
    )
    rows = M.sample_video_frames(
        media.unionByName(bad), every_n=5, use_fake_decode=False
    ).collect()
    per = {}
    for r in rows:
        per.setdefault(r.media_id, []).append(r)
    # 12 frames sampled every 5 -> indices 0, 5, 10
    for vid in [f"v{i:06d}" for i in range(6)]:
        got = sorted(per[vid], key=lambda r: r.frame_idx)
        assert [r.frame_idx for r in got] == [0, 5, 10]
        assert all(r.decode_ok and len(r.frame_feat) == M.FRAME_FEATURE_DIM
                   for r in got)
        # moving content: sampled frames have distinct features
        assert len({tuple(r.frame_feat) for r in got}) == 3
    # exact byte-copy video: identical feature sequence to its source
    src = sorted(per["v000002"], key=lambda r: r.frame_idx)
    cpy = sorted(per["c000002"], key=lambda r: r.frame_idx)
    assert [r.frame_feat for r in src] == [r.frame_feat for r in cpy]
    # quarantined marker row for the unknown payload
    assert len(per["bad0"]) == 1
    assert per["bad0"][0].frame_idx == -1 and not per["bad0"][0].decode_ok
