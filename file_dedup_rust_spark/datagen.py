"""Deterministic synthetic clips table with planted duplicate
structure (FIXTURES.md section 1).

Every row's content is a pure function of (seed, row index): the plan
assigns roles/sources driver-side (cheap numpy, no audio), and content
is synthesized per-row from a per-row PCG64 stream.  A derived row
regenerates its base's signal from the base's seed, so distributed
generation needs NO shuffle and the driver-side pandas path produces
byte-identical rows (used by the numpy oracle and the tests).

Planted structure (proportions from FIXTURES.md):
  * exact        ~8%  — byte-identical bytes + transcript, new clip_id
  * audio_near   ~8%  — same signal + noise at SNR in [35, 45] dB
                         and/or re-encoded in the other codec
  * distractor   ~4%  — same signal at SNR in [5, 10] dB (must NOT match)
  * transcript_near ~8% — 1-3 token edits on 50+ token transcripts
  * containment  ~4%  — transcript B = prefix + A + suffix
  * hot          ~1%  — one shared transcript (skew fixture)
  * base/singleton — the rest
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from file_dedup_rust_spark.config import DedupConfig
from file_dedup_rust_spark.functions.audio import encode_wav

ROLES = [
    "base", "exact", "audio_near", "distractor",
    "transcript_near", "containment", "hot",
]

CLIP_SCHEMA = (
    "clip_id string, bytes binary, sr_hz int, dur_ms int, "
    "codec string, transcript string"
)

_SRS = np.array([8000, 16000], dtype=np.int64)
_CODECS = ["pcm_s16le", "wav"]
HOT_SENTINEL = -2  # plan.source value marking the shared hot transcript


def _row_rng(seed: int, idx: int, stream: int = 0) -> np.random.Generator:
    return np.random.Generator(
        np.random.PCG64([seed & 0x7FFFFFFF, int(idx), stream])
    )


def make_vocab(seed: int, size: int = 800) -> list[str]:
    rng = _row_rng(seed, 0xF00D)
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    vocab = []
    for _ in range(size):
        L = int(rng.integers(3, 10))
        vocab.append("".join(rng.choice(letters, size=L)))
    return vocab


def build_plan(n: int, seed: int = 42) -> pd.DataFrame:
    """Role/source assignment for n rows (driver-side, no audio).

    Columns: idx, clip_id, role, source (base idx or -1; -2 = hot),
    snr_db, codec_flip (near-dup re-encode), n_prefix, n_suffix,
    n_edits.
    """
    rng = np.random.Generator(np.random.PCG64([seed & 0x7FFFFFFF, 0xBEEF]))
    n_exact = int(0.08 * n)
    n_audio = int(0.08 * n)
    n_dist = int(0.04 * n)
    n_tnear = int(0.08 * n)
    n_cont = int(0.04 * n)
    n_hot = max(int(0.01 * n), 3) if n >= 100 else 0
    n_derived = n_exact + n_audio + n_dist + n_tnear + n_cont + n_hot
    n_base = n - n_derived
    if n_base < 10:
        raise ValueError(f"n={n} too small for planted structure")

    roles = np.array(
        ["base"] * n_base
        + ["exact"] * n_exact
        + ["audio_near"] * n_audio
        + ["distractor"] * n_dist
        + ["transcript_near"] * n_tnear
        + ["containment"] * n_cont
        + ["hot"] * n_hot
    )
    source = np.full(n, -1, dtype=np.int64)
    # long-transcript bases (>= 50 tokens) for transcript_near sources
    n_long = max(n_base // 2, 1)
    d0 = n_base
    source[d0 : d0 + n_exact] = rng.integers(0, n_base, n_exact)
    d0 += n_exact
    source[d0 : d0 + n_audio] = rng.integers(0, n_base, n_audio)
    d0 += n_audio
    source[d0 : d0 + n_dist] = rng.integers(0, n_base, n_dist)
    d0 += n_dist
    source[d0 : d0 + n_tnear] = rng.integers(0, n_long, n_tnear)  # long bases only
    d0 += n_tnear
    source[d0 : d0 + n_cont] = rng.integers(0, n_base, n_cont)
    d0 += n_cont
    source[d0 : d0 + n_hot] = HOT_SENTINEL

    snr = np.full(n, np.nan)
    idx_an = np.where(roles == "audio_near")[0]
    snr[idx_an] = rng.uniform(35.0, 45.0, idx_an.size)
    idx_di = np.where(roles == "distractor")[0]
    snr[idx_di] = rng.uniform(5.0, 10.0, idx_di.size)

    plan = pd.DataFrame(
        {
            "idx": np.arange(n, dtype=np.int64),
            "role": roles,
            "source": source,
            "snr_db": snr,
            "codec_flip": rng.integers(0, 2, n).astype(bool),
            "n_prefix": rng.integers(5, 16, n),
            "n_suffix": rng.integers(5, 16, n),
            "n_edits": rng.integers(1, 4, n),
        }
    )
    plan["clip_id"] = [f"clip_{i:012d}" for i in plan["idx"]]
    plan["n_long_bases"] = n_long
    return plan


# ---------------------------------------------------------------- content


def _base_audio_params(seed: int, base_idx: int) -> tuple[int, int]:
    rng = _row_rng(seed, base_idx, stream=1)
    sr = int(_SRS[int(rng.integers(0, len(_SRS)))])
    dur_ms = int(rng.integers(200, 1200))
    return sr, dur_ms


def _shaped_texture(rng: np.random.Generator, n: int, n_knots: int = 24,
                    lo_db: float = -25.0) -> np.ndarray:
    """Unit-RMS noise with a random rough spectral envelope (rfft-domain
    shaping, log-uniform knots in [lo_db, 0] dB)."""
    white = rng.standard_normal(n)
    spec = np.fft.rfft(white)
    knots = 10 ** rng.uniform(lo_db / 20.0, 0.0, n_knots)
    env = np.interp(np.linspace(0, 1, spec.size), np.linspace(0, 1, n_knots), knots)
    texture = np.fft.irfft(spec * env, n=n)
    rms = np.sqrt(np.mean(texture**2))
    return texture / rms if rms > 0 else texture


def _base_pcm(seed: int, base_idx: int) -> tuple[np.ndarray, int, int]:
    """Deterministic base signal with a unique broadband fingerprint.

    Pure sinusoids are too degenerate — two 3-tone clips often share
    spectral band energies and collide in SimHash space.  Real audio
    (speech/music) has rich broadband structure, which we emulate
    with per-base shaped noise (white noise through a random rough
    spectral envelope) plus 4 AM-modulated tonal components.  Every
    base then owns a distinctive spectral-contrast shape; 35 dB
    additive noise barely perturbs it.
    """
    sr, dur_ms = _base_audio_params(seed, base_idx)
    rng = _row_rng(seed, base_idx, stream=2)
    n = int(sr * dur_ms / 1000)
    t = np.arange(n) / sr
    x = np.zeros(n)
    for _ in range(4):
        f = rng.uniform(80.0, 0.38 * sr)
        ph = rng.uniform(0, 2 * np.pi)
        amp = rng.uniform(0.05, 0.15)
        am = 1.0 + 0.4 * np.sin(2 * np.pi * rng.uniform(0.5, 4.0) * t + rng.uniform(0, 6.28))
        x += amp * am * np.sin(2 * np.pi * f * t + ph)
    x += _shaped_texture(rng, n)
    peak = np.max(np.abs(x))
    if peak > 0:
        x = 0.8 * x / peak
    return x.astype(np.float64), sr, dur_ms


def _base_tokens(seed: int, base_idx: int, vocab: list[str], n_long: int) -> list[str]:
    rng = _row_rng(seed, base_idx, stream=3)
    lo, hi = (50, 81) if base_idx < n_long else (10, 50)
    n_tok = int(rng.integers(lo, hi))
    return [vocab[int(j)] for j in rng.integers(0, len(vocab), n_tok)]


def _hot_transcript(seed: int, vocab: list[str]) -> str:
    rng = _row_rng(seed, 0x07AE, stream=4)
    return " ".join(vocab[int(j)] for j in rng.integers(0, len(vocab), 30))


def _encode(pcm: np.ndarray, sr: int, codec: str) -> bytes:
    if codec == "pcm_s16le":
        i16 = np.clip(np.round(pcm * 32767.0), -32768, 32767).astype("<i2")
        return i16.tobytes()
    return encode_wav(pcm, sr)


def _add_noise(pcm: np.ndarray, snr_db: float, rng: np.random.Generator) -> np.ndarray:
    rms = np.sqrt(np.mean(pcm**2))
    noise = rng.standard_normal(pcm.size) * (rms * 10 ** (-snr_db / 20.0))
    out = pcm + noise
    peak = np.max(np.abs(out))
    if peak > 0.999:
        out = 0.999 * out / peak
    return out


def _distractor_signal(
    pcm: np.ndarray, snr_db: float, rng: np.random.Generator, sr: int
) -> np.ndarray:
    """A planted TRUE NEGATIVE: base + shaped interferer, with the
    interferer level raised (deterministically) until the SimHash
    Hamming distance to the base clearly exceeds the match budget.

    FIXTURES.md requires distractors at <= 10 dB SNR that must NOT
    match.  White noise at 10 dB occasionally leaves spectral
    contrasts intact (when the base's envelope is uniformly loud), so
    datagen *verifies* the separation and lowers the SNR in -4 dB
    steps while staying <= the drawn value — the label 'not a dup' is
    then true by construction under the engine's own similarity
    definition, at whatever SNR that takes.
    """
    from file_dedup_rust_spark.config import DEFAULT_CONFIG as _CFG
    from file_dedup_rust_spark.functions.audio import (
        hamming64,
        simhash64,
        simhash_planes,
        spectral_features,
    )

    planes = simhash_planes(_CFG)
    base_sig = simhash64(spectral_features(pcm, sr, _CFG), planes)
    interferer = _shaped_texture(rng, pcm.size)
    rms = np.sqrt(np.mean(pcm**2))
    snr = snr_db
    for _ in range(8):
        out = pcm + interferer * (rms * 10 ** (-snr / 20.0))
        peak = np.max(np.abs(out))
        if peak > 0.999:
            out = 0.999 * out / peak
        d = hamming64(base_sig, simhash64(spectral_features(out, sr, _CFG), planes))
        if d > _CFG.hamming_max + 2:
            return out
        snr -= 4.0
    return out


def synth_rows(plan: pd.DataFrame, seed: int, vocab: list[str]) -> pd.DataFrame:
    """plan rows -> clips rows (pure function; runs in mapInPandas)."""
    hot_t = _hot_transcript(seed, vocab)
    n_long = int(plan["n_long_bases"].iloc[0]) if len(plan) else 0
    out = {k: [] for k in ["clip_id", "bytes", "sr_hz", "dur_ms", "codec", "transcript"]}
    for row in plan.itertuples(index=False):
        idx, role, src = int(row.idx), row.role, int(row.source)
        rng = _row_rng(seed, idx, stream=9)
        if role == "base" or role == "hot":
            pcm, sr, dur = _base_pcm(seed, idx)
            codec = _CODECS[int(rng.integers(0, 2))]
            data = _encode(pcm, sr, codec)
            if role == "hot":
                transcript = hot_t
            else:
                transcript = " ".join(_base_tokens(seed, idx, vocab, n_long))
        elif role == "exact":
            # byte-identical: regenerate the base row exactly
            pcm, sr, dur = _base_pcm(seed, src)
            base_rng = _row_rng(seed, src, stream=9)
            codec = _CODECS[int(base_rng.integers(0, 2))]
            data = _encode(pcm, sr, codec)
            transcript = " ".join(_base_tokens(seed, src, vocab, n_long))
        elif role in ("audio_near", "distractor"):
            pcm, sr, dur = _base_pcm(seed, src)
            if role == "audio_near":
                noisy = _add_noise(pcm, float(row.snr_db), rng)
            else:
                noisy = _distractor_signal(pcm, float(row.snr_db), rng, sr)
            base_rng = _row_rng(seed, src, stream=9)
            base_codec = _CODECS[int(base_rng.integers(0, 2))]
            codec = (
                _CODECS[1 - _CODECS.index(base_codec)] if row.codec_flip else base_codec
            )
            data = _encode(noisy, sr, codec)
            # unrelated transcript (isolates the audio path)
            transcript = " ".join(
                vocab[int(j)] for j in rng.integers(0, len(vocab), int(rng.integers(10, 40)))
            )
        elif role == "transcript_near":
            toks = _base_tokens(seed, src, vocab, n_long)
            n_edits = min(int(row.n_edits), len(toks))
            pos = rng.choice(len(toks), size=n_edits, replace=False)
            for p in pos:
                toks[int(p)] = vocab[int(rng.integers(0, len(vocab)))]
            transcript = " ".join(toks)
            pcm, sr, dur = _base_pcm(seed, idx + 10_000_019)  # unrelated audio
            codec = _CODECS[int(rng.integers(0, 2))]
            data = _encode(pcm, sr, codec)
        elif role == "containment":
            toks = _base_tokens(seed, src, vocab, n_long)
            pre = [vocab[int(j)] for j in rng.integers(0, len(vocab), int(row.n_prefix))]
            suf = [vocab[int(j)] for j in rng.integers(0, len(vocab), int(row.n_suffix))]
            transcript = " ".join(pre + toks + suf)
            pcm, sr, dur = _base_pcm(seed, idx + 20_000_033)
            codec = _CODECS[int(rng.integers(0, 2))]
            data = _encode(pcm, sr, codec)
        else:
            raise ValueError(f"unknown role {role}")
        out["clip_id"].append(row.clip_id)
        out["bytes"].append(data)
        out["sr_hz"].append(np.int32(sr))
        out["dur_ms"].append(np.int32(dur))
        out["codec"].append(codec)
        out["transcript"].append(transcript)
    pdf = pd.DataFrame(out)
    pdf["sr_hz"] = pdf["sr_hz"].astype("int32")
    pdf["dur_ms"] = pdf["dur_ms"].astype("int32")
    return pdf


def generate_clips_pandas(n: int, seed: int = 42) -> pd.DataFrame:
    """Driver-side generation (tests + numpy oracle)."""
    plan = build_plan(n, seed)
    return synth_rows(plan, seed, make_vocab(seed))


def generate_clips(spark, n: int, seed: int = 42, partitions: int = 32):
    """Distributed generation: plan rows scatter across partitions, each
    partition synthesizes content independently (no shuffle)."""
    plan = build_plan(n, seed)
    vocab = make_vocab(seed)
    plan_df = spark.createDataFrame(plan).repartition(partitions, "idx")

    def gen(batches):
        for pdf in batches:
            yield synth_rows(pdf, seed, vocab)

    return plan_df.mapInPandas(gen, schema=CLIP_SCHEMA)


BOILER_TOKENS = 80   # hot_skew_clips shared-transcript length (words)


def hot_skew_clips(
    spark, n_hot: int, seed: int = 42, sr: int = 16000,
    dur_s: float = 1.0, partitions: int = 32,
):
    """ADVERSARIAL hot-key corpus (VERDICT r4 item 8): n_hot clips that
    are near-identical but NOT collapsible by any exact tier — the
    skew shape the posting caps exist for.

      * transcript: one shared boilerplate (BOILER_TOKENS vocab words)
        + a per-clip unique suffix -> every t_norm is DISTINCT (the
        exact-transcript star cannot fold them) but shingle Jaccard is
        ~0.93, so MinHash bands and winnowing fingerprints pile all
        n_hot members into the same posting buckets;
      * audio: near-silence with a two-sample per-clip signature at
        the tail -> every sha256/pcm_sha is DISTINCT (no rep
        contraction) but the spectral features are nearly identical,
        so SimHash band keys collide for the whole set.

    Uncapped, each LSH posting bucket holds all n_hot members and the
    in-bucket work is n_hot^2 in ONE task; with cfg.band_cap the
    buckets are dropped-and-counted and the job stays linear.
    Deterministic; distributed generation, no shuffle."""
    vocab = make_vocab(seed)
    boiler = " ".join(vocab[i % len(vocab)] for i in range(BOILER_TOKENS))
    n_samp = max(int(sr * dur_s), 4)

    def gen(batches):
        for pdf in batches:
            out = {k: [] for k in
                   ["clip_id", "bytes", "sr_hz", "dur_ms", "codec",
                    "transcript"]}
            for i in pdf["id"]:
                i = int(i)
                pcm = np.zeros(n_samp, dtype="<i2")
                pcm[-1] = (i % 32000) + 1
                pcm[-2] = (i // 32000) + 1
                out["clip_id"].append(f"hot_{i:012d}")
                out["bytes"].append(pcm.tobytes())
                out["sr_hz"].append(np.int32(sr))
                out["dur_ms"].append(np.int32(dur_s * 1000))
                out["codec"].append("pcm_s16le")
                out["transcript"].append(f"{boiler} uniq{i} tail{i}")
            pdf_out = pd.DataFrame(out)
            pdf_out["sr_hz"] = pdf_out["sr_hz"].astype("int32")
            pdf_out["dur_ms"] = pdf_out["dur_ms"].astype("int32")
            yield pdf_out

    return (
        spark.range(n_hot).repartition(partitions)
        .mapInPandas(gen, schema=CLIP_SCHEMA)
    )


def planted_truth(n: int, seed: int = 42) -> pd.DataFrame:
    """Ground-truth duplicate pairs (a < b, kind) from the plan.

    Excludes distractors (must NOT match).  Hot rows are all mutual
    transcript dups; they are emitted with kind='hot' so recall
    accounting can treat capped buckets explicitly (SURVEY.md 7.3.2).
    Derived rows sharing one base are also mutual dups (same kind).
    """
    plan = build_plan(n, seed)
    pairs: set[tuple[str, str, str]] = set()
    by_base: dict[tuple[str, int], list[str]] = {}
    base_id = {int(r.idx): r.clip_id for r in plan.itertuples() if r.role == "base"}
    for r in plan.itertuples():
        if r.role in ("exact", "audio_near", "transcript_near", "containment"):
            b = base_id[int(r.source)]
            x, y = sorted([r.clip_id, b])
            pairs.add((x, y, r.role))
            by_base.setdefault((r.role, int(r.source)), []).append(r.clip_id)
    # siblings derived from the same base with the same kind
    for (kind, _), sibs in by_base.items():
        for i in range(len(sibs)):
            for j in range(i + 1, len(sibs)):
                x, y = sorted([sibs[i], sibs[j]])
                pairs.add((x, y, kind))
    hot_ids = sorted(r.clip_id for r in plan.itertuples() if r.role == "hot")
    for i in range(len(hot_ids)):
        for j in range(i + 1, len(hot_ids)):
            pairs.add((hot_ids[i], hot_ids[j], "hot"))
    out = pd.DataFrame(sorted(pairs), columns=["a", "b", "kind"])
    return out


def clustered_embeddings_pandas(
    n: int, d: int = 64, n_clusters: int = 64, sigma: float = 0.1,
    seed: int = 7,
) -> pd.DataFrame:
    """Mixture-of-Gaussians unit embeddings — the 'clusterable real
    embeddings' regime of the IVF tuning note (operators/ann.py
    module docstring), in contrast to the isotropic testdata
    embeddings (max pairwise cosine ~0.5, the ANN worst case).

    n_clusters unit centers drawn isotropically; point i belongs to
    cluster i % n_clusters with embedding = normalize(center +
    sigma * noise).  With sigma=0.1 and d=64, in-cluster cosine sits
    ~1/(1 + sigma^2 d) ~ 0.6 while cross-cluster stays ~0 — true
    top-k neighbours are overwhelmingly in-cluster, so an IVF probe
    that finds the right cells needs far fewer of them.  Deterministic
    (seeded numpy)."""
    rng = np.random.default_rng(seed)
    C = rng.standard_normal((n_clusters, d))
    C /= np.linalg.norm(C, axis=1, keepdims=True)
    labels = np.arange(n, dtype=np.int64) % n_clusters
    V = C[labels] + sigma * rng.standard_normal((n, d))
    V /= np.linalg.norm(V, axis=1, keepdims=True)
    return pd.DataFrame(
        {"vec_id": np.arange(n, dtype=np.int64),
         "embedding": list(V),
         "label": labels.astype(np.int32)}
    )


def clustered_embeddings(spark, n: int, d: int = 64, n_clusters: int = 64,
                         sigma: float = 0.1, seed: int = 7):
    pdf = clustered_embeddings_pandas(n, d, n_clusters, sigma, seed)
    pdf = pdf.assign(embedding=[list(map(float, v)) for v in pdf.embedding])
    return spark.createDataFrame(
        pdf, schema="vec_id long, embedding array<double>, label int"
    )
