"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Design for 100 TB: media payloads ride through Spark as `binary` columns with
a small typed `meta` struct; all decode / feature-extraction / resize /
frame-sampling runs as Arrow-batched pandas UDF stages (`mapInPandas`) so
payload bytes make exactly one JVM→Python hop per stage. Partitioning is by
`kind` so each decode stage scans only its modality (partition pruning — the
same storage-level predicate the reference gets from its label filter,
`/root/reference/src/main/java/ca/uwaterloo/cs/sgp/streaming/EdgeCutSGP.java:84-92`).

The container ships no codec libraries, so REAL external decoding (JPEG/PNG/
FLAC/H.264) is STUBBED: `decode_external` raises NotImplementedError unless
PIL/soundfile are importable. The test surface instead uses the SGPM
deterministic synthetic container (self-describing header + raw samples), so
the Spark-side plumbing — schemas, batch shapes, UDF signatures, numpy
kernels (block-mean resize, RMS/ZCR, frame sampling) — is fully real and
tested end-to-end.

SGPM container layout (little-endian):
    magic  4s  b"SGPM"
    kind   B   1=image 2=audio 3=video
    image: width u16, height u16, channels u8, then w*h*c uint8 pixels
    audio: sample_rate u32, n_samples u32, then int16 PCM
    video: width u16, height u16, n_frames u16, then per-frame grayscale
           w*h uint8
"""

from __future__ import annotations

import struct

import numpy as np

MAGIC = b"SGPM"
KIND_IMAGE, KIND_AUDIO, KIND_VIDEO = 1, 2, 3
_KIND_NAMES = {KIND_IMAGE: "image", KIND_AUDIO: "audio", KIND_VIDEO: "video"}

MEDIA_SCHEMA = ("media_id string, kind string, payload binary, "
                "width int, height int, channels int, sample_rate int, "
                "n_samples int, n_frames int, source string")


# ============================================================== codecs (SGPM)

def encode_image(pixels: np.ndarray) -> bytes:
    h, w = pixels.shape[:2]
    c = 1 if pixels.ndim == 2 else pixels.shape[2]
    head = struct.pack("<4sBHHB", MAGIC, KIND_IMAGE, w, h, c)
    return head + pixels.astype(np.uint8).tobytes()


def decode_image(buf: bytes) -> np.ndarray:
    magic, kind, w, h, c = struct.unpack_from("<4sBHHB", buf, 0)
    if magic != MAGIC or kind != KIND_IMAGE:
        raise ValueError("not an SGPM image")
    off = struct.calcsize("<4sBHHB")
    px = np.frombuffer(buf, dtype=np.uint8, count=w * h * c, offset=off)
    return px.reshape(h, w, c) if c > 1 else px.reshape(h, w)


def encode_audio(samples: np.ndarray, sample_rate: int) -> bytes:
    head = struct.pack("<4sBII", MAGIC, KIND_AUDIO, sample_rate, samples.size)
    return head + samples.astype("<i2").tobytes()


def decode_audio(buf: bytes) -> tuple[np.ndarray, int]:
    magic, kind, sr, n = struct.unpack_from("<4sBII", buf, 0)
    if magic != MAGIC or kind != KIND_AUDIO:
        raise ValueError("not an SGPM audio clip")
    off = struct.calcsize("<4sBII")
    return np.frombuffer(buf, dtype="<i2", count=n, offset=off), sr


def encode_video(frames: np.ndarray) -> bytes:
    n, h, w = frames.shape
    head = struct.pack("<4sBHHH", MAGIC, KIND_VIDEO, w, h, n)
    return head + frames.astype(np.uint8).tobytes()


def decode_video(buf: bytes) -> np.ndarray:
    magic, kind, w, h, n = struct.unpack_from("<4sBHHH", buf, 0)
    if magic != MAGIC or kind != KIND_VIDEO:
        raise ValueError("not an SGPM video clip")
    off = struct.calcsize("<4sBHHH")
    px = np.frombuffer(buf, dtype=np.uint8, count=n * h * w, offset=off)
    return px.reshape(n, h, w)


def decode_external(buf: bytes, fmt: str):
    """Real-world codec hook. The sandbox ships no image/audio libraries, so
    this is a clearly-marked stub: it activates only if PIL / soundfile are
    importable in the deployment environment."""
    if fmt in ("jpeg", "png", "webp"):
        try:
            import io

            from PIL import Image  # noqa: F401
        except ImportError as exc:
            raise NotImplementedError(
                f"external image codec ({fmt}) needs PIL — not available "
                "in this environment; SGPM synthetic media exercises the "
                "Spark plumbing instead") from exc
        return np.asarray(Image.open(io.BytesIO(buf)))
    if fmt in ("wav", "flac", "ogg"):
        try:
            import io

            import soundfile  # noqa: F401
        except ImportError as exc:
            raise NotImplementedError(
                f"external audio codec ({fmt}) needs soundfile — not "
                "available in this environment") from exc
        return soundfile.read(io.BytesIO(buf))
    raise NotImplementedError(f"no codec for format {fmt!r}")


# ============================================================= numpy kernels

def block_mean_resize(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Deterministic area resize via block means (no interpolation libs)."""
    h, w = img.shape[:2]
    ys = (np.arange(out_h + 1) * h // out_h)
    xs = (np.arange(out_w + 1) * w // out_w)
    out_shape = (out_h, out_w) + img.shape[2:]
    out = np.empty(out_shape, dtype=np.float64)
    for i in range(out_h):
        rows = img[ys[i]:max(ys[i + 1], ys[i] + 1)]
        for j in range(out_w):
            block = rows[:, xs[j]:max(xs[j + 1], xs[j] + 1)]
            out[i, j] = block.mean(axis=(0, 1))
    return out


def audio_features(samples: np.ndarray, sr: int) -> dict:
    x = samples.astype(np.float64) / 32768.0
    zc = np.count_nonzero(np.signbit(x[1:]) != np.signbit(x[:-1]))
    return {
        "duration_ms": int(1000 * samples.size / max(sr, 1)),
        "rms": float(np.sqrt(np.mean(x * x))) if x.size else 0.0,
        "zcr": float(zc / max(x.size - 1, 1)),
        "peak": float(np.abs(x).max()) if x.size else 0.0,
    }


# ============================================================ synthetic data

def synth_media_pdf(n_per_kind: int = 30, seed: int = 42):
    """Deterministic synthetic media table (pandas) in SGPM format."""
    import pandas as pd

    rows = []
    for i in range(n_per_kind):
        rng = np.random.default_rng(np.random.SeedSequence([seed, 1, i]))
        h, w, c = int(rng.integers(16, 64)), int(rng.integers(16, 64)), 3
        px = rng.integers(0, 256, (h, w, c), dtype=np.uint8)
        rows.append((f"img:{i:06d}", "image", encode_image(px),
                     w, h, c, None, None, None, f"cam{i % 4}"))
    for i in range(n_per_kind):
        rng = np.random.default_rng(np.random.SeedSequence([seed, 2, i]))
        sr = int(rng.choice([8000, 16000]))
        n = int(rng.integers(sr // 4, sr))
        samples = (rng.standard_normal(n) * 3000).astype(np.int16)
        rows.append((f"aud:{i:06d}", "audio", encode_audio(samples, sr),
                     None, None, None, sr, n, None, f"mic{i % 3}"))
    for i in range(n_per_kind):
        rng = np.random.default_rng(np.random.SeedSequence([seed, 3, i]))
        nf, h, w = int(rng.integers(4, 16)), 24, 32
        frames = rng.integers(0, 256, (nf, h, w), dtype=np.uint8)
        rows.append((f"vid:{i:06d}", "video", encode_video(frames),
                     w, h, None, None, None, nf, f"cam{i % 4}"))
    return pd.DataFrame(rows, columns=[
        "media_id", "kind", "payload", "width", "height", "channels",
        "sample_rate", "n_samples", "n_frames", "source"])


def synth_media_df(spark, n_per_kind: int = 30, seed: int = 42):
    # tuples, not pandas: pandas coerces nullable int columns to float NaN,
    # which IntegerType rejects — undo that per cell
    def clean(v):
        if v is None or (isinstance(v, float) and np.isnan(v)):
            return None
        if isinstance(v, (float, np.integer)):
            return int(v)
        return v

    rows = [tuple(clean(v) for v in r) for r in
            synth_media_pdf(n_per_kind, seed).itertuples(index=False)]
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


# ============================================================= Spark stages

IMAGE_FEATURES_SCHEMA = ("media_id string, width int, height int, "
                         "mean_r double, mean_g double, mean_b double, "
                         "thumb array<double>")


def image_feature_stage(df, thumb: int = 4):
    """Decode + feature-extract + resize for image rows. One Arrow hop;
    filter `kind='image'` BEFORE this stage so only image bytes ship."""

    def extract(iterator):
        import pandas as pd

        for pdf in iterator:
            out = []
            for mid, buf in zip(pdf["media_id"], pdf["payload"]):
                px = decode_image(bytes(buf))
                h, w = px.shape[:2]
                means = px.reshape(-1, px.shape[2]).mean(axis=0) \
                    if px.ndim == 3 else np.repeat(px.mean(), 3)
                tm = block_mean_resize(px if px.ndim == 2 else
                                       px.mean(axis=2), thumb, thumb)
                out.append((mid, w, h, float(means[0]), float(means[1]),
                            float(means[2]), tm.ravel().round(3).tolist()))
            yield pd.DataFrame(out, columns=[
                "media_id", "width", "height", "mean_r", "mean_g",
                "mean_b", "thumb"])

    return (df.filter(df.kind == "image")
            .select("media_id", "payload")
            .mapInPandas(extract, IMAGE_FEATURES_SCHEMA))


AUDIO_FEATURES_SCHEMA = ("media_id string, sample_rate int, duration_ms int, "
                         "rms double, zcr double, peak double")


def audio_feature_stage(df):
    def extract(iterator):
        import pandas as pd

        for pdf in iterator:
            out = []
            for mid, buf in zip(pdf["media_id"], pdf["payload"]):
                samples, sr = decode_audio(bytes(buf))
                f = audio_features(samples, sr)
                out.append((mid, sr, f["duration_ms"], round(f["rms"], 5),
                            round(f["zcr"], 5), round(f["peak"], 5)))
            yield pd.DataFrame(out, columns=[
                "media_id", "sample_rate", "duration_ms", "rms", "zcr",
                "peak"])

    return (df.filter(df.kind == "audio")
            .select("media_id", "payload")
            .mapInPandas(extract, AUDIO_FEATURES_SCHEMA))


FRAME_SAMPLE_SCHEMA = ("media_id string, frame_idx int, mean_lum double, "
                       "thumb array<double>")


def frame_sample_stage(df, every: int = 2, thumb: int = 4):
    """Video → sampled frames (every k-th), per-frame luminance + thumbnail.
    A row-expanding stage (one media row → many frame rows): mapInPandas
    yields more rows than it consumes — the UDTF shape."""

    def sample(iterator):
        import pandas as pd

        for pdf in iterator:
            out = []
            for mid, buf in zip(pdf["media_id"], pdf["payload"]):
                frames = decode_video(bytes(buf))
                for fi in range(0, frames.shape[0], every):
                    fr = frames[fi]
                    tm = block_mean_resize(fr, thumb, thumb)
                    out.append((mid, fi, round(float(fr.mean()), 3),
                                tm.ravel().round(3).tolist()))
            yield pd.DataFrame(out, columns=[
                "media_id", "frame_idx", "mean_lum", "thumb"])

    return (df.filter(df.kind == "video")
            .select("media_id", "payload")
            .mapInPandas(sample, FRAME_SAMPLE_SCHEMA))
