"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Design for 100 TB: media payloads ride through Spark as `binary` columns with
a small typed `meta` struct; all decode / feature-extraction / resize /
frame-sampling runs as Arrow-batched pandas UDF stages (`mapInPandas`) so
payload bytes make exactly one JVM→Python hop per stage. Partitioning is by
`kind` so each decode stage scans only its modality (partition pruning — the
same storage-level predicate the reference gets from its label filter,
`/root/reference/src/main/java/ca/uwaterloo/cs/sgp/streaming/EdgeCutSGP.java:84-92`).

Codec layers, honest about what's real here:
  * REAL interchange formats with stdlib-only parsers — RIFF/WAVE PCM
    (`encode_wav`/`decode_wav` via the `wave` module) and 24-bit BMP
    (`encode_bmp`/`decode_bmp`, hand-parsed headers). These are actual
    on-disk formats any player/viewer opens, round-trip-tested and driven
    end-to-end through the feature stages (decoder= parameter).
  * COMPRESSED formats (JPEG/PNG/FLAC/H.264) need PIL/soundfile, which this
    container doesn't ship: `decode_external` raises a clearly-marked
    NotImplementedError for them and activates automatically where those
    libs exist.
  * The SGPM deterministic synthetic container (below) remains the bulk
    test surface for batch shapes and video framing.

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


# ------------------------------------------------- real formats, stdlib-only

def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """int16 mono PCM → a real RIFF/WAVE file (stdlib `wave` — no external
    libs). This is the actual interchange format, not the SGPM container."""
    import io
    import wave

    bio = io.BytesIO()
    with wave.open(bio, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(samples.astype("<i2").tobytes())
    return bio.getvalue()


def decode_wav(buf: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE (PCM) → (int16 samples, sample_rate), stdlib `wave`."""
    import io
    import wave

    with wave.open(io.BytesIO(buf), "rb") as w:
        if w.getsampwidth() != 2:
            raise ValueError("only 16-bit PCM WAV supported")
        frames = w.readframes(w.getnframes())
        data = np.frombuffer(frames, dtype="<i2")
        if w.getnchannels() > 1:
            data = data.reshape(-1, w.getnchannels()).mean(
                axis=1).astype(np.int16)
        return data, w.getframerate()


def encode_bmp(pixels: np.ndarray) -> bytes:
    """(h, w, 3) RGB uint8 → a real 24-bit uncompressed BMP (bottom-up
    rows, BGR order, 4-byte row padding — the on-disk format any image
    viewer opens)."""
    h, w = pixels.shape[:2]
    row = w * 3
    pad = (-row) % 4
    body = bytearray()
    bgr = pixels[..., ::-1]  # RGB → BGR
    for y in range(h - 1, -1, -1):
        body += bgr[y].astype(np.uint8).tobytes() + b"\x00" * pad
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body),
                       2835, 2835, 0, 0)
    head = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(body), 0, 0, 14 + 40)
    return head + info + bytes(body)


def decode_bmp(buf: bytes) -> np.ndarray:
    """24-bit uncompressed BMP → (h, w, 3) RGB uint8."""
    magic, _sz, _r1, _r2, off = struct.unpack_from("<2sIHHI", buf, 0)
    if magic != b"BM":
        raise ValueError("not a BMP file")
    hsize, w, h, _planes, bpp, comp = struct.unpack_from("<IiiHHI", buf, 14)
    if bpp != 24 or comp != 0:
        raise ValueError(f"only 24-bit uncompressed BMP supported "
                         f"(bpp={bpp}, compression={comp})")
    flip = h > 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(buf, dtype=np.uint8, count=h * stride, offset=off)
    rows = rows.reshape(h, stride)[:, :w * 3].reshape(h, w, 3)
    if flip:
        rows = rows[::-1]
    return rows[..., ::-1].copy()  # BGR → RGB


def decode_external(buf: bytes, fmt: str):
    """Real-world codec hook. WAV and BMP decode with stdlib-only parsers
    above (fully exercised in tests); compressed formats (JPEG/PNG/FLAC)
    need PIL / soundfile and raise a clearly-marked NotImplementedError
    when those aren't importable (they are not in this sandbox)."""
    if fmt == "wav":
        return decode_wav(buf)
    if fmt == "bmp":
        return decode_bmp(buf)
    if fmt in ("jpeg", "png", "webp"):
        try:
            import io

            from PIL import Image  # noqa: F401
        except ImportError as exc:
            raise NotImplementedError(
                f"external image codec ({fmt}) needs PIL — not available "
                "in this environment; use BMP (stdlib path) or SGPM "
                "synthetic media instead") from exc
        return np.asarray(Image.open(io.BytesIO(buf)))
    if fmt in ("flac", "ogg"):
        try:
            import io

            import soundfile  # noqa: F401
        except ImportError as exc:
            raise NotImplementedError(
                f"external audio codec ({fmt}) needs soundfile — not "
                "available in this environment; use WAV (stdlib path)"
            ) from exc
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


def image_feature_stage(df, thumb: int = 4, decoder=decode_image):
    """Decode + feature-extract + resize for image rows. One Arrow hop;
    filter `kind='image'` BEFORE this stage so only image bytes ship.
    `decoder` picks the payload format: decode_image (SGPM container,
    default) or decode_bmp (real on-disk BMP, stdlib parser) — the stage
    itself is format-agnostic."""

    def extract(iterator):
        import pandas as pd

        for pdf in iterator:
            out = []
            for mid, buf in zip(pdf["media_id"], pdf["payload"]):
                px = decoder(bytes(buf))
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


def audio_feature_stage(df, decoder=decode_audio):
    """`decoder` maps payload bytes → (samples, sample_rate): decode_audio
    (SGPM, default) or decode_wav (real RIFF/WAVE, stdlib parser)."""

    def extract(iterator):
        import pandas as pd

        for pdf in iterator:
            out = []
            for mid, buf in zip(pdf["media_id"], pdf["payload"]):
                samples, sr = decoder(bytes(buf))
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
