"""Multimodal plumbing tests: SGPM + real-format (WAV/BMP, stdlib) codec
round-trips, numpy feature kernels, and the Spark mapInPandas stages
(schema, batch shape, row expansion) over synthetic media. Compressed
external codecs must raise the documented stub."""

import importlib.util

import numpy as np
import pytest

from sgp_sketch import multimodal as mm


def test_image_codec_roundtrip():
    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, (20, 30, 3), dtype=np.uint8)
    np.testing.assert_array_equal(mm.decode_image(mm.encode_image(px)), px)


def test_audio_codec_roundtrip():
    rng = np.random.default_rng(4)
    s = (rng.standard_normal(1000) * 1000).astype(np.int16)
    dec, sr = mm.decode_audio(mm.encode_audio(s, 16000))
    assert sr == 16000
    np.testing.assert_array_equal(dec, s)


def test_video_codec_roundtrip():
    rng = np.random.default_rng(5)
    fr = rng.integers(0, 256, (6, 8, 10), dtype=np.uint8)
    np.testing.assert_array_equal(mm.decode_video(mm.encode_video(fr)), fr)


def test_codec_rejects_wrong_kind():
    rng = np.random.default_rng(6)
    img = mm.encode_image(rng.integers(0, 256, (4, 4), dtype=np.uint8))
    with pytest.raises(ValueError):
        mm.decode_audio(img)


_HAS_PIL = importlib.util.find_spec("PIL") is not None
_HAS_SOUNDFILE = importlib.util.find_spec("soundfile") is not None


@pytest.mark.skipif(_HAS_PIL, reason="PIL installed: image stub unreachable")
def test_external_image_codec_is_stubbed_without_pil():
    """Compressed image formats need PIL (absent here): clearly-marked
    NotImplementedError, never a silent wrong answer."""
    with pytest.raises(NotImplementedError):
        mm.decode_external(b"\xff\xd8\xff", "jpeg")


@pytest.mark.skipif(_HAS_SOUNDFILE,
                    reason="soundfile installed: audio stub unreachable")
def test_external_audio_codec_is_stubbed_without_soundfile():
    with pytest.raises(NotImplementedError):
        mm.decode_external(b"fLaC", "flac")


@pytest.mark.skipif(not _HAS_PIL, reason="needs PIL")
def test_decode_external_png_with_pil():
    """Wherever PIL exists, the compressed-image hook must round-trip a
    lossless PNG exactly (this is skipped in the build sandbox, collected
    and run anywhere PIL ships)."""
    import io

    from PIL import Image

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (6, 5, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    got = mm.decode_external(buf.getvalue(), "png")
    np.testing.assert_array_equal(got, img)


@pytest.mark.skipif(not _HAS_SOUNDFILE, reason="needs soundfile")
def test_decode_external_flac_with_soundfile():
    """Wherever soundfile exists, the compressed-audio hook must round-trip
    lossless FLAC samples."""
    import io

    import soundfile

    rng = np.random.default_rng(12)
    samples = (rng.standard_normal(2000) * 2000).astype(np.int16)
    buf = io.BytesIO()
    soundfile.write(buf, samples, 8000, format="FLAC")
    got, sr = mm.decode_external(buf.getvalue(), "flac")
    assert sr == 8000
    np.testing.assert_array_equal(np.asarray(got * 32768, dtype=np.int16)
                                  if np.asarray(got).dtype.kind == "f"
                                  else np.asarray(got), samples)


def test_wav_roundtrip_stdlib():
    """Real RIFF/WAVE PCM: encode → decode_external('wav') → identical
    samples + rate, stdlib only."""
    rng = np.random.default_rng(3)
    samples = (rng.standard_normal(4000) * 2000).astype(np.int16)
    buf = mm.encode_wav(samples, 16000)
    assert buf[:4] == b"RIFF" and buf[8:12] == b"WAVE"
    got, sr = mm.decode_external(buf, "wav")
    assert sr == 16000
    np.testing.assert_array_equal(got, samples)


def test_bmp_roundtrip_stdlib():
    """Real 24-bit BMP (odd width forces row padding): encode →
    decode_external('bmp') → identical RGB pixels."""
    rng = np.random.default_rng(4)
    px = rng.integers(0, 256, (17, 23, 3), dtype=np.uint8)
    buf = mm.encode_bmp(px)
    assert buf[:2] == b"BM"
    got = mm.decode_external(buf, "bmp")
    np.testing.assert_array_equal(got, px)


def test_feature_stages_on_real_formats(spark):
    """End-to-end: WAV and BMP payloads flow through the SAME mapInPandas
    feature stages as SGPM media (decoder= swap), producing identical
    features to the raw arrays."""
    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, (20, 30, 3), dtype=np.uint8)
    samples = (rng.standard_normal(8000) * 2500).astype(np.int16)
    rows = [("bmp:0", "image", mm.encode_bmp(px), 30, 20, 3,
             None, None, None, "cam0"),
            ("wav:0", "audio", mm.encode_wav(samples, 8000), None, None,
             None, 8000, 8000, None, "mic0")]
    df = spark.createDataFrame(rows, schema=mm.MEDIA_SCHEMA)
    img = mm.image_feature_stage(df, decoder=mm.decode_bmp).collect()[0]
    assert (img.width, img.height) == (30, 20)
    assert abs(img.mean_r - px[..., 0].mean()) < 1e-6
    aud = mm.audio_feature_stage(df, decoder=mm.decode_wav).collect()[0]
    ref = mm.audio_features(samples, 8000)
    assert aud.duration_ms == ref["duration_ms"]
    assert abs(aud.rms - ref["rms"]) < 1e-4


def test_block_mean_resize_constant_image():
    img = np.full((32, 48), 7.0)
    out = mm.block_mean_resize(img, 4, 4)
    assert out.shape == (4, 4)
    np.testing.assert_allclose(out, 7.0)


def test_block_mean_resize_preserves_global_mean():
    rng = np.random.default_rng(8)
    img = rng.integers(0, 256, (64, 64)).astype(np.float64)
    out = mm.block_mean_resize(img, 8, 8)
    assert abs(out.mean() - img.mean()) < 1e-9  # 64 divides evenly


def test_audio_features_sine():
    sr = 8000
    t = np.arange(sr) / sr
    s = (np.sin(2 * np.pi * 100 * t) * 16384).astype(np.int16)
    f = mm.audio_features(s, sr)
    assert f["duration_ms"] == 1000
    assert abs(f["rms"] - 0.5 / np.sqrt(2)) < 0.01
    assert abs(f["zcr"] - 200 / sr) < 0.01  # 100 Hz ⇒ 200 crossings/s


# ================================================================== Spark

@pytest.fixture(scope="module")
def media_sdf(spark):
    df = mm.synth_media_df(spark, n_per_kind=20).cache()
    df.count()
    return df


def test_image_stage(spark, media_sdf):
    out = mm.image_feature_stage(media_sdf).toPandas()
    assert len(out) == 20
    assert set(out.columns) == {"media_id", "width", "height", "mean_r",
                                "mean_g", "mean_b", "thumb"}
    assert all(len(t) == 16 for t in out.thumb)
    assert out.mean_r.between(0, 255).all()
    # cross-check one row against a local decode
    row = out.iloc[0]
    local = mm.synth_media_pdf(20)
    buf = local.loc[local.media_id == row.media_id, "payload"].iloc[0]
    px = mm.decode_image(bytes(buf))
    assert row.width == px.shape[1] and row.height == px.shape[0]
    assert abs(row.mean_r - px[..., 0].mean()) < 1e-6


def test_audio_stage(spark, media_sdf):
    out = mm.audio_feature_stage(media_sdf).toPandas()
    assert len(out) == 20
    assert (out.rms > 0).all()
    assert out.duration_ms.between(200, 1100).all()


def test_video_stage_row_expansion(spark, media_sdf):
    out = mm.frame_sample_stage(media_sdf, every=2).toPandas()
    # one media row expands to ceil(n_frames/2) frame rows
    local = mm.synth_media_pdf(20)
    vids = local[local.kind == "video"]
    expected = int(sum(-(-n // 2) for n in vids.n_frames))
    assert len(out) == expected
    assert (out.frame_idx % 2 == 0).all()
    assert out.mean_lum.between(0, 255).all()


def test_media_partition_pruning_shape(spark, media_sdf, tmp_path):
    """kind-partitioned storage: the image stage's scan touches only the
    image partition (PartitionFilters in the plan)."""
    path = str(tmp_path / "media")
    media_sdf.write.partitionBy("kind").parquet(path)
    df = spark.read.parquet(path)
    plan = (df.filter(df.kind == "image").select("media_id", "payload")
            ._jdf.queryExecution().executedPlan().toString())
    assert "PartitionFilters" in plan
    assert mm.image_feature_stage(df).count() == 20
