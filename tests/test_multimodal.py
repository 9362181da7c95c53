"""Multimodal plumbing: real resize, pcm16 audio features, raw video
frame sampling; stubbed codecs raise at the marked swap-in point."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from lazyosm_spark.sources import images as im


def test_resize_spark_path(spark, fx):
    out = fx["images"].mapInPandas(
        im.resize_images_batches_fn(8, 8), im.RESIZE_SCHEMA
    )
    rows = out.collect()
    assert len(rows) == fx["images"].count()
    for r in rows[:10]:
        px = np.frombuffer(bytes(r["bytes"]), dtype=np.uint8).reshape(8, 8, 3)
        assert r["w"] == 8 and r["h"] == 8 and r["fmt"] == "raw"
        assert px.std() > 0  # not degenerate


def test_resize_identity():
    px = im.reference_pixels(3, 16, 16)
    fn = im.resize_images_batches_fn(16, 16)
    import pandas as pd

    pdf = pd.DataFrame(
        [("a", im.encode_image(px, "raw"), 16, 16, "raw")],
        columns=["image_id", "bytes", "w", "h", "fmt"],
    )
    out = next(fn(iter([pdf])))
    got = np.frombuffer(out["bytes"][0], dtype=np.uint8).reshape(16, 16, 3)
    assert np.array_equal(got, px)  # same-size resize is identity


def test_audio_pcm16_features(spark):
    t = np.arange(8000)
    wave = (np.sin(2 * np.pi * 440 * t / 8000) * 20000).astype("<i2")
    df = spark.createDataFrame(
        [("c1", wave.tobytes(), "pcm16", 8000)],
        "clip_id string, bytes binary, codec string, sample_rate int",
    )
    r = df.mapInPandas(im.audio_features_batches, im.AUDIO_FEATURES_SCHEMA).first()
    assert r["n_samples"] == 8000
    assert abs(r["rms"] - 20000 / 32768 / np.sqrt(2)) < 0.01
    assert 870 <= r["zero_crossings"] <= 890  # ~2*440 per second


def test_wav_codec_matches_stdlib_oracle():
    """Our RIFF/WAVE parser vs the INDEPENDENT stdlib wave module:
    same samples, same sample rate, both directions."""
    import io
    import wave as wave_mod

    t = np.arange(4000)
    samples = (np.sin(2 * np.pi * 220 * t / 8000) * 12000).astype("<i2")
    buf = im.encode_wav_pcm16(samples, 8000)

    with wave_mod.open(io.BytesIO(buf)) as w:
        assert w.getframerate() == 8000
        assert w.getnchannels() == 1 and w.getsampwidth() == 2
        oracle = np.frombuffer(w.readframes(w.getnframes()), dtype="<i2")
    assert np.array_equal(oracle, samples)

    got, sr = im.decode_wav_pcm16(buf)
    assert sr == 8000 and np.array_equal(got, samples)

    # and a stdlib-WRITTEN wav decodes identically (chunk-walk robust)
    out = io.BytesIO()
    with wave_mod.open(out, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(samples.tobytes())
    got2, sr2 = im.decode_wav_pcm16(out.getvalue())
    assert sr2 == 16000 and np.array_equal(got2, samples)


def test_mulaw_matches_audioop_oracle():
    """G.711 mu-law expansion vs the INDEPENDENT stdlib audioop table,
    over every possible byte."""
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        import audioop

    every_byte = np.arange(256, dtype=np.uint8)
    want = np.frombuffer(audioop.ulaw2lin(every_byte.tobytes(), 2), dtype="<i2")
    got = im.mulaw_decode(every_byte)
    assert np.array_equal(got, want)

    # round-trip: encode our own samples, decode, bounded error
    t = np.arange(2000)
    x = (np.sin(2 * np.pi * 330 * t / 8000) * 15000).astype(np.int16)
    back = im.mulaw_decode(im.mulaw_encode(x)).astype(np.float64)
    snr = 10 * np.log10(
        np.mean(x.astype(np.float64) ** 2) / np.mean((x - back) ** 2)
    )
    assert snr > 30  # companding noise floor, way above it for a sine


def test_mulaw_decodes_stdlib_encoded_streams():
    """Random int16 streams compressed by the INDEPENDENT stdlib
    encoder (audioop.lin2ulaw) must decode identically through our
    expansion to the stdlib's own decoder — cross-implementation
    round-trip, not just the 256-value table."""
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        import audioop

    rng = np.random.default_rng(17)
    for trial in range(5):
        x = rng.integers(-32768, 32768, size=5000).astype("<i2")
        comp = audioop.lin2ulaw(x.tobytes(), 2)
        want = np.frombuffer(audioop.ulaw2lin(comp, 2), dtype="<i2")
        got = im.mulaw_decode(np.frombuffer(comp, dtype=np.uint8))
        assert np.array_equal(got, want), trial


def test_audio_wav_mulaw_spark_features(spark):
    """The Spark mapInPandas path decodes wav + mulaw for real and the
    dominant-frequency feature lands on the generated tone."""
    sr, f0 = 8000, 440
    t = np.arange(sr)  # 1 second
    x = (np.sin(2 * np.pi * f0 * t / sr) * 20000).astype(np.int16)
    rows = [
        ("wav1", im.encode_wav_pcm16(x, sr), "wav", 0),  # wav carries its own sr
        ("mu1", im.mulaw_encode(x).tobytes(), "mulaw", sr),
    ]
    df = spark.createDataFrame(
        rows, "clip_id string, bytes binary, codec string, sample_rate int"
    )
    out = {
        r["clip_id"]: r
        for r in df.mapInPandas(
            im.audio_features_batches, im.AUDIO_FEATURES_SCHEMA
        ).collect()
    }
    for cid in ("wav1", "mu1"):
        r = out[cid]
        assert r["n_samples"] == sr and abs(r["duration_s"] - 1.0) < 1e-9
        assert abs(r["dominant_freq_hz"] - f0) < 1.0
        assert abs(r["rms"] - 20000 / 32768 / np.sqrt(2)) < 0.02


def test_video_lvid_real_codec_sampling(spark):
    """lvid container: sampled frames decode through the real lossy-DCT
    codec at PSNR >= 40 vs their source pixels; skipped frames are
    never decoded (only their length prefixes are read)."""
    frames = [im.reference_pixels(100 + i, 32, 24) for i in range(25)]
    buf = im.encode_video_lvid(frames)
    df = spark.createDataFrame(
        [("v2", buf, "lvid", 25, 32, 24)],
        "video_id string, bytes binary, codec string, n_frames int, w int, h int",
    )
    out = df.mapInPandas(
        im.sample_video_frames_batches_fn(every_n=10), im.FRAME_SAMPLE_SCHEMA
    ).collect()
    assert [r["frame_idx"] for r in out] == [0, 10, 20]
    for r in out:
        got = np.frombuffer(bytes(r["frame"]), dtype=np.uint8).reshape(24, 32, 3)
        assert im.psnr(frames[r["frame_idx"]], got) >= 40.0


def test_audio_stub_raises(spark):
    df = spark.createDataFrame(
        [("c1", b"\x00", "mp3", 44100)],
        "clip_id string, bytes binary, codec string, sample_rate int",
    )
    with pytest.raises(Exception, match="stubbed"):
        df.mapInPandas(im.audio_features_batches, im.AUDIO_FEATURES_SCHEMA).collect()


def test_video_frame_sampling(spark):
    w, h, n = 4, 3, 25
    frames = np.arange(n * w * h * 3, dtype=np.uint8).tobytes()
    df = spark.createDataFrame(
        [("v1", frames, "rawv", n, w, h)],
        "video_id string, bytes binary, codec string, n_frames int, w int, h int",
    )
    out = df.mapInPandas(
        im.sample_video_frames_batches_fn(every_n=10), im.FRAME_SAMPLE_SCHEMA
    ).collect()
    assert [r["frame_idx"] for r in out] == [0, 10, 20]
    f10 = np.frombuffer(bytes(out[1]["frame"]), dtype=np.uint8)
    assert f10[0] == (10 * w * h * 3) % 256
