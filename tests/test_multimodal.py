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
