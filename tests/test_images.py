"""Image codec + multimodal plumbing: roundtrip fidelity (PSNR gate),
caption byte-equality, phash consistency, Spark mapInPandas path."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from lazyosm_spark.sources import images as im


def test_codec_roundtrip_all_formats():
    for i in (0, 5, 41):
        for w, h in ((16, 16), (64, 48), (33, 17)):
            px = im.reference_pixels(i, w, h)
            for fmt in ("raw", "ppm"):
                assert np.array_equal(
                    im.decode_image(im.encode_image(px, fmt), fmt, w, h), px
                )
            dec = im.decode_image(im.encode_image(px, "lossy"), "lossy", w, h)
            assert im.psnr(px, dec) >= 40.0


def test_unknown_format_stub():
    import pytest

    with pytest.raises(NotImplementedError):
        im.decode_image(b"\xff\xd8", "jpeg", 4, 4)


def test_phash_consistent_and_discriminative():
    a = im.average_phash(im.reference_pixels(1, 32, 32))
    b = im.average_phash(im.reference_pixels(1, 32, 32))
    c = im.average_phash(im.reference_pixels(99, 32, 32))
    assert a == b
    assert bin((a ^ c) & ((1 << 64) - 1)).count("1") > 0


def test_spark_roundtrip_gate(spark, fx):
    from lazyosm_spark.sources.fixtures import caption_for_image_id

    out = fx["images"].mapInPandas(
        im.roundtrip_verify_batches(caption_for_image_id), im.ROUNDTRIP_SCHEMA
    )
    rows = out.collect()
    assert len(rows) == fx["images"].count()
    assert all(r["psnr"] >= 40.0 for r in rows)
    assert all(r["caption_ok"] for r in rows)
    # lossless formats decode bit-exact -> psnr inf
    lossless = out.join(
        fx["images"].select("image_id", "fmt"), "image_id"
    ).filter(F.col("fmt") != "lossy")
    assert all(r["psnr"] == float("inf") for r in lossless.collect())


def test_images_phash_column_matches_codec(spark, fx):
    import pandas as pd

    rows = fx["images"].select("image_id", "bytes", "w", "h", "fmt", "phash").collect()
    for r in rows[:30]:
        px = im.decode_image(bytes(r["bytes"]), r["fmt"], r["w"], r["h"])
        i = int(r["image_id"].split("_")[1])
        ref = im.reference_pixels(i, r["w"], r["h"])
        # phash stored is computed on ORIGINAL pixels; decode approximates
        assert r["phash"] == im.average_phash(ref)
