"""Image payload codec + Spark-side multimodal plumbing.

The input table (BASELINE.json input_hint) carries images as opaque
``binary`` with typed metadata (w, h, fmt).  No image libraries exist in
this sandbox, so the codec is pure numpy+zlib — three formats:

- ``raw``   : row-major uint8 RGB, h*w*3 bytes (lossless)
- ``ppm``   : P6 header + raw (lossless, a real interchange format)
- ``lossy`` : 8x8 blockwise orthonormal DCT per channel, uniformly
              quantized int16 coefficients, zlib-compressed.  Quant step
              is chosen so decode meets the PSNR >= 40 dB gate.

In production the decode UDFs swap to Pillow/libjpeg behind the same
``decode_images`` mapInPandas signature — the Spark-side plumbing
(schema, batching, partitioning) is identical and is what's tested.

phash is a 64-bit average-hash over the decoded pixels (8x8 block-mean
grayscale, thresholded at the mean) — the Hamming-kNN key
(reference analog: byte-vector Hamming in shortest_path.go:60-96).
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

LOSSY_MAGIC = b"LSY1"
_QSTEP = 2.0  # uniform quant step; keeps PSNR comfortably >= 40 dB


def _dct_matrix(n: int = 8) -> np.ndarray:
    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    m = np.sqrt(2.0 / n) * np.cos(np.pi * (2 * i + 1) * k / (2.0 * n))
    m[0, :] = np.sqrt(1.0 / n)
    return m


_D = _dct_matrix(8)


def _blockify(chan: np.ndarray) -> tuple[np.ndarray, int, int]:
    """(H,W) -> (nby, nbx, 8, 8) with edge replication padding."""
    h, w = chan.shape
    ph, pw = (-h) % 8, (-w) % 8
    c = np.pad(chan, ((0, ph), (0, pw)), mode="edge")
    hh, ww = c.shape
    blocks = c.reshape(hh // 8, 8, ww // 8, 8).transpose(0, 2, 1, 3)
    return blocks, h, w


def _unblockify(blocks: np.ndarray, h: int, w: int) -> np.ndarray:
    nby, nbx = blocks.shape[:2]
    c = blocks.transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8)
    return c[:h, :w]


def encode_image(pixels: np.ndarray, fmt: str) -> bytes:
    """(h, w, 3) uint8 -> bytes per fmt."""
    h, w = pixels.shape[:2]
    if fmt == "raw":
        return pixels.tobytes()
    if fmt == "ppm":
        return b"P6\n%d %d\n255\n" % (w, h) + pixels.tobytes()
    if fmt == "lossy":
        chans = []
        for c in range(3):
            blocks, _, _ = _blockify(pixels[:, :, c].astype(np.float64) - 128.0)
            coeffs = np.einsum("ij,bcjk,lk->bcil", _D, blocks, _D)
            chans.append(np.round(coeffs / _QSTEP).astype(np.int16))
        payload = np.stack(chans).tobytes()
        return LOSSY_MAGIC + w.to_bytes(4, "big") + h.to_bytes(4, "big") + zlib.compress(payload, 6)
    raise ValueError(f"unknown fmt {fmt!r}")


def decode_image(buf: bytes, fmt: str, w: int, h: int) -> np.ndarray:
    """bytes -> (h, w, 3) uint8."""
    if fmt == "raw":
        return np.frombuffer(buf, dtype=np.uint8).reshape(h, w, 3)
    if fmt == "ppm":
        # parse the 3-field P6 header (magic, dims, maxval)
        nl = 0
        pos = 0
        for _ in range(3):
            pos = buf.index(b"\n", pos) + 1
            nl += 1
        return np.frombuffer(buf[pos:], dtype=np.uint8).reshape(h, w, 3)
    if fmt == "lossy":
        if buf[:4] != LOSSY_MAGIC:  # untrusted input: no assert
            raise ValueError("bad lossy magic")
        ww = int.from_bytes(buf[4:8], "big")
        hh = int.from_bytes(buf[8:12], "big")
        raw = zlib.decompress(buf[12:])
        nbx, nby = (ww + 7) // 8, (hh + 7) // 8
        coeffs = np.frombuffer(raw, dtype=np.int16).reshape(3, nby, nbx, 8, 8)
        out = np.empty((hh, ww, 3), dtype=np.uint8)
        d32 = _D.astype(np.float32)
        for c in range(3):
            # float32 inverse transform: halves memory traffic; the
            # quantization error (QSTEP/2 per coeff) dwarfs fp32 eps,
            # so decoded uint8 pixels are unchanged in practice.
            # batched matmul, NOT 3-operand einsum: un-optimized einsum
            # falls back to a naive C loop (measured 22x slower than
            # BLAS-batched matmul on the same blocks); every consumer
            # of decoded pixels is tolerance-gated (PSNR >= 40, phash
            # Hamming <= 4), so the op-order fp32 difference is inert
            deq = coeffs[c].astype(np.float32) * np.float32(_QSTEP)
            blocks = np.matmul(np.matmul(d32.T, deq), d32)
            chan = _unblockify(blocks, hh, ww) + np.float32(128.0)
            out[:, :, c] = np.clip(np.round(chan), 0, 255).astype(np.uint8)
        return out
    raise NotImplementedError(
        f"fmt {fmt!r}: real codecs (jpeg/png/webp) are stubbed in this "
        "sandbox — production swaps in Pillow here, same UDF signature"
    )


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(255.0**2 / mse))


def _grayscale(pixels: np.ndarray) -> np.ndarray:
    # elementwise (no BLAS — avoids per-worker thread pools under Spark)
    p = pixels.astype(np.float64)
    return p[..., 0] * 0.299 + p[..., 1] * 0.587 + p[..., 2] * 0.114


def average_phash(pixels: np.ndarray) -> int:
    """64-bit average hash: grayscale -> 8x8 block means -> >= mean bits.
    Returned as signed int64 (column type per input_hint).  Fast path
    for 8-divisible dims (one reshape-mean); boundary-split fallback
    otherwise — both produce identical blocks when dims divide by 8."""
    gray = _grayscale(pixels)
    h, w = gray.shape
    if h % 8 == 0 and w % 8 == 0:
        means = gray.reshape(8, h // 8, 8, w // 8).mean(axis=(1, 3))
    else:
        ys = (np.arange(9) * h) // 8
        xs = (np.arange(9) * w) // 8
        means = np.empty((8, 8))
        for r in range(8):
            for c in range(8):
                means[r, c] = gray[
                    ys[r] : max(ys[r + 1], ys[r] + 1), xs[c] : max(xs[c + 1], xs[c] + 1)
                ].mean()
    bits = (means >= means.mean()).flatten()
    return int.from_bytes(np.packbits(bits).tobytes(), "big", signed=True)


# ---------------------------------------------------------------------------
# Spark plumbing: mapInPandas decode / roundtrip-verify over image batches.
# Schema in:  image_id string, bytes binary, w int, h int, fmt string, ...
# ---------------------------------------------------------------------------

ROUNDTRIP_SCHEMA = "image_id string, psnr double, caption_ok boolean"


def roundtrip_verify_batches(caption_regen) -> "callable":
    """Build a mapInPandas function verifying decode fidelity + caption
    byte-equality (the input_hint per-row invariant).  ``caption_regen``
    is a function(image_id: str) -> expected caption string."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                dec = decode_image(row.bytes, row.fmt, row.w, row.h)
                ref = reference_pixels(int(row.image_id.split("_")[1]), row.w, row.h)
                out.append(
                    (
                        row.image_id,
                        psnr(ref, dec),
                        row.caption == caption_regen(row.image_id),
                    )
                )
            yield pd.DataFrame(out, columns=["image_id", "psnr", "caption_ok"])

    return fn


def reference_pixels(i: int, w: int, h: int) -> np.ndarray:
    """Deterministic procedural image i (FIXTURES.md §1): gradient +
    per-image sinusoid.  Shared by the generator and the verifier."""
    y, x = np.mgrid[0:h, 0:w].astype(np.float64)
    base = (x / max(w - 1, 1) + y / max(h - 1, 1)) * 127.5
    fx = 1.0 + (i % 7)
    fy = 1.0 + (i % 5)
    phase = (i * 0.61803398875) % 1.0 * 2 * np.pi
    wave = 40.0 * np.sin(2 * np.pi * fx * x / w + phase) * np.cos(
        2 * np.pi * fy * y / h
    )
    img = np.empty((h, w, 3), dtype=np.uint8)
    for c in range(3):
        img[:, :, c] = np.clip(base + wave * (0.5 + 0.25 * c), 0, 255).astype(np.uint8)
    return img


# ---------------------------------------------------------------------------
# Distributed image synthesis + decode stages (cluster-scale fixtures:
# the driver-side generator in sources/fixtures.py is for small suites;
# this one makes N images as a Spark job so the bench can build
# multi-GB inputs in parallel).
# ---------------------------------------------------------------------------

IMAGE_SCHEMA = (
    "image_id string, bytes binary, w int, h int, fmt string, "
    "caption string, phash long"
)

DECODE_SCHEMA = "image_id string, phash long, phash_ok boolean, mean_lum double"


def gen_images_batches_fn(size_mult: int = 1):
    """mapInPandas generator factory: (id long) -> full image rows via
    ``spark.range(n).mapInPandas(gen_images_batches_fn(m), IMAGE_SCHEMA)``.
    ``size_mult`` scales pixel dimensions (bench knob: larger images ->
    more codec work per row)."""
    fmts = ["raw", "ppm", "lossy"]
    wl = [16 * size_mult, 32 * size_mult, 64 * size_mult]
    hl = [16 * size_mult, 32 * size_mult, 48 * size_mult]

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # deferred import: fixtures imports this module (circular at
        # module-load time, safe at executor call time)
        from lazyosm_spark.sources.fixtures import image_lonlat, make_caption

        for pdf in batches:
            rows = []
            ids = pdf.iloc[:, 0].to_numpy()
            lon, lat = image_lonlat(ids)
            for j, i in enumerate(ids):
                i = int(i)
                w, h = wl[i % 3], hl[i % 3]
                px = reference_pixels(i, w, h)
                rows.append(
                    (
                        f"img_{i:012d}",
                        encode_image(px, fmts[i % 3]),
                        w,
                        h,
                        fmts[i % 3],
                        make_caption(i, float(lon[j]), float(lat[j])),
                        average_phash(px),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["image_id", "bytes", "w", "h", "fmt", "caption", "phash"],
            )

    return fn


gen_images_batches = gen_images_batches_fn(1)


def decode_images_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas decode stage: decode the payload (inverse DCT for
    lossy), recompute phash from the decoded pixels and compare to the
    stored column (the per-row integrity gate that needs no source
    image), extract a cheap feature (mean luminance).  This is the
    CPU-heavy leg of the image pipeline — the part a real multimodal
    pipeline spends its time in.  PSNR-vs-source verification lives in
    roundtrip_verify_batches (test path; the source isn't available in
    production decode)."""
    for pdf in batches:
        rows = []
        for r in pdf.itertuples(index=False):
            px = decode_image(r.bytes, r.fmt, r.w, r.h)
            ph = average_phash(px)
            # lossy decode may flip borderline phash bits; the stored
            # hash was computed pre-encode — allow a small Hamming slack
            ok = bin((ph ^ r.phash) & ((1 << 64) - 1)).count("1") <= 4
            rows.append((r.image_id, ph, ok, float(_grayscale(px).mean())))
        yield pd.DataFrame(rows, columns=["image_id", "phash", "phash_ok", "mean_lum"])


# ---------------------------------------------------------------------------
# Multimodal operator plumbing (brief: image/audio/video as opaque binary
# + typed metadata).  Image resize is REAL (numpy); audio/video decode
# are STUBBED behind NotImplementedError with deterministic fakes — the
# Spark-side plumbing (schema, batching, UDF signature) is real and
# tested, the codec swap-in point is marked.
# ---------------------------------------------------------------------------

RESIZE_SCHEMA = "image_id string, bytes binary, w int, h int, fmt string"


def resize_images_batches_fn(target_w: int, target_h: int):
    """mapInPandas: decode -> bilinear resample to (target_w, target_h)
    -> re-encode raw.  Pure numpy (index-map gather, 4-tap blend)."""

    def resize(px: np.ndarray, tw: int, th: int) -> np.ndarray:
        h, w = px.shape[:2]
        # bilinear via index maps (vectorized gather)
        ys = np.clip((np.arange(th) + 0.5) * h / th - 0.5, 0, h - 1)
        xs = np.clip((np.arange(tw) + 0.5) * w / tw - 0.5, 0, w - 1)
        y0 = np.floor(ys).astype(int); y1 = np.minimum(y0 + 1, h - 1)
        x0 = np.floor(xs).astype(int); x1 = np.minimum(x0 + 1, w - 1)
        fy = (ys - y0)[:, None, None]
        fx = (xs - x0)[None, :, None]
        p = px.astype(np.float64)
        out = (
            p[y0][:, x0] * (1 - fy) * (1 - fx)
            + p[y0][:, x1] * (1 - fy) * fx
            + p[y1][:, x0] * fy * (1 - fx)
            + p[y1][:, x1] * fy * fx
        )
        return np.clip(np.round(out), 0, 255).astype(np.uint8)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                px = decode_image(r.bytes, r.fmt, r.w, r.h)
                small = resize(px, target_w, target_h)
                rows.append((r.image_id, small.tobytes(), target_w, target_h, "raw"))
            yield pd.DataFrame(rows, columns=["image_id", "bytes", "w", "h", "fmt"])

    return fn


# ---------------------------------------------------------------------------
# Audio: REAL codecs (public formats, pure numpy/stdlib-bytes) — WAV
# (RIFF PCM16 container) and G.711 mu-law (companding compression).
# Tests oracle them against the INDEPENDENT stdlib wave/audioop
# implementations.  Genuinely out-of-sandbox codecs (mp3/opus/aac)
# remain marked swap-ins.
# ---------------------------------------------------------------------------


def encode_wav_pcm16(samples: np.ndarray, sample_rate: int) -> bytes:
    """int16 mono samples -> a standard RIFF/WAVE file (PCM fmt 1)."""
    import struct

    data = samples.astype("<i2").tobytes()
    fmt = struct.pack(
        "<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav_pcm16(buf: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE chunk walk -> (int16 samples, sample_rate).  Accepts
    mono PCM16; rejects other encodings explicitly."""
    import struct

    # untrusted input: explicit raises (assert is stripped under -O)
    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a WAV file (bad RIFF/WAVE magic)")
    pos, sr, data = 12, None, None
    while pos + 8 <= len(buf):
        cid, ln = buf[pos : pos + 4], struct.unpack("<I", buf[pos + 4 : pos + 8])[0]
        body = buf[pos + 8 : pos + 8 + ln]
        if cid == b"fmt ":
            audio_fmt, n_ch, sr, _br, _ba, bits = struct.unpack("<HHIIHH", body[:16])
            if audio_fmt != 1 or n_ch != 1 or bits != 16:
                raise NotImplementedError(
                    f"WAV fmt={audio_fmt} ch={n_ch} bits={bits}: only mono PCM16"
                )
        elif cid == b"data":
            data = body
        pos += 8 + ln + (ln & 1)  # chunks are word-aligned
    if sr is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    return np.frombuffer(data, dtype="<i2"), sr


def mulaw_decode(u8: np.ndarray) -> np.ndarray:
    """ITU-T G.711 mu-law expansion, vectorized -> int16 (matches the
    stdlib audioop.ulaw2lin(buf, 2) table bit-for-bit; pytest pins it)."""
    u = (~u8.astype(np.uint8)) & np.uint8(0xFF)
    sign = (u & 0x80) != 0
    exp = ((u >> 4) & 0x07).astype(np.int32)
    mant = (u & 0x0F).astype(np.int32)
    mag = (((mant << 3) + 0x84) << exp) - 0x84
    out = np.where(sign, -mag, mag)
    return out.astype(np.int16)


def mulaw_encode(samples: np.ndarray) -> np.ndarray:
    """G.711 mu-law compression of int16 -> uint8 (test generator; the
    pipeline decodes)."""
    x = samples.astype(np.int32)
    sign = np.where(x < 0, 0x80, 0).astype(np.int32)
    mag = np.minimum(np.abs(x), 32635) + 0x84
    exp = (np.floor(np.log2(mag)) - 7).astype(np.int32)
    mant = (mag >> (exp + 3)) & 0x0F
    return (~(sign | (exp << 4) | mant) & 0xFF).astype(np.uint8)


def decode_audio(buf: bytes, codec: str, sample_rate: int) -> tuple[np.ndarray, int]:
    """bytes -> (float64 samples in [-1, 1), sample_rate).  'pcm16' and
    'mulaw' use the row's sample_rate; 'wav' reads its own header."""
    if codec == "pcm16":
        x = np.frombuffer(buf, dtype="<i2")
    elif codec == "wav":
        x, sample_rate = decode_wav_pcm16(buf)
    elif codec == "mulaw":
        x = mulaw_decode(np.frombuffer(buf, dtype=np.uint8))
    else:
        # >>> codec swap-in point (mp3/opus need out-of-sandbox libs) <<<
        raise NotImplementedError(f"audio codec {codec!r}: stubbed")
    return x.astype(np.float64) / 32768.0, int(sample_rate)


AUDIO_FEATURES_SCHEMA = (
    "clip_id string, n_samples long, rms double, zero_crossings long, "
    "duration_s double, dominant_freq_hz double"
)


def audio_features_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Audio decode + feature extraction.  Input: (clip_id string,
    bytes binary, codec string, sample_rate int).  REAL codecs: pcm16,
    wav (RIFF PCM16), mulaw (G.711); mp3/opus raise at the marked
    swap-in.  Features: RMS, zero crossings, duration, dominant
    frequency (peak of the rFFT magnitude above DC)."""
    for pdf in batches:
        rows = []
        for r in pdf.itertuples(index=False):
            x, sr = decode_audio(r.bytes, r.codec, r.sample_rate)
            if len(x):
                spec = np.abs(np.fft.rfft(x))
                dom = (
                    float((np.argmax(spec[1:]) + 1) * sr / len(x))
                    if len(spec) > 1
                    else 0.0
                )
            else:
                dom = 0.0
            rows.append(
                (
                    r.clip_id,
                    len(x),
                    float(np.sqrt(np.mean(x**2))) if len(x) else 0.0,
                    int(np.count_nonzero(np.diff(np.signbit(x)))),
                    len(x) / sr if sr else 0.0,
                    dom,
                )
            )
        yield pd.DataFrame(
            rows,
            columns=[
                "clip_id",
                "n_samples",
                "rms",
                "zero_crossings",
                "duration_s",
                "dominant_freq_hz",
            ],
        )


FRAME_SAMPLE_SCHEMA = "video_id string, frame_idx int, frame binary, w int, h int"

LVID_MAGIC = b"LVID"


def encode_video_lvid(frames: list[np.ndarray]) -> bytes:
    """REAL compressed video container: magic + (w, h, n_frames) +
    length-prefixed lossy-DCT frames (the image codec, per frame).  A
    deliberately simple intra-only format — every frame independently
    decodable, so frame sampling can SKIP undecoded frames by walking
    the length prefixes (the property real samplers rely on keyframes
    for)."""
    import struct

    h, w = frames[0].shape[:2]
    out = [LVID_MAGIC, struct.pack("<III", w, h, len(frames))]
    for f in frames:
        payload = encode_image(f, "lossy")
        out.append(struct.pack("<I", len(payload)))
        out.append(payload)
    return b"".join(out)


def sample_video_frames_batches_fn(every_n: int = 10):
    """Video frame sampling.  Input: (video_id string, bytes binary,
    codec string, n_frames int, w int, h int).  REAL codecs: 'rawv'
    (concatenated raw RGB planes, sliced) and 'lvid' (length-prefixed
    lossy-DCT frames — sampled frames are DECODED, skipped frames are
    never touched: the walk reads only the 4-byte prefixes).
    Out-of-sandbox codecs (h264 etc.) raise at the marked swap-in
    (production: pyav/ffmpeg, same UDF signature)."""
    import struct

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                if r.codec == "rawv":
                    fsize = r.w * r.h * 3
                    for idx in range(0, r.n_frames, every_n):
                        frame = r.bytes[idx * fsize : (idx + 1) * fsize]
                        rows.append((r.video_id, idx, frame, r.w, r.h))
                    continue
                if r.codec == "lvid":
                    buf = r.bytes
                    if buf[:4] != LVID_MAGIC:  # untrusted input: no assert
                        raise ValueError("bad lvid magic")
                    w, h, n_frames = struct.unpack("<III", buf[4:16])
                    pos = 16
                    for idx in range(n_frames):
                        (ln,) = struct.unpack("<I", buf[pos : pos + 4])
                        if idx % every_n == 0:
                            px = decode_image(buf[pos + 4 : pos + 4 + ln], "lossy", w, h)
                            rows.append((r.video_id, idx, px.tobytes(), w, h))
                        pos += 4 + ln
                    continue
                # >>> codec swap-in point (h264 etc. need out-of-sandbox libs) <<<
                raise NotImplementedError(f"video codec {r.codec!r}: stubbed")
            yield pd.DataFrame(
                rows, columns=["video_id", "frame_idx", "frame", "w", "h"]
            )

    return fn
