"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched ``mapInPandas``.

The heavyweight decoders (PIL/ffmpeg/librosa) are NOT in this container;
``decode_image`` implements dependency-free PPM(P6) and 24-bpp BMP
parsing so the ``fake=False`` path runs END TO END on real image bytes
(decode -> stats features / nearest-neighbor resize), and raises
NotImplementedError for formats that genuinely need PIL/cv2. The
WAV (RIFF/PCM-16) audio parses dependency-free too (audio_stats_features).
The ``fake=True`` path derives a deterministic digest feature vector from
arbitrary bytes (so the documents fixture exercises the same plumbing —
schema, Arrow batching, partitioning — without valid image payloads).

Scale design: mapInPandas streams Arrow record batches through Python, so
peak executor memory is one batch (spark.sql.execution.arrow.maxRecordsPerBatch),
not one partition; binary payloads never materialize on the driver.
"""

from __future__ import annotations

import hashlib
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("modality", StringType(), False),  # image | audio | video
        StructField("content", BinaryType(), True),
        StructField("mime", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("modality", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("content_crc", LongType(), False),
        StructField("features", ArrayType(DoubleType()), True),
    ]
)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Synthesize a media table from the documents fixture: text bytes act
    as the opaque payload (the container has no real image/audio data)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("modality"),
        F.encode("text", "UTF-8").alias("content"),
        F.lit("application/octet-stream").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
    )


def _parse_ppm_p6(b: bytes) -> tuple[int, int, bytes]:
    """Binary PPM (P6): ASCII header 'P6 <w> <h> <maxval>' with optional
    '#' comments, then w*h*3 raw RGB bytes. Returns (w, h, rgb)."""
    if not b.startswith(b"P6"):
        raise ValueError("not a P6 ppm")
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(b) and b[pos : pos + 1].isspace():
            pos += 1
        if b[pos : pos + 1] == b"#":
            while pos < len(b) and b[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(b) and not b[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(b[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval > 255:
        raise ValueError("16-bit ppm unsupported")
    rgb = b[pos : pos + w * h * 3]
    if len(rgb) != w * h * 3:
        raise ValueError("truncated ppm payload")
    return w, h, rgb


def _parse_bmp24(b: bytes) -> tuple[int, int, bytes]:
    """Uncompressed 24-bpp BMP (BITMAPINFOHEADER): bottom-up BGR rows
    padded to 4 bytes. Returns (w, h, rgb) in top-down RGB order."""
    if not b.startswith(b"BM"):
        raise ValueError("not a bmp")
    data_off = int.from_bytes(b[10:14], "little")
    header_size = int.from_bytes(b[14:18], "little")
    if header_size < 40:
        raise ValueError("bmp core header unsupported")
    w = int.from_bytes(b[18:22], "little", signed=True)
    h = int.from_bytes(b[22:26], "little", signed=True)
    bpp = int.from_bytes(b[28:30], "little")
    compression = int.from_bytes(b[30:34], "little")
    if bpp != 24 or compression != 0:
        raise ValueError(f"only uncompressed 24-bpp bmp supported (bpp={bpp})")
    top_down = h < 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    # validate BEFORE allocating: the header's w x h must actually be
    # backed by payload bytes, or a 62-byte blob declaring 2^30 x 1024
    # demands a multi-GB bytearray on the executor (round-8 probe;
    # MemoryError reproduced). The last row may legally omit its final
    # padding bytes, so require rows 0..h-2 at full stride + w*3.
    if w < 0 or (h and data_off + max(0, h - 1) * stride + w * 3 > len(b)):
        raise ValueError("truncated bmp payload")
    out = bytearray(w * h * 3)
    for row in range(h):
        src_row = row if top_down else h - 1 - row
        base = data_off + src_row * stride
        for col in range(w):
            bgr = b[base + col * 3 : base + col * 3 + 3]
            if len(bgr) != 3:
                raise ValueError("truncated bmp payload")
            dst = (row * w + col) * 3
            out[dst], out[dst + 1], out[dst + 2] = bgr[2], bgr[1], bgr[0]
    return w, h, bytes(out)


def decode_image(content: bytes) -> tuple[int, int, bytes]:
    """Dependency-free decoder for the two formats parseable without
    PIL/cv2 (neither is in this container): binary PPM (P6) and
    uncompressed 24-bpp BMP. Returns (width, height, top-down RGB bytes).
    Other magics raise NotImplementedError — swap in PIL here when the
    library exists."""
    if content.startswith(b"P6"):
        return _parse_ppm_p6(content)
    if content.startswith(b"BM"):
        return _parse_bmp24(content)
    raise NotImplementedError(
        "only PPM(P6)/BMP(24bpp) decode in-container; other formats need PIL/cv2"
    )


def media_stats_features(content: bytes) -> list[float]:
    """Magic-dispatched real feature extraction: PPM/BMP -> image stats,
    RIFF/WAVE -> audio stats. The fake=False path of extract_features."""
    if content.startswith(b"P6") or content.startswith(b"BM"):
        return image_stats_features(content)
    if content[:4] == b"RIFF":
        return audio_stats_features(content)
    raise NotImplementedError("undecodable media magic; PPM/BMP/WAV supported in-container")


def encode_ppm_p6(width: int, height: int, rgb: bytes) -> bytes:
    """Inverse of _parse_ppm_p6 — used by the non-fake resize path."""
    return b"P6\n%d %d\n255\n" % (width, height) + rgb


def _parse_wav_pcm16(b: bytes) -> tuple[int, int, list[int]]:
    """Dependency-free WAV decoder: RIFF/WAVE container, 'fmt ' chunk with
    PCM (format 1) 16-bit samples, 'data' chunk. Returns (sample_rate,
    n_channels, interleaved int16 samples)."""
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, rate, channels, bits = 12, None, None, None
    data = None
    while pos + 8 <= len(b):
        cid = b[pos : pos + 4]
        size = int.from_bytes(b[pos + 4 : pos + 8], "little")
        body = b[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = int.from_bytes(body[0:2], "little")
            if fmt != 1:
                raise ValueError(f"only PCM wav supported (fmt={fmt})")
            channels = int.from_bytes(body[2:4], "little")
            rate = int.from_bytes(body[4:8], "little")
            bits = int.from_bytes(body[14:16], "little")
            if bits != 16:
                raise ValueError(f"only 16-bit PCM supported (bits={bits})")
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("wav missing fmt/data chunk")
    n = len(data) // 2
    samples = [
        int.from_bytes(data[2 * i : 2 * i + 2], "little", signed=True) for i in range(n)
    ]
    return rate, channels, samples


def encode_wav_pcm16(rate: int, channels: int, samples: list[int]) -> bytes:
    """Inverse of _parse_wav_pcm16 — fixture generator for tests."""
    data = b"".join(
        int(s).to_bytes(2, "little", signed=True) for s in samples
    )
    byte_rate = rate * channels * 2
    fmt = (
        (1).to_bytes(2, "little") + channels.to_bytes(2, "little")
        + rate.to_bytes(4, "little") + byte_rate.to_bytes(4, "little")
        + (channels * 2).to_bytes(2, "little") + (16).to_bytes(2, "little")
    )
    body = b"WAVE" + b"fmt " + len(fmt).to_bytes(4, "little") + fmt
    body += b"data" + len(data).to_bytes(4, "little") + data
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def audio_stats_features(content: bytes) -> list[float]:
    """Real 8-dim feature vector from decoded PCM audio: duration,
    rate, channels, RMS, zero-crossing rate, min/mean/max amplitude —
    deterministic, library-free (the audio analogue of
    image_stats_features)."""
    import math

    rate, channels, samples = _parse_wav_pcm16(content)
    n = max(1, len(samples))
    frames = len(samples) // max(1, channels)
    sq = 0.0
    zc = 0
    smin, smax, ssum = 32767.0, -32768.0, 0.0
    prev_sign = None
    for s in samples:
        sq += float(s) * float(s)
        sign = s >= 0
        if prev_sign is not None and sign != prev_sign:
            zc += 1
        prev_sign = sign
        smin, smax, ssum = min(smin, float(s)), max(smax, float(s)), ssum + s
    return [
        frames / float(rate), float(rate), float(channels),
        math.sqrt(sq / n), zc / float(n), smin, ssum / n, smax,
    ]


def image_stats_features(content: bytes) -> list[float]:
    """Real 8-dim feature vector from a decoded image: dimensions plus
    per-channel means and gray min/mean/max — deterministic, library-free."""
    w, h, rgb = decode_image(content)
    n = w * h
    sums = [0, 0, 0]
    gmin, gmax, gsum = 255.0, 0.0, 0.0
    for i in range(n):
        r, g, b = rgb[3 * i], rgb[3 * i + 1], rgb[3 * i + 2]
        sums[0] += r
        sums[1] += g
        sums[2] += b
        gray = (r + g + b) / 3.0
        gmin, gmax, gsum = min(gmin, gray), max(gmax, gray), gsum + gray
    return [
        float(w), float(h),
        sums[0] / n, sums[1] / n, sums[2] / n,
        gmin, gsum / n, gmax,
    ]


def _fake_features(content: bytes, dim: int = 8) -> list[float]:
    """Deterministic fake embedding: sha256 bytes -> dim doubles in [0,1)."""
    digest = hashlib.sha256(content).digest()
    return [int.from_bytes(digest[4 * i : 4 * i + 4], "big") / 2**32 for i in range(dim)]


def extract_features(media: DataFrame, fake: bool = True, dim: int = 8) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    With ``fake=True`` features are a deterministic digest of the bytes
    (exercises the plumbing on payloads that aren't real images); with
    ``fake=False`` the payload is DECODED (PPM/BMP in-container, see
    decode_image) and features are real image statistics — identical
    Spark plumbing either way.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            content = pdf["content"]
            feats = []
            for raw in content:
                raw = bytes(raw) if raw is not None else b""
                feats.append(media_stats_features(raw) if not fake else _fake_features(raw, dim))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "n_bytes": content.map(lambda b: len(b) if b is not None else 0).astype("int64"),
                    "content_crc": content.map(lambda b: zlib.crc32(bytes(b)) if b is not None else 0).astype("int64"),
                    "features": feats,
                }
            )

    return media.mapInPandas(batches, FEATURE_SCHEMA)


def resize_media(
    media: DataFrame, width: int, height: int, fake: bool = True
) -> DataFrame:
    """Arrow-batched image resize over binary payloads.

    Same mapInPandas shape as feature extraction: with ``fake=True`` the
    "resized" payload is a deterministic truncation/pad of the original
    bytes to width*height (so schema, batching, and size accounting are
    exercised on non-image payloads); with ``fake=False`` the payload is
    decoded (PPM/BMP in-container) and nearest-neighbor-resampled to
    (width, height), re-encoded as PPM P6. Output keeps MEDIA_SCHEMA
    with width/height stamped, so resize composes with
    extract_features / frame_sample_plan.
    """
    target = width * height

    def _nn_resize(raw: bytes) -> bytes:
        sw, sh, rgb = decode_image(raw)
        out = bytearray(width * height * 3)
        for y in range(height):
            sy = min(sh - 1, y * sh // height)
            for x in range(width):
                sx = min(sw - 1, x * sw // width)
                s, d = (sy * sw + sx) * 3, (y * width + x) * 3
                out[d : d + 3] = rgb[s : s + 3]
        return encode_ppm_p6(width, height, bytes(out))

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out_content = []
            for raw in pdf["content"]:
                raw = bytes(raw) if raw is not None else b""
                if fake:
                    out_content.append(raw[:target].ljust(target, b"\0"))
                else:
                    out_content.append(_nn_resize(raw))
            out = pdf.copy()
            out["content"] = out_content
            out["width"] = width
            out["height"] = height
            if not fake:
                out["mime"] = "image/x-portable-pixmap"
            yield out

    return media.mapInPandas(batches, MEDIA_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan* (timestamps to decode): pure-SQL
    sequence expansion; the decode itself is the stubbed kernel above."""
    return (
        media.filter(F.col("modality") == "video")
        .withColumn("duration_ms", F.coalesce(F.col("duration_ms"), F.octet_length("content").cast("long")))
        .select(
            "media_id",
            F.explode(F.sequence(F.lit(0).cast("long"), F.col("duration_ms"), F.lit(every_ms).cast("long"))).alias(
                "frame_ts_ms"
            ),
        )
    )
