"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Design for 100 TB: media bytes live in a `binary` column (or a reference
to object storage) beside a typed metadata struct; all per-item compute
(decode, resize, feature extraction, frame sampling) runs as Arrow-
batched `mapInPandas` so bytes cross the JVM/Python boundary once per
batch, not per row.  Partitioning is by content hash so hot items spread.

Codecs: the COMMON formats decode for real everywhere with zero
dependencies — 8-bit PNG via the pure-stdlib zlib/struct codec
(operators/_png.py, full filter set), baseline JPEG via the pure-Python
Huffman+IDCT codec (operators/_jpeg.py — which makes MJPEG video
features real-pixel-derived too), and PCM WAV via the stdlib
`wave`/`struct` modules.  PIL / soundfile are OPTIONAL imports that
extend coverage further (progressive JPEG, WebP, compressed audio)
when the cluster image ships them; with neither library nor a
stdlib-decodable payload, the seams fall back to clearly-marked
deterministic fakes.  Either way the Spark-side plumbing — schemas,
batch iteration, UDF signatures, partitioning — is identical, real,
and tested.
"""

from __future__ import annotations

import hashlib
import io
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # real image codec when the cluster image ships it
    from PIL import Image as _PILImage

    HAVE_PIL = True
except ImportError:
    _PILImage = None
    HAVE_PIL = False

try:  # real audio codec when the cluster image ships it
    import soundfile as _soundfile

    HAVE_SOUNDFILE = True
except ImportError:
    _soundfile = None
    HAVE_SOUNDFILE = False

# media row: bytes + typed metadata (the reference's JSONB-metadata idea,
# schema.py:252, applied to media)
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("content", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("content_sha256", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), False),
    ]
)

FRAME_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_sha256", T.StringType(), False),
    ]
)


def _to_rgb(arr: np.ndarray) -> np.ndarray:
    """Normalize a decoded (h, w, ch) array to RGB, PIL-convert style."""
    ch = arr.shape[2]
    if ch == 3:
        return arr
    if ch == 4:  # RGBA: drop alpha (PIL convert("RGB") composites over
        return arr[:, :, :3]  # black for straight alpha drop — match that)
    if ch == 1:
        return np.repeat(arr, 3, axis=2)
    # gray + alpha
    return np.repeat(arr[:, :, :1], 3, axis=2)


def _decode_image(content: bytes) -> np.ndarray:
    """DECODE SEAM: 8-bit PNG (operators/_png.py — zlib/struct) and
    baseline/extended-sequential JPEG (operators/_jpeg.py — Huffman +
    IDCT, incl. 4:2:0/4:2:2 and restart intervals) decode for REAL
    everywhere with zero dependencies — this covers MJPEG video frames
    too, so video features are real-pixel-derived in this container.
    PIL extends coverage (progressive JPEG, WebP, ...) when available;
    else the deterministic fake (shape and dtype match a real decode)."""
    from vcf_pg_loader_spark.operators import _jpeg, _png

    if _png.is_png(content):
        try:
            return _to_rgb(_png.decode_png(content))
        except ValueError:
            pass  # exotic PNG shape: fall through to PIL / the fake
    if _jpeg.is_jpeg(content):
        try:
            return _to_rgb(_jpeg.decode_jpeg(content))
        except ValueError:
            pass  # progressive/arithmetic: fall through to PIL / the fake
    if HAVE_PIL:
        with _PILImage.open(io.BytesIO(content)) as img:
            return np.asarray(img.convert("RGB"))
    h = hashlib.sha256(content).digest()
    side = 8
    rng = np.frombuffer((h * ((side * side * 3) // len(h) + 1))[: side * side * 3],
                        dtype=np.uint8)
    return rng.reshape(side, side, 3)


def _split_mjpeg_frames(content: bytes) -> list[bytes]:
    """REAL container-level frame extraction for Motion-JPEG streams
    (concatenated SOI..EOI JPEG frames — the common raw-camera / AVI
    payload): scan the FFD8/FFD9 markers, return the frame byte ranges.
    Frame SAMPLING needs only the container walk, not a pixel decode —
    so this path, like PNG and WAV, is real with zero dependencies."""
    frames: list[bytes] = []
    pos = 0
    while True:
        start = content.find(b"\xff\xd8", pos)
        if start < 0:
            break
        end = content.find(b"\xff\xd9", start + 2)
        if end < 0:
            break
        frames.append(content[start : end + 2])
        pos = end + 2
    return frames


def _decode_video_frames(content: bytes, n_frames: int) -> list[bytes]:
    """DECODE SEAM: MJPEG streams split into REAL frames (evenly
    sampled down to n_frames); other containers (mp4/mkv need a real
    demuxer) fall back to the deterministic fake."""
    if content[:2] == b"\xff\xd8":
        frames = _split_mjpeg_frames(content)
        if frames:
            if len(frames) <= n_frames:
                return frames
            if n_frames == 1:
                return [frames[0]]
            # even temporal sampling: first, spaced interior, last
            idxs = [
                round(i * (len(frames) - 1) / (n_frames - 1))
                for i in range(n_frames)
            ]
            return [frames[i] for i in idxs]
    return [
        hashlib.sha256(content + idx.to_bytes(4, "little")).digest()
        for idx in range(n_frames)
    ]


def _pool_feature(arr: np.ndarray, dim: int) -> list[float]:
    """Fixed-dim mean pooling + L2 normalization of a decoded array —
    the shared feature kernel for images and video frames (a stand-in
    for any CNN/CLIP embedding with the same shape and normalization)."""
    flat = arr.astype(np.float32).reshape(-1)
    chunks = np.array_split(flat, dim)
    feat = np.array([c.mean() for c in chunks], dtype=np.float32)
    norm = float(np.linalg.norm(feat))
    if norm > 0:
        feat = feat / norm
    return feat.tolist()


def image_features(df: DataFrame, dim: int = 16) -> DataFrame:
    """Per-image feature vector via mapInPandas (Arrow batches).

    Feature = channel-mean pyramid of the decoded array, L2-normalized —
    a stand-in for any CNN/CLIP embedding; the batch shape, schema, and
    normalization are exactly what the real extractor would use.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": [],
                "content_sha256": [],
                "n_bytes": [],
                "feature": [],
            }
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                if content is None:
                    continue
                arr = _decode_image(bytes(content))
                out["media_id"].append(media_id)
                out["content_sha256"].append(
                    hashlib.sha256(bytes(content)).hexdigest()
                )
                out["n_bytes"].append(len(content))
                out["feature"].append(_pool_feature(arr, dim))
            yield pd.DataFrame(out)

    return df.select("media_id", "content").mapInPandas(
        extract, IMAGE_FEATURES_SCHEMA
    )


FRAME_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_sha256", T.StringType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), False),
    ]
)


def frame_features(df: DataFrame, n_frames: int = 3, dim: int = 16) -> DataFrame:
    """Per-(video, frame) feature vectors: REAL MJPEG frame extraction
    (container marker walk) feeding the REAL baseline-JPEG pixel decode
    (operators/_jpeg.py) and the shared pooling kernel — end-to-end
    video featurization with zero dependencies.  Long format mirrors
    sample_frames with the feature column added; non-MJPEG containers
    fall through to the deterministic fake seam like every codec path."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": [],
                "frame_idx": [],
                "frame_sha256": [],
                "feature": [],
            }
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                if content is None:
                    continue
                for idx, frame in enumerate(
                    _decode_video_frames(bytes(content), n_frames)
                ):
                    arr = _decode_image(frame)
                    out["media_id"].append(media_id)
                    out["frame_idx"].append(idx)
                    out["frame_sha256"].append(
                        hashlib.sha256(frame).hexdigest()
                    )
                    out["feature"].append(_pool_feature(arr, dim))
            yield pd.DataFrame(out)

    return (
        df.filter(F.col("kind") == "video")
        .select("media_id", "content")
        .mapInPandas(extract, FRAME_FEATURES_SCHEMA)
    )


def sample_frames(df: DataFrame, n_frames: int = 3) -> DataFrame:
    """Frame sampling for video rows via mapInPandas → long format."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "frame_sha256": []}
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                if content is None:
                    continue
                for idx, frame in enumerate(
                    _decode_video_frames(bytes(content), n_frames)
                ):
                    out["media_id"].append(media_id)
                    out["frame_idx"].append(idx)
                    out["frame_sha256"].append(
                        hashlib.sha256(frame).hexdigest()
                    )
            yield pd.DataFrame(out)

    return (
        df.filter(F.col("kind") == "video")
        .select("media_id", "content")
        .mapInPandas(sample, FRAME_SAMPLE_SCHEMA)
    )


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("content_sha256", T.StringType(), False),
        T.StructField("n_samples", T.IntegerType(), False),
        T.StructField("sample_rate", T.IntegerType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), False),
    ]
)


def _decode_wav_pcm(content: bytes) -> np.ndarray | None:
    """Pure-stdlib PCM WAV decode (`wave` module, no codec library):
    integer PCM at 8/16/32-bit widths -> float32 in [-1, 1), channels
    downmixed by mean.  Returns None for anything the stdlib reader
    rejects (compressed WAV, float WAV, non-RIFF) so the caller can
    fall through to soundfile / the fake seam."""
    import wave as _wave

    if len(content) < 12 or content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        return None
    try:
        with _wave.open(io.BytesIO(content), "rb") as wf:
            n_ch = wf.getnchannels()
            width = wf.getsampwidth()
            frames = wf.readframes(wf.getnframes())
    except (_wave.Error, EOFError):
        return None
    if width == 1:  # unsigned 8-bit PCM
        samples = np.frombuffer(frames, dtype=np.uint8).astype(np.float32)
        samples = (samples - 128.0) / 128.0
    elif width == 2:
        samples = np.frombuffer(frames, dtype="<i2").astype(np.float32) / 32768.0
    elif width == 4:
        samples = (
            np.frombuffer(frames, dtype="<i4").astype(np.float32) / 2147483648.0
        )
    else:  # 24-bit et al.: rare enough to route to the library path
        return None
    if n_ch > 1:
        samples = samples.reshape(-1, n_ch).mean(axis=1)
    return samples.astype(np.float32)


def _decode_audio(content: bytes, sample_rate: int) -> np.ndarray:
    """DECODE SEAM: PCM WAV decodes everywhere via the stdlib (first —
    deterministic and dependency-free); soundfile handles other formats
    when available; else a deterministic pseudo-waveform in [-1, 1)
    whose length scales with the payload, as a real decode's would."""
    wav = _decode_wav_pcm(content)
    if wav is not None:
        return wav
    if HAVE_SOUNDFILE:
        wave, _sr = _soundfile.read(io.BytesIO(content), dtype="float32")
        return wave if wave.ndim == 1 else wave.mean(axis=1)
    h = hashlib.sha256(content).digest()
    n = max(256, min(len(content) * 4, 1 << 15))
    raw = np.frombuffer((h * (n // len(h) + 1))[:n], dtype=np.uint8)
    return (raw.astype(np.float32) - 127.5) / 128.0


def audio_features(df: DataFrame, bands: int = 13) -> DataFrame:
    """Per-clip band-energy feature via mapInPandas (Arrow batches).

    Feature = log-RMS over `bands` equal time windows of the decoded
    waveform — a stand-in for MFCC/mel-band extraction with the same
    batch shape, schema, and fixed output dim the real kernel would
    have.  Rows with kind != 'audio' are filtered JVM-side before any
    bytes cross the boundary; sample_rate rides from metadata (16 kHz
    default, as the reference-style loaders assume for missing rates).
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": [],
                "content_sha256": [],
                "n_samples": [],
                "sample_rate": [],
                "feature": [],
            }
            for media_id, content, rate in zip(
                pdf["media_id"], pdf["content"], pdf["sample_rate"]
            ):
                if content is None:
                    continue
                sr = int(rate) if pd.notna(rate) else 16000
                wave = _decode_audio(bytes(content), sr)
                windows = np.array_split(wave, bands)
                feat = np.array(
                    [
                        np.log1p(float(np.sqrt(np.mean(np.square(w)))))
                        for w in windows
                    ],
                    dtype=np.float32,
                )
                out["media_id"].append(media_id)
                out["content_sha256"].append(
                    hashlib.sha256(bytes(content)).hexdigest()
                )
                out["n_samples"].append(len(wave))
                out["sample_rate"].append(sr)
                out["feature"].append(feat.tolist())
            yield pd.DataFrame(out)

    return (
        df.filter(F.col("kind") == "audio")
        .select("media_id", "content", F.col("meta.sample_rate").alias("sample_rate"))
        .mapInPandas(extract, AUDIO_FEATURES_SCHEMA)
    )


def dedup_by_content(df: DataFrame) -> DataFrame:
    """Exact media dedup on sha2(content) — JVM-side hash, no Python."""
    return (
        df.withColumn("content_sha256", F.sha2(F.col("content"), 256))
        .groupBy("content_sha256")
        .agg(
            F.min("media_id").alias("canonical_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def partition_by_content(df: DataFrame, n: int = 0) -> DataFrame:
    """Spread hot/duplicate media across partitions by content hash —
    the layout step before any per-item decode at scale."""
    parts = n or df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(parts, F.sha2(F.col("content"), 256))
