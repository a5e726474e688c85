"""Multimodal (image/audio/video) column plumbing for training pipelines.

Media travels as an opaque ``binary`` payload column plus a typed metadata
struct — the layout WARC-derived multimodal corpora use. The Spark-side
machinery (schema, Arrow batch shape, ``mapInPandas`` signatures,
partitioning) is real and tested; the *codec* step is pluggable:

* ``backend="fake"`` (oracle-checkable default) — a deterministic
  md5-based kernel standing in for the decoder, so every downstream stage
  (feature join, dedupe by feature, resize bookkeeping) is exercised
  end-to-end with SQL-verifiable values.
* ``backend="real"`` — **actual decoding**, dependency-free where a
  format permits: PPM (P6) images are parsed/encoded with numpy, WAV
  audio with the stdlib ``wave`` module; features are real statistics
  (pixel-channel means, RMS amplitude, zero-crossing rate) and
  :func:`resize_images` does a real nearest-neighbor resample.
  Compressed formats (png/jpeg/mp4) raise :class:`NotImplementedError`
  naming the missing codec (PIL / av are not installed in this
  container). Either backend keeps the same call signature, batch
  iteration, and output schema — swapping backends changes no plan shape.
"""

from __future__ import annotations

import hashlib
import io
import math
import wave
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("n_frames", T.IntegerType(), True),
                    T.StructField("mime", T.StringType(), True),
                ]
            ),
            False,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("digest", T.StringType(), False),
        T.StructField("feature", T.ArrayType(T.DoubleType()), False),
    ]
)

_KINDS = ("image", "audio", "video")
_MIMES = {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}


def synth_media(spark: SparkSession, n: int, partitions: int | None = None) -> DataFrame:
    """Deterministic synthetic media table: payload = utf-8 bytes of
    ``media:{kind}:{id}`` repeated (stands in for compressed frames) plus
    plausible metadata. Pure JVM string/binary expressions."""
    parts = partitions or spark.sparkContext.defaultParallelism
    i = F.col("id")
    kind = F.element_at(
        F.array(*[F.lit(k) for k in _KINDS]), (i % 3 + 1).cast("int")
    )
    body = F.repeat(
        F.format_string("media:%s:%d;", kind, i), (i % 7 + 1).cast("int")
    )
    return spark.range(0, n, 1, parts).select(
        i.alias("media_id"),
        kind.alias("kind"),
        F.encode(body, "UTF-8").alias("payload"),
        F.struct(
            F.when(kind == "image", (i % 640 + 16).cast("int")).alias("width"),
            F.when(kind == "image", (i % 480 + 16).cast("int")).alias("height"),
            F.when(kind == "audio", F.lit(16000).cast("int")).alias("sample_rate"),
            F.when(kind == "video", (i % 300 + 1).cast("int")).alias("n_frames"),
            F.element_at(
                F.create_map(*[F.lit(x) for kv in _MIMES.items() for x in kv]), kind
            ).alias("mime"),
        ).alias("meta"),
    )


# ---------------------------------------------------------------------------
# real codecs (dependency-free formats: PPM images, WAV audio)
# ---------------------------------------------------------------------------


def encode_ppm(pixels: np.ndarray) -> bytes:
    """P6 (binary) PPM encode of an ``(h, w, 3) uint8`` array."""
    h, w, _ = pixels.shape
    return b"P6\n%d %d\n255\n" % (w, h) + pixels.tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """P6 PPM decode → ``(h, w, 3) uint8``. Minimal, strict parser
    (whitespace-separated header, maxval 255)."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    parts: list[int] = []
    pos = 2
    while len(parts) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment line
            pos = payload.index(b"\n", pos) + 1
            continue
        end = pos
        while end < len(payload) and not payload[end : end + 1].isspace():
            end += 1
        parts.append(int(payload[pos:end]))
        pos = end
    w, h, maxval = parts
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    pos += 1  # single whitespace after maxval
    return np.frombuffer(payload, dtype=np.uint8, count=h * w * 3,
                         offset=pos).reshape(h, w, 3)


def encode_wav(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """16-bit mono PCM WAV encode of an int16 sample array (stdlib)."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(sample_rate)
        wf.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """WAV decode → (float samples in [-1, 1], sample_rate). 16-bit mono."""
    with wave.open(io.BytesIO(payload), "rb") as wf:
        sr = wf.getframerate()
        raw = wf.readframes(wf.getnframes())
    return np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0, sr


def synth_media_real(spark: SparkSession, n: int,
                     partitions: int | None = None) -> DataFrame:
    """Media table with REAL payloads, generated distributedly from the
    id (no driver-side bytes): even ids → P6 PPM gradient images, odd ids
    → WAV sine tones (freq 200+id Hz, 0.05 s @ 8 kHz). Same schema as
    :func:`synth_media`."""
    parts = partitions or spark.sparkContext.defaultParallelism
    ids = spark.range(0, n, 1, parts)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in
                    ("media_id", "kind", "payload", "meta")}
            for i in pdf["id"]:
                i = int(i)
                if i % 2 == 0:
                    w, h = 16 + i % 17, 12 + i % 11
                    yy, xx = np.mgrid[0:h, 0:w]
                    px = np.stack(
                        [(xx * 255 // max(w - 1, 1)),
                         (yy * 255 // max(h - 1, 1)),
                         np.full((h, w), i % 256)], axis=-1
                    ).astype(np.uint8)
                    rows["media_id"].append(i)
                    rows["kind"].append("image")
                    rows["payload"].append(encode_ppm(px))
                    rows["meta"].append(
                        {"width": w, "height": h, "sample_rate": None,
                         "n_frames": None, "mime": "image/x-portable-pixmap"}
                    )
                else:
                    sr, dur = 8000, 0.05
                    t = np.arange(int(sr * dur)) / sr
                    samples = (0.5 * 32767 * np.sin(
                        2 * math.pi * (200 + i) * t)).astype("<i2")
                    rows["media_id"].append(i)
                    rows["kind"].append("audio")
                    rows["payload"].append(encode_wav(samples, sr))
                    rows["meta"].append(
                        {"width": None, "height": None, "sample_rate": sr,
                         "n_frames": None, "mime": "audio/wav"}
                    )
            yield pd.DataFrame(rows)

    return ids.mapInPandas(gen, MEDIA_SCHEMA)


def _real_feature(kind: str, payload: bytes, dim: int) -> list[float]:
    """Real per-media features: images → [w, h, mean_R, mean_G, mean_B];
    audio → [duration_s, rms, zero_cross_rate, sample_rate_khz]; padded
    with zeros to ``dim``."""
    if kind == "image":
        px = decode_ppm(payload)
        h, w, _ = px.shape
        vals = [float(w), float(h)] + [float(px[:, :, c].mean()) for c in range(3)]
    elif kind == "audio":
        samples, sr = decode_wav(payload)
        zc = float(np.mean(np.abs(np.diff(np.signbit(samples))))) if len(samples) > 1 else 0.0
        vals = [len(samples) / sr, float(np.sqrt(np.mean(samples ** 2))), zc,
                sr / 1000.0]
    else:
        raise NotImplementedError(
            f"real decode of kind={kind!r} needs an external codec "
            "(av for video, PIL for compressed images); only PPM images "
            "and WAV audio decode dependency-free"
        )
    vals = vals[:dim]
    return vals + [0.0] * (dim - len(vals))


# ---------------------------------------------------------------------------
# decode / feature-extract (mapInPandas — the codec boundary)
# ---------------------------------------------------------------------------


def _fake_feature(payload: bytes, dim: int) -> list[float]:
    """Deterministic stand-in feature: md5(payload) expanded to ``dim``
    doubles in [0, 1). SQL-mirrorable, so the oracle can verify the full
    pipeline around the codec."""
    out: list[float] = []
    block = payload
    while len(out) < dim:
        block = hashlib.md5(block).digest()
        out.extend(b / 256.0 for b in block)
    return out[:dim]


def extract_features(media: DataFrame, dim: int = 8,
                     backend: str = "fake") -> DataFrame:
    """``mapInPandas`` feature extraction over media payloads → rows of
    :data:`FEATURE_SCHEMA`. Batches stream through Arrow; nothing is
    collected. ``backend="real"`` decodes PPM/WAV payloads for real
    (see module docstring); ``"fake"`` is the md5 stand-in the SQL
    oracle can mirror."""
    if backend not in ("fake", "real"):
        raise ValueError(f"unknown backend {backend!r}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [bytes(p) for p in pdf["payload"]]
            if backend == "real":
                feats = [
                    _real_feature(k, p, dim)
                    for k, p in zip(pdf["kind"], payloads)
                ]
            else:
                feats = [_fake_feature(p, dim) for p in payloads]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p) for p in payloads],
                    "digest": [hashlib.md5(p).hexdigest() for p in payloads],
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


def resize_nearest(pixels: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample of an ``(h, w, 3)`` array (pure numpy)."""
    h, w, _ = pixels.shape
    rows = (np.arange(height) * h // height).clip(0, h - 1)
    cols = (np.arange(width) * w // width).clip(0, w - 1)
    return pixels[rows][:, cols]


def resize_images(media: DataFrame, width: int, height: int,
                  backend: str = "fake") -> DataFrame:
    """Image resize: filters to ``kind='image'``, rewrites the meta struct
    to the target dims. ``backend="real"`` decodes the PPM payload,
    nearest-neighbor-resamples with numpy, and re-encodes — a genuine
    resize with zero external dependencies. ``"fake"`` keeps the
    deterministic tag+bytes stand-in (for compressed payloads whose codec
    is absent)."""
    if backend == "real":
        imgs = media.filter(F.col("kind") == "image")

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                out = pdf.copy()
                out["payload"] = [
                    encode_ppm(resize_nearest(decode_ppm(bytes(p)), width, height))
                    for p in pdf["payload"]
                ]
                out["meta"] = [
                    {**m, "width": width, "height": height}
                    for m in pdf["meta"]
                ]
                yield out

        return imgs.mapInPandas(run, MEDIA_SCHEMA)
    imgs = media.filter(F.col("kind") == "image")
    return imgs.select(
        "media_id",
        "kind",
        # fake "resized" payload: tag + original bytes (deterministic)
        F.concat(
            F.encode(F.format_string("resized:%dx%d:", F.lit(width), F.lit(height)), "UTF-8"),
            F.col("payload"),
        ).alias("payload"),
        F.struct(
            F.lit(width).cast("int").alias("width"),
            F.lit(height).cast("int").alias("height"),
            F.col("meta.sample_rate").alias("sample_rate"),
            F.col("meta.n_frames").alias("n_frames"),
            F.col("meta.mime").alias("mime"),
        ).alias("meta"),
    )


def sample_frames(media: DataFrame, every: int = 30) -> DataFrame:
    """Frame sampling bookkeeping for video rows: one output row per
    sampled frame index (``sequence`` + ``explode`` — JVM-side; the frame
    *decode* would hang off the same rows via :func:`extract_features`)."""
    vids = media.filter(F.col("kind") == "video")
    return vids.select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.col("meta.n_frames") - 1, F.lit(0)),
                F.lit(every),
            )
        ).alias("frame_idx"),
    )
