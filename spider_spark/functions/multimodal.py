"""Multimodal (image/audio/video) column plumbing for training pipelines.

Media travels as an opaque ``binary`` payload column plus a typed metadata
struct — the layout WARC-derived multimodal corpora use. The Spark-side
machinery (schema, Arrow batch shape, ``mapInPandas`` signatures,
partitioning) is real and tested; the *codec* step is pluggable:

* ``backend="fake"`` (default, used everywhere in this sandbox) — a
  deterministic md5-based kernel standing in for the decoder, so every
  downstream stage (feature join, dedupe by feature, resize bookkeeping)
  is exercised end-to-end with verifiable values.
* ``backend="real"`` — raises :class:`NotImplementedError` with the exact
  dependency needed (PIL / soundfile / av are not installed in this
  container). The call signature, batch iteration, and output schema are
  identical, so swapping backends changes no plan shape.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

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
    collected. ``backend="real"`` is the hook for actual codecs."""
    if backend == "real":
        raise NotImplementedError(
            "real decode needs PIL (image) / soundfile (audio) / av (video), "
            "not installed in this container; use backend='fake'"
        )
    if backend != "fake":
        raise ValueError(f"unknown backend {backend!r}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [bytes(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p) for p in payloads],
                    "digest": [hashlib.md5(p).hexdigest() for p in payloads],
                    "feature": [_fake_feature(p, dim) for p in payloads],
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


def resize_images(media: DataFrame, width: int, height: int,
                  backend: str = "fake") -> DataFrame:
    """Image resize plumbing: filters to ``kind='image'``, rewrites the
    meta struct to the target dims, and (fake backend) re-digests the
    payload with the target size folded in — the exact dataflow a PIL
    resize would follow, with the pixel work stubbed."""
    if backend == "real":
        raise NotImplementedError("real resize needs PIL; use backend='fake'")
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
