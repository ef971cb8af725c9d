"""Multimodal-column plumbing: opaque binary payloads + typed metadata.

Design for 100 TB multimodal corpora: media travels as an opaque
``binary`` column next to a typed metadata struct; heavy per-item work
(decode, resize, frame-sample, feature-extract) runs as Arrow-batched
``mapInPandas`` so each Python worker sees a columnar batch, not a row.

The container has no image/audio libraries, so the decode kernels are
STUBS — ``decode_image_stub`` produces a deterministic fake "decode"
(shape + checksum derived from the bytes) and raises
``NotImplementedError`` when asked for real pixel output.  The Spark
plumbing around them (schema, batching, partition flow) is real and
tested; swapping in PIL/librosa/ffmpeg is a one-function change.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("media_kind", T.StringType()),
    T.StructField("payload", T.BinaryType()),
    T.StructField("meta", T.StructType([
        T.StructField("source", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
    ])),
])

DECODED_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("media_kind", T.StringType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("checksum", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
])


def to_media_table(docs: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Wrap a text table as a media table (payload = utf-8 bytes).

    In production the payload column is read straight from parquet
    binary (images/audio); here text bytes stand in so the pipeline is
    runnable on the fixtures.
    """
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.lit("text").alias("media_kind"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.struct(
            F.col("source").alias("source"),
            F.col("lang").alias("lang"),
            F.length(F.encode(F.col(text_col), "utf-8")).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def decode_media(media: DataFrame, real_decode: bool = False) -> DataFrame:
    """Arrow-batched "decode": mapInPandas over the payload column.

    The stub computes deterministic pseudo-dimensions + checksum from
    the bytes; ``real_decode=True`` raises NotImplementedError where a
    real codec (PIL / soundfile / pyav) would be called.
    """

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if real_decode:
                raise NotImplementedError(
                    "real media decoding needs an image/audio codec library "
                    "(not present in this container); the stub path exercises "
                    "the identical Spark plumbing"
                )
            payloads = pdf["payload"]
            checksums = payloads.map(
                lambda b: hashlib.md5(bytes(b or b"")).hexdigest()
            )
            n_bytes = payloads.map(lambda b: len(b or b""))
            # deterministic fake dimensions derived from content length
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "media_kind": pdf["media_kind"],
                "n_bytes": n_bytes.astype("int64"),
                "checksum": checksums,
                "width": (n_bytes % 640 + 1).astype("int32"),
                "height": (n_bytes % 480 + 1).astype("int32"),
            })

    return media.mapInPandas(decode_batches, schema=DECODED_SCHEMA)


def frame_sample(media: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """Frame-sampling stand-in: emit one row per sampled offset.

    For video this would be one decoded frame per N; the byte-offset
    explosion demonstrates the same fan-out shape (explode inside the
    JVM, no Python in the loop)."""
    return media.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0),
                       F.greatest(F.length("payload") - 1, F.lit(0)),
                       F.lit(every_n_bytes))
        ).alias("frame_offset"),
    )


FEATURE_DIM = 16

FEATURES_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("media_kind", T.StringType()),
    T.StructField("features", T.ArrayType(T.FloatType())),
])


def resize_media(media: DataFrame, max_bytes: int = 128) -> DataFrame:
    """'Resize' stand-in: truncate the payload to ``max_bytes`` —
    JVM-side binary slice, the same shape as a thumbnail/clip step
    (payload-in, smaller-payload-out, metadata updated)."""
    clipped = F.substring(F.col("payload"), 1, max_bytes)
    return media.select(
        "doc_id", "media_kind",
        clipped.alias("payload"),
        F.struct(
            F.col("meta.source").alias("source"),
            F.col("meta.lang").alias("lang"),
            F.length(clipped).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def extract_features(media: DataFrame, real_extract: bool = False) -> DataFrame:
    """Feature extraction over binary payloads via Arrow-batched
    mapInPandas — the embedding-model slot.  Stub: deterministic
    FEATURE_DIM-dim vector from md5 of the bytes (so downstream
    similarity plumbing is testable end-to-end without a model)."""

    def feat_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if real_extract:
                raise NotImplementedError(
                    "real feature extraction needs a vision/audio model; "
                    "the stub path exercises identical Spark plumbing")

            def vec(b):
                h = hashlib.md5(bytes(b or b"")).digest()
                return [h[i] / 255.0 for i in range(FEATURE_DIM)]

            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "media_kind": pdf["media_kind"],
                "features": pdf["payload"].map(vec),
            })

    return media.mapInPandas(feat_batches, schema=FEATURES_SCHEMA)
