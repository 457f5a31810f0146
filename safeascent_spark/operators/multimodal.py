"""Multimodal column plumbing (P6): opaque binary payloads + typed metadata,
decoded/feature-extracted via Arrow-batched mapInPandas.

The container has no image/audio codecs, so the decode step is STUBBED:
``decode_image_stub`` produces deterministic fake dimensions/features from
the payload bytes (clearly marked), while the Spark-side contract — binary
column schema, typed metadata struct, mapInPandas batch iteration, partition
behavior — is real and tested.  Swapping the stub for PIL/ffmpeg is a
one-function change.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import domain

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("media_type", T.StringType()),
    T.StructField("payload", T.BinaryType()),
    T.StructField("meta", T.StructType([
        T.StructField("source", T.StringType()),
        T.StructField("declared_bytes", T.LongType()),
    ])),
])

FEATURE_SCHEMA = (
    "media_id long, media_type string, n_bytes long, "
    "width int, height int, checksum long"
)


def media_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model documents as binary media rows: payload = utf-8 text bytes.

    At 100 TB the payload column dominates row size; keep it out of every
    projection that doesn't need it (column pruning does this for free when
    the decode step selects explicitly).
    """
    d = domain.load_table(spark, sf_dir, "documents")
    return d.select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 3 == 0, "image")
         .when(F.col("doc_id") % 3 == 1, "audio")
         .otherwise("video").alias("media_type"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.struct(F.col("source").alias("source"),
                 F.col("n_chars").alias("declared_bytes")).alias("meta"),
    )


def decode_image_stub(payload: bytes) -> tuple[int, int]:
    """STUB: deterministic fake decode (no codecs in this container).

    Real implementation would be e.g. PIL.Image.open(io.BytesIO(payload)).
    Raises NotImplementedError only if real decoding is demanded via the
    strict flag in extract_features.
    """
    h = 0
    for b in payload[:64]:
        h = (h * 131 + b) % 1_000_003
    return (64 + h % 1024, 64 + (h // 1024) % 1024)


def extract_features(media: DataFrame, strict: bool = False) -> DataFrame:
    """mapInPandas feature extraction over Arrow batches.

    Column pruning matters: only payload + ids enter the Python worker.
    """
    if strict:
        raise NotImplementedError(
            "real media decoding requires PIL/ffmpeg, not present here")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = [decode_image_stub(p) for p in pdf["payload"]]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "media_type": pdf["media_type"],
                "n_bytes": [len(p) for p in pdf["payload"]],
                "width": [d[0] for d in dims],
                "height": [d[1] for d in dims],
                "checksum": [sum(p[:32]) for p in pdf["payload"]],
            })

    return (media.select("media_id", "media_type", "payload")
                 .mapInPandas(run, FEATURE_SCHEMA))


def frame_sample(media: DataFrame, every_n: int = 10) -> DataFrame:
    """'Frame sampling' for video rows: deterministic byte-stride slices of
    the payload standing in for decoded frames (stub), one row per frame."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame_no": [], "frame_bytes": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                for i, off in enumerate(range(0, len(payload), every_n * 8)):
                    out["media_id"].append(mid)
                    out["frame_no"].append(i)
                    out["frame_bytes"].append(payload[off:off + 8])
            yield pd.DataFrame(out)

    return (media.filter(F.col("media_type") == "video")
                 .select("media_id", "payload")
                 .mapInPandas(run, "media_id long, frame_no int, frame_bytes binary"))
