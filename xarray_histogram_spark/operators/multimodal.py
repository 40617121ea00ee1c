"""Multimodal column plumbing: opaque binary media + typed metadata.

Real image/audio/video decoders are not available in this container, so the
decode kernels are STUBS — but everything Spark-side is real and tested:
the schema convention, Arrow-batched ``mapInPandas`` plumbing, batch shapes,
and partitioning.  ``decode_meta`` uses a deterministic fake "decoder"
(byte length + md5 prefix via hashlib — identical to the engines' md5, so
even this Pandas-UDF path is exactly oracle-checkable); the lossy kernels
(``decode_image`` / ``resize_image`` / ``sample_frames``) raise
``NotImplementedError`` at kernel level while their plumbing is exercised
with the fake in tests.

Scale notes: media bytes stay in executor-local Arrow batches end-to-end
(never collected); per-batch row counts are bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch``; metadata-only operations
(filtering by media_type/size) are column-pruned so the binary column is
not even read from parquet when untouched.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("payload", T.BinaryType()),
    ]
)

META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("fp8", T.StringType()),
    ]
)


def as_media(df: DataFrame, id_col: str, payload_col: str, media_type: str) -> DataFrame:
    """Normalise any source into the (media_id, media_type, payload) shape."""
    return df.select(
        F.col(id_col).cast("bigint").alias("media_id"),
        F.lit(media_type).alias("media_type"),
        F.col(payload_col).cast("binary").alias("payload"),
    )


def decode_meta(media: DataFrame) -> DataFrame:
    """Arrow-batched metadata extraction (the deterministic fake decoder):
    byte length + first 8 hex chars of md5.  Real decoders would populate
    width/height/duration here."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payload = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": payload.map(lambda b: len(b) if b is not None else 0),
                    "fp8": payload.map(
                        lambda b: hashlib.md5(b).hexdigest()[:8]
                        if b is not None
                        else None
                    ),
                }
            )

    return media.mapInPandas(kernel, META_SCHEMA)


def decode_meta_sql(table: str, id_col: str, payload_expr: str) -> str:
    """DuckDB mirror of decode_meta over the same source column."""
    return (
        f"SELECT CAST({id_col} AS BIGINT) AS media_id, "
        f"CAST(octet_length(CAST({payload_expr} AS BLOB)) AS BIGINT) AS n_bytes, "
        f"substring(md5({payload_expr}), 1, 8) AS fp8 FROM {table}"
    )


FEATURE_DIM = 8

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("feature", T.ArrayType(T.DoubleType())),
    ]
)


def extract_features(media: DataFrame, use_fake: bool = False) -> DataFrame:
    """Feature extraction over media payloads (mapInPandas).  The real
    kernel needs a vision/audio model — unavailable here; ``use_fake=True``
    runs a deterministic stand-in (md5-nibble folding) that exercises the
    identical plumbing and batch shape."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not use_fake:
                raise NotImplementedError(
                    "real media feature extraction requires decoder/model "
                    "libraries not present in this environment"
                )
            feats = []
            for b in pdf["payload"]:
                h = hashlib.md5(b or b"").digest()
                feats.append([float(h[i]) / 255.0 for i in range(FEATURE_DIM)])
            yield pd.DataFrame({"media_id": pdf["media_id"], "feature": feats})

    return media.mapInPandas(kernel, FEATURE_SCHEMA)


def resize_image(media: DataFrame, width: int, height: int) -> DataFrame:
    """STUB: image resize kernel (no codec libs in this container).  The
    plumbing (schema/batching) is identical to decode_meta."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        raise NotImplementedError("image codecs unavailable in this environment")
        yield  # pragma: no cover

    return media.mapInPandas(kernel, MEDIA_SCHEMA)


def sample_frames(media: DataFrame, every_n: int) -> DataFrame:
    """STUB: video frame sampling kernel."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        raise NotImplementedError("video codecs unavailable in this environment")
        yield  # pragma: no cover

    return media.mapInPandas(kernel, MEDIA_SCHEMA)
