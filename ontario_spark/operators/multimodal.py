"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns + typed metadata, processed via Arrow-batched ``mapInPandas``.

The decode/resize/frame-sample kernels need codec libraries that are
NOT in this container, so the actual byte decoding is STUBBED: either a
clearly marked ``NotImplementedError`` (real decode) or a deterministic
fake (byte-level stats standing in for decoded features). Everything
Spark-side — schema contracts, Arrow batch shapes, partition behavior —
is real and tested; swapping in a real `PIL`/`libav` kernel changes only
the per-batch pandas function body.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),  # 'image'|'audio'|'video'
        StructField("payload", BinaryType()),
    ]
)

DECODE_STATS_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("first_byte", IntegerType()),
        StructField("byte_sum_mod", LongType()),
    ]
)


def decode_image(payload: bytes):  # pragma: no cover - stub by design
    """Real image decode — requires PIL/opencv, absent in this
    container. The mapInPandas plumbing in ``decode_stats`` is the
    production shape; swap this in as the kernel when codecs exist."""
    raise NotImplementedError("image codecs not available in this environment")


def media_from_text(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Deterministic fake media table: utf-8 bytes of a text column as
    the binary payload (stands in for real image/audio bytes)."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit("image").alias("media_type"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
    )


def decode_stats(media: DataFrame, batch_hint: int | None = None) -> DataFrame:
    """Arrow-batched per-media byte stats via ``mapInPandas`` — the
    deterministic fake standing in for decode/feature-extraction.

    The iterator-of-batches shape is the scale-relevant part: one
    python worker per partition, Arrow transfer, constant memory per
    batch regardless of partition size."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "first_byte": payloads.map(
                        lambda b: b[0] if len(b) else -1
                    ).astype("int32"),
                    "byte_sum_mod": payloads.map(
                        lambda b: int(
                            np.frombuffer(b, dtype=np.uint8).sum(dtype=np.int64)
                        )
                        % 1_000_003
                    ).astype("int64"),
                }
            )

    from ontario_spark.operators.textops import spread

    return spread(media).mapInPandas(kernel, DECODE_STATS_SCHEMA)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize pipeline shape. STUB: raises on execution because
    codecs are unavailable; the plan (schema/partitioning) is real."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:  # pragma: no cover - stub by design
            pdf["payload"] = pdf["payload"].map(decode_image)
            yield pdf

    return media.mapInPandas(kernel, MEDIA_SCHEMA)
