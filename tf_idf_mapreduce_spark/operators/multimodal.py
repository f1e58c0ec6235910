"""Multimodal column plumbing: opaque ``binary`` media + typed metadata.

The container has no image/audio codecs, so the decode step is STUBBED
(deterministic fake features, or ``NotImplementedError`` in strict mode) —
but everything Spark-side is real and tested: the schema contract, the
Arrow-batched ``mapInPandas`` shape, partition-sized batching, and the
JVM-side byte statistics that need no Python at all.

At 100 TB: media bytes never reach the driver; ``mapInPandas`` streams
Arrow record batches through the Python workers partition-by-partition,
and the JVM-only stats queries don't deserialize into Python at all.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..sources.io import load_table

#: Output contract of the feature extractor.
MEDIA_FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("format", StringType()),
        StructField("features", ArrayType(FloatType())),
    ]
)

N_FEATURES = 16


def media_from_documents(documents: DataFrame) -> DataFrame:
    """Adapt the text fixture into the media shape: (doc_id, media binary,
    media_format, n_bytes). Real deployments read binary columns straight
    from parquet — the shape is identical."""
    media = F.encode(F.col("text"), "UTF-8")
    return documents.select(
        "doc_id",
        media.alias("media"),
        F.lit("text/plain").alias("media_format"),
        F.octet_length(media).cast("long").alias("n_bytes"),
    )


def decode_media(payload: bytes, media_format: str, *, fake: bool = True) -> list[float]:
    """STUB decode: the real pixel/waveform decode needs codec libs not in
    this container. ``fake=True`` returns a deterministic byte-histogram
    sketch (real arithmetic over the real bytes — only the codec is fake);
    ``fake=False`` raises, marking exactly where a codec plugs in.
    """
    if not fake:
        raise NotImplementedError(
            f"no codec for {media_format}; install one and plug it in here"
        )
    buckets = [0] * N_FEATURES
    for byte in payload:
        buckets[byte % N_FEATURES] += 1
    total = max(len(payload), 1)
    return [round(b / total, 6) for b in buckets]


def extract_media_features(media_df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary media via mapInPandas.

    The UDF sees pandas batches (one per Arrow batch within a partition) —
    the canonical shape for plugging in a real decoder + model. Output
    schema is fixed (MEDIA_FEATURES_SCHEMA).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["media"].map(len).astype("int64"),
                    "format": pdf["media_format"],
                    "features": pdf.apply(
                        lambda r: decode_media(r["media"], r["media_format"]),
                        axis=1,
                    ),
                }
            )

    return media_df.mapInPandas(run, MEDIA_FEATURES_SCHEMA)


def media_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JVM-only media statistics: byte sizes, content digest, magic-prefix
    hex — the no-Python fast path for media inventory queries."""
    m = media_from_documents(load_table(spark, sf_dir, "documents"))
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return (
        m.join(d, "doc_id")
        .select(
            "doc_id",
            "media_format",
            "n_bytes",
            F.md5("media").alias("content_md5"),
            F.upper(F.hex(F.encode(F.substring("text", 1, 8), "UTF-8"))).alias(
                "head_hex"
            ),
        )
    )
