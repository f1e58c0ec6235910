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

import math
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
    # round half-AWAY-from-zero (SQL convention), not Python's banker's
    # rounding: power-of-two payload sizes produce exact .5 ties at 6dp
    return [math.floor(b / total * 1e6 + 0.5) / 1e6 for b in buckets]


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


FRAME_SIZE = 256
FRAME_EVERY_K = 2


def frame_sample(
    spark: SparkSession,
    sf_dir: str,
    frame_size: int = FRAME_SIZE,
    every_k: int = FRAME_EVERY_K,
) -> DataFrame:
    """Video-style frame sampling, entirely JVM-side: treat the binary as a
    stream of fixed-size frames, keep every k-th, digest each.

    No Python touches the bytes — ``substring`` on binary is byte-addressed
    and ``md5`` digests frames inside codegen, so at 100 TB this is a scan +
    a narrow explode, no Arrow transfer. A real video decoder replaces the
    fixed-size split with codec framing via ``extract_media_features``'s
    mapInPandas path; the downstream plumbing (explode, per-frame rows,
    digest columns) is identical.
    """
    # n_bytes > 0 guard: Spark's sequence(0, -1) counts DOWN ([0, -1]),
    # it is not empty like generate_series — an empty payload would
    # otherwise emit phantom frames
    m = media_from_documents(load_table(spark, sf_dir, "documents")).where(
        F.col("n_bytes") > 0
    )
    n_frames = F.ceil(F.col("n_bytes") / F.lit(frame_size)).cast("int")
    frames = m.select(
        "doc_id",
        "n_bytes",
        F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx"),
        F.col("media"),
    ).where(F.col("frame_idx") % every_k == 0)
    frame = F.expr(f"substring(media, frame_idx * {frame_size} + 1, {frame_size})")
    return frames.select(
        "doc_id",
        F.col("frame_idx").cast("long").alias("frame_idx"),
        F.octet_length(frame).cast("long").alias("frame_bytes"),
        # digest of the frame's (uppercase) hex rendering, not the raw
        # bytes: SQL engines commonly can't md5/slice BLOBs, and the hex
        # domain is a bijection, so the digest identifies frames equally
        F.md5(F.hex(frame)).alias("frame_md5"),
    )


def media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-facing shape of ``extract_media_features``: the Arrow-batched
    mapInPandas extractor, exploded to one row per (doc, feature bucket).

    The stub 'decode' is a byte histogram — real arithmetic over the real
    bytes — so the whole Pandas-UDF path is verifiable against a SQL oracle
    computing the same histogram, proving the plumbing end-to-end.
    """
    m = media_from_documents(load_table(spark, sf_dir, "documents"))
    feats = extract_media_features(m)
    return feats.select(
        "doc_id",
        "n_bytes",
        F.posexplode("features").alias("bucket", "share"),
    ).select(
        "doc_id",
        "n_bytes",
        F.col("bucket").cast("long").alias("bucket"),
        # features are float32; the stub rounds to 6dp, which is <7 sig
        # digits for shares in [0,1] — re-rounding after the double cast
        # recovers the exact decimal the oracle computes
        F.round(F.col("share").cast("double"), 6).alias("share"),
    )


THUMB_SIDE = 8

RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("src_side", LongType()),
        StructField("thumb_side", LongType()),
        StructField("thumb_md5", StringType()),
    ]
)


def resize_thumbnails(
    media_df: DataFrame, side: int = THUMB_SIDE, *, fake: bool = True
) -> DataFrame:
    """Image-resize plumbing (STUB decode): interpret the payload as a
    square grayscale bitmap of side floor(sqrt(n_bytes)) and stride-sample
    it down to ``side``x``side``. The sampling arithmetic and digests are
    real; only the bitmap interpretation is fake — a real codec decode
    slots into ``_thumb`` unchanged. ``fake=False`` raises, marking the
    codec seam.
    """

    def _thumb(payload: bytes) -> tuple[int, bytes]:
        if not fake:
            raise NotImplementedError("no image codec in this container")
        src = int(len(payload) ** 0.5)
        if src == 0:
            return 0, b""
        out = bytearray()
        for r in range(side):
            for c in range(side):
                sr, sc = r * src // side, c * src // side
                out.append(payload[sr * src + sc])
        return src, bytes(out)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            sides, digests = [], []
            for payload in pdf["media"]:
                src, thumb = _thumb(bytes(payload))
                sides.append(src)
                digests.append(hashlib.md5(thumb).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "src_side": pd.Series(sides, dtype="int64"),
                    "thumb_side": side,
                    "thumb_md5": digests,
                }
            )

    return media_df.mapInPandas(run, RESIZE_SCHEMA)


def media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = media_from_documents(load_table(spark, sf_dir, "documents"))
    return resize_thumbnails(m)


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
