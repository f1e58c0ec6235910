"""Streaming sources over the fixture parquet tables.

A parquet directory is Structured Streaming's canonical file source: files
that appear in the directory become micro-batches. The fixtures are single
files, so a run ingests one batch — the plumbing (schema pinning, glob
filter, event-time normalization) is exactly what a continuously-fed
directory would use at scale; ``maxFilesPerTrigger`` bounds batch size when
the directory grows.

Scale posture: the file source lists the directory each trigger — at 100 TB
feed rates, partition the landing directory by arrival time and point the
stream at the current partition, or use a notification-based source; the
query graph below is unchanged either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.io import normalize_events


def _stream_table(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """readStream over one fixture parquet file, schema pinned from a batch
    scan (file streams require an explicit schema)."""
    from ..sources.io import ensure_worker_imports

    ensure_worker_imports(spark)
    schema = spark.read.parquet(f"{sf_dir}/{name}.parquet").schema
    reader = spark.readStream.schema(schema).option("pathGlobFilter", f"{name}.parquet")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(sf_dir)


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming events with the same ts_ns/ts_sec/ts normalization as the
    batch loader (sources.io.load_events) — one code path, two execution
    modes."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return normalize_events(_stream_table(spark, sf_dir, "events"))


def stream_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _stream_table(spark, sf_dir, "documents")
