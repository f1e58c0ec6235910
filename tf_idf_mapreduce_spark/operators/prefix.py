"""Distributed two-phase prefix sum — the shared pattern behind
``curation.shard_pack``, ``curation.train_manifest``, and
``events._exact_global_ntile``.

The 100 TB trap these avoid: ``sum() OVER (ORDER BY ...)`` with no
PARTITION BY funnels the entire relation through ONE task. The two-phase
form instead:

- phase 1: rows carry a ``bucket`` column whose ordering is consistent
  with the global order (every row of bucket i sorts before every row of
  bucket i+1); a bucket-partitioned window computes bucket-LOCAL running
  sums — parallelism = |buckets|, each group bounded;
- phase 2: per-bucket totals (a |buckets|-row relation) turn into
  exclusive prefix offsets — that tiny window IS single-partition, by
  design — and broadcast back. global running sum = offset + local.

A running COUNT (``value=F.lit(1)``) with a tie-free ``order_by`` is a
distributed ``row_number()``, which is how the exact global ntile rides
the same helper.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def two_phase_running_sum(
    df: DataFrame,
    *,
    bucket: str,
    order_by: list[Column | str],
    value: Column,
    out: str,
) -> DataFrame:
    """``df`` + column ``out`` = inclusive global running sum of
    ``value`` in ``order_by`` order, computed without any data-sized
    single-partition window. ``order_by`` must be a total order within a
    bucket (unique tiebreak) for the result to be deterministic."""
    w_local = (
        Window.partitionBy(bucket)
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = df.withColumn(out, F.sum(value).over(w_local))
    totals = df.groupBy(bucket).agg(F.sum(value).alias("_btot"))
    w_prev = Window.orderBy(bucket).rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        bucket,
        F.coalesce(F.sum("_btot").over(w_prev), F.lit(0)).alias("_boff"),
    )
    return (
        local.join(F.broadcast(offsets), bucket)
        .withColumn(out, F.col(out) + F.col("_boff"))
        .drop("_boff")
    )
