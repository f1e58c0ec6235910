"""Run a finite streaming query to completion and hand back a batch result.

``trigger(availableNow=True)`` processes everything currently in the source
as micro-batches and then stops — the standard pattern for batch-over-
streaming-graph execution (and for draining a backlog at scale). The memory
sink keeps results queryable as a temp view.
"""

from __future__ import annotations

import itertools
import shutil
import tempfile

from pyspark.sql import DataFrame

_SEQ = itertools.count()

#: State partition count stamped into each run's checkpoint at its first
#: micro-batch. Stateful operators create one state-store directory per
#: shuffle partition per trigger — at fixture scale that file overhead
#: dominates (measured 3.2s → 1.7s per run going 32 → 4, and another
#: ~40% off a 4-trigger drain going 4 → 2; 1 loses Arrow-kernel
#: parallelism in applyInPandasWithState and regresses). At real feed
#: rates size this to state volume instead (state partitions are fixed
#: for a checkpoint's lifetime, so pick for the target scale up front).
STREAM_STATE_PARTITIONS = 2


def run_to_memory(
    sdf: DataFrame,
    name: str,
    output_mode: str = "complete",
    timeout_sec: int = 300,
) -> DataFrame:
    """Execute a streaming DataFrame to a memory sink; return the result as
    a batch DataFrame. ``name`` is suffixed with a sequence number so
    repeated runs in one session never collide."""
    table = f"{name}_{next(_SEQ)}"
    spark = sdf.sparkSession
    saved = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(STREAM_STATE_PARTITIONS))
    # the memory sink holds the results after the drain; the checkpoint is
    # only needed while the query runs — remove it so repeated bench/oracle
    # runs don't accumulate orphaned temp dirs
    ckpt = tempfile.mkdtemp(prefix=f"spark_ckpt_{table}_")
    try:
        query = (
            sdf.writeStream.format("memory")
            .queryName(table)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            if not query.awaitTermination(timeout_sec):
                raise TimeoutError(
                    f"streaming query {table} still running after {timeout_sec}s"
                )
        finally:
            query.stop()
        # copy the sink's rows into block storage: a long session (the
        # full-surface bench) otherwise accumulates one live MemorySink
        # per streaming run, and that creep shows up as per-query
        # slowdown late in the bench. The returned DF is backed by its
        # own checkpointed RDD, independent of the dropped view.
        out = spark.table(table).localCheckpoint(eager=True)
        return out
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", saved)
        shutil.rmtree(ckpt, ignore_errors=True)
        # drop the sink's temp view on EVERY exit path — a timed-out or
        # failed drain must not leave its MemorySink (and buffered rows)
        # registered for the session's lifetime
        try:
            spark.catalog.dropTempView(table)
        except Exception:
            pass
