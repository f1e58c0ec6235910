"""two_phase_running_sum must equal the single-partition global window
it replaces — on skewed bucket sizes, empty-ish buckets, and a running
count (the row_number formulation RFM rides)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from tf_idf_mapreduce_spark.operators.prefix import two_phase_running_sum


def _base(spark):
    # bucket sizes 1, 2, 4, ... (skewed), values keyed off the id
    rows = [(i, i % 7 + 1, i // 10) for i in range(137)]
    return spark.createDataFrame(rows, "doc_id long, v long, bucket long")


def test_matches_global_window_sum(spark):
    df = _base(spark)
    got = two_phase_running_sum(
        df, bucket="bucket", order_by=["doc_id"], value=F.col("v"), out="cum"
    ).select("doc_id", "cum")
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, 0)
    want = df.select("doc_id", F.sum("v").over(w).alias("cum"))
    assert sorted(got.collect()) == sorted(want.collect())


def test_running_count_is_row_number(spark):
    df = _base(spark)
    got = two_phase_running_sum(
        df, bucket="bucket", order_by=["doc_id"], value=F.lit(1), out="rn"
    ).select("doc_id", "rn")
    w = Window.orderBy("doc_id")
    want = df.select("doc_id", F.row_number().over(w).cast("long").alias("rn"))
    assert sorted(got.collect()) == sorted(want.collect())


def test_partition_invariance(spark):
    df = _base(spark)
    outs = []
    for n in (3, 17):
        got = two_phase_running_sum(
            df.repartition(n),
            bucket="bucket",
            order_by=["doc_id"],
            value=F.col("v"),
            out="cum",
        ).select("doc_id", "cum")
        outs.append(sorted(got.collect()))
    assert outs[0] == outs[1]
