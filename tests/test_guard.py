"""The exact-quadratic trio must refuse oversized inputs loudly.

These operators are kept as recall/precision baselines for their bucketed
twins; the guard converts "weak at 100x" into "safe by construction" —
an input past the cap raises with a pointer to the scale path instead of
launching an O(n²) job.
"""

from __future__ import annotations

import pytest

from tf_idf_mapreduce_spark.operators import dedup as dd
from tf_idf_mapreduce_spark.operators import retrieval as rt
from tf_idf_mapreduce_spark.operators import similarity as sim
from tf_idf_mapreduce_spark.operators.guard import (
    EXACT_QUADRATIC_MAX_ROWS,
    ExactPathTooLarge,
)


def test_embedding_near_pairs_guard(spark, sf_dir):
    with pytest.raises(ExactPathTooLarge, match="lsh_bucket_pairs"):
        dd.embedding_near_pairs(spark, sf_dir, max_rows=10)


def test_knn_graph_guard(spark, sf_dir):
    with pytest.raises(ExactPathTooLarge, match="knn_graph_ann"):
        sim.knn_graph(spark, sf_dir, max_rows=10)


def test_doc_similarity_guard(spark, sf_dir):
    with pytest.raises(ExactPathTooLarge, match="doc_similarity_lsh"):
        rt.doc_similarity(spark, sf_dir, max_rows=10)


def test_guard_opt_out_and_default_headroom(spark, sf_dir):
    # max_rows=None disables the guard; the default cap clears every
    # shipped fixture by >20x (the largest is 5000 docs at sf0.1)
    assert EXACT_QUADRATIC_MAX_ROWS >= 20 * 5000
    assert sim.knn_graph(spark, sf_dir, max_rows=None).limit(1).count() == 1
