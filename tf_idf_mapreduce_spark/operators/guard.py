"""Scale guardrail for the deliberately-exact quadratic operators.

Three operators intentionally keep an exact all-pairs formulation as the
recall/precision DENOMINATOR for their bucketed scale twins:

- ``retrieval.doc_similarity``   (twin: ``retrieval.doc_similarity_lsh``)
- ``dedup.embedding_near_pairs`` (twin: ``similarity.lsh_bucket_pairs``)
- ``similarity.knn_graph``       (twin: ``similarity.knn_graph_ann``)

They are tile-blocked (O(n²/B) shuffle, BLAS kernels), which makes them
fast at fixture scale — and quadratic all the same. Nothing about the
plan stops a caller from pointing one at a 100x corpus, so each counts
its input relation first (one cheap aggregate — parquet count-star or a
count over an already-checkpointed relation) and refuses loudly above
``max_rows``, naming the bucketed twin to use instead. The default cap
is ~20-50x every shipped fixture, so oracle/bench runs never trip it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

#: Default input-row cap for the exact quadratic paths. At n = 100k the
#: tiled kernels still finish on one beefy node (~10^10 BLAS cosines);
#: beyond it the bucketed twin is strictly the right tool.
EXACT_QUADRATIC_MAX_ROWS = 100_000


class ExactPathTooLarge(ValueError):
    """Raised when an exact all-pairs operator is asked to run on an
    input past its row cap — the bucketed twin is the scale path."""


class IterationLimitExceeded(RuntimeError):
    """Raised when an iterative algorithm (label propagation, power
    iteration with a convergence contract) exhausts its round budget
    with state still moving — returning the unconverged state would be
    a silently wrong answer, so the operator refuses instead."""


def guard_exact_quadratic(
    rel: DataFrame, *, what: str, twin: str, max_rows: int | None
) -> int:
    """Count ``rel`` and raise :class:`ExactPathTooLarge` when it exceeds
    ``max_rows`` (``None`` disables the guard — explicit opt-out only).
    Returns the count so callers can reuse it."""
    n = rel.count()
    if max_rows is not None and n > max_rows:
        raise ExactPathTooLarge(
            f"{what}: input has {n:,} rows, past the exact-quadratic cap "
            f"of {max_rows:,}. This path is the recall baseline, not the "
            f"scale path — use {twin} (bucketed candidates, never "
            f"all-pairs), or pass max_rows=None to force the exact run."
        )
    return n
