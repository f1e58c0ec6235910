"""Vector math over ``array<float>`` embedding columns — pure JVM
expressions (``zip_with`` + ``aggregate``), no UDFs, no driver collects.

``F.aggregate`` folds left-to-right — a deterministic summation order, so
two runs (and two engines, given identical inputs) agree bit-for-bit on the
dot product. Computation is in float64 after casting each float32 element.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, p: acc + p)


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity in float64. Callers that cross an engine boundary
    should round (the oracle's summation order differs at ~1e-15)."""
    return dot(a, b) / (norm(a) * norm(b))
