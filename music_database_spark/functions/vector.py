"""Vector math over array<float> columns — pure Catalyst expressions.

These compile to JVM higher-order functions (zip_with / aggregate), so
the hot path of similarity search stays inside codegen with no Python
round-trip. Accumulation is a sequential left fold in double precision —
deterministic for a given array, independent of partitioning.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double_array(col: Column | str) -> Column:
    """Upcast array<float> -> array<double> before arithmetic so both the
    engine and any oracle compute in the same precision."""
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def hashed_bow(text_col: Column | str, dim: int = 64) -> Column:
    """Deterministic hashed bag-of-words vector (feature hashing): dim
    buckets, bucket d = count of tokens with xxhash64(token) mod dim == d.

    Pure Catalyst higher-order functions — a single narrow pass per row
    (no shuffle at all), which beats the explode->groupBy->re-assemble
    formulation at scale: compute is embarrassingly parallel, and near-dup
    verification wants the vector colocated with the row anyway.
    """
    toks = F.split(text_col, " ")
    return F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda d: F.size(F.filter(toks, lambda t: F.pmod(F.xxhash64(t), F.lit(dim)) == d)).cast(
            "double"
        ),
    )
