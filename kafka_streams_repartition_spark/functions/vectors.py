"""Vector math as native column expressions over ``array<float|double>``.

``zip_with`` + ``aggregate`` keep the dot product JVM-side (no Arrow
transfer, no Python). Arithmetic is promoted to double *before*
multiplying so results match a double-precision oracle bit-for-bit
(float×float is exact in double).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_double_array(vec: Column | str) -> Column:
    c = F.col(vec) if isinstance(vec, str) else vec
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine_similarity(a: Column, b: Column, norm_a: Column, norm_b: Column) -> Column:
    return dot(a, b) / (norm_a * norm_b)


def dot_unrolled(a: Column, b: Column, dim: int) -> Column:
    """Dot product unrolled to a flat expression for a known dimension.

    Higher-order functions (``zip_with``/``aggregate``) are evaluated by
    the interpreter row-at-a-time with per-row array allocation; a flat
    sum of products compiles into whole-stage codegen and runs ~10×
    faster on the 100 TB scan path. Addition is left-associated in index
    order — bit-identical to the sequential ``aggregate`` fold and to
    the oracles' ordered SUM.
    """
    acc = F.lit(0.0)
    for i in range(1, dim + 1):
        acc = acc + F.element_at(a, i) * F.element_at(b, i)
    return acc


def norm_unrolled(a: Column, dim: int) -> Column:
    return F.sqrt(dot_unrolled(a, a, dim))


def sqdist_unrolled(a: Column, b: Column, dim: int) -> Column:
    """Squared euclidean distance, unrolled (see ``dot_unrolled``)."""
    acc = F.lit(0.0)
    for i in range(1, dim + 1):
        d = F.element_at(a, i) - F.element_at(b, i)
        acc = acc + d * d
    return acc
