"""Vector math as pure column expressions (JVM-side, codegen'd — no UDFs).

Embeddings arrive as ``array<float>``; every function here casts to double
FIRST and folds left with ``F.aggregate`` so the accumulation order (and thus
the IEEE result) is deterministic and reproducible across engines — required
for oracle hash-matching and for stable top-k ranking.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Left-fold dot product over zip_with — whole-stage-codegen friendly."""
    return F.aggregate(
        F.zip_with(as_double(a), as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(as_double(a), F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))
