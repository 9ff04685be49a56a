"""Embedding vector math as Column expressions (no UDFs).

``F.zip_with`` + ``F.aggregate`` fold sequentially over the array, so
the floating-point result is deterministic and matches a sequential
oracle (DuckDB list_dot_product over DOUBLE[]) bit-for-bit. Everything
stays JVM-side inside codegen — at 100 TB this is the difference
between a vectorized scan and a Python serialization wall.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product of two array<double> columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; NULL if either side has zero norm.

    try_divide, not / : under default-ANSI Spark a zero-norm vector
    would throw DIVIDE_BY_ZERO and abort the job instead of honoring
    the documented NULL."""
    return F.try_divide(dot(a, b), norm(a) * norm(b))
