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


def dot_sql(a_sql: str, b_sql: str) -> str:
    """SQL text of ``dot`` — parses to the identical sequential-fold
    Catalyst expression (``0.0D`` keeps the seed a double)."""
    return (
        f"aggregate(zip_with({a_sql}, {b_sql}, (x, y) -> x * y), "
        "0.0D, (acc, x) -> acc + x)"
    )


def dot_unrolled_sql(a_sql: str, b_sql: str, dims: int) -> str:
    """SQL text of the guarded unrolled dot (see ``dot_unrolled``)."""
    prods = " + ".join(
        f"(element_at({a_sql}, {i}) * element_at({b_sql}, {i}))"
        for i in range(1, dims + 1)
    )
    return (
        f"CASE WHEN (size({a_sql}) = {dims}) AND (size({b_sql}) = {dims}) "
        f"THEN ({prods}) ELSE {dot_sql(a_sql, b_sql)} END"
    )


def dot_unrolled(a: Column | str, b: Column | str, dims: int) -> Column:
    """``dot`` unrolled for a statically known dimension count.

    Bit-identical to ``dot`` on two length-``dims`` arrays: the chain
    ``(x1 + x2) + x3 ...`` is the same left-fold order as the
    ``aggregate`` (whose seed contributes ``0.0 + x1 == x1`` exactly in
    IEEE), and a NULL element poisons the sum identically. Rows where
    either side is not length ``dims`` (ragged, NULL array) fall back
    to ``dot`` per row via the guard, so the function equals ``dot``
    on EVERY input — the unroll is a pure execution-strategy change.

    Why it exists: ``F.aggregate``/``zip_with``/``transform`` are
    CodegenFallback expressions — evaluated interpreted, one closure
    invocation per element — so a pair join computing O(pairs · dims)
    fold steps spends its CPU in lambda dispatch, not arithmetic
    (measured: the SemDeDup pair stage at sf0.1 burned ~160 CPU-s in
    stage 48, >90% in HOF interpretation). The unrolled chain of
    ``element_at`` products compiles into whole-stage codegen as
    straight-line double arithmetic.

    Pass ``a``/``b`` as SQL STRINGS (resolvable column/expression
    text, e.g. ``"a.u"`` or ``"slice(ve, 9, 8)"``) whenever possible:
    the whole tree is then built by ONE ``F.expr`` parse instead of
    ~3·dims py4j round-trips (measured ~1 s per construction for
    k·dims = 256 on the r13 box — the driver, not the executor, was
    the regression).
    """
    if isinstance(a, str) and isinstance(b, str):
        if dims <= 0:
            return F.expr(dot_sql(a, b))
        return F.expr(dot_unrolled_sql(a, b, dims))
    if dims <= 0:
        return dot(a, b)
    acc = F.element_at(a, 1) * F.element_at(b, 1)
    for i in range(2, dims + 1):
        acc = acc + F.element_at(a, i) * F.element_at(b, i)
    return F.when(
        (F.size(a) == dims) & (F.size(b) == dims), acc
    ).otherwise(dot(a, b))


def cosine_unrolled(a: Column | str, b: Column | str, dims: int) -> Column:
    """``cosine`` with every fold unrolled (see ``dot_unrolled``);
    bit-identical to ``cosine`` on every input, including the
    zero-norm -> NULL contract (same ``try_divide``). String operands
    build the whole tree with one ``F.expr`` parse."""
    if isinstance(a, str) and isinstance(b, str) and dims > 0:
        return F.expr(
            f"try_divide({dot_unrolled_sql(a, b, dims)}, "
            f"sqrt({dot_unrolled_sql(a, a, dims)}) * "
            f"sqrt({dot_unrolled_sql(b, b, dims)}))"
        )
    return F.try_divide(
        dot_unrolled(a, b, dims),
        F.sqrt(dot_unrolled(a, a, dims)) * F.sqrt(dot_unrolled(b, b, dims)),
    )


def probe_dims(df, vec_col: str = "embedding") -> int | None:
    """Array length of ``vec_col`` in the first row — the static dims
    the unrolled kernels compile for (one 1-row job; rows with other
    lengths still compute exactly via the per-row fallback guard).
    None when the relation is empty or the probe fails (callers then
    keep the generic fold path)."""
    try:
        r = df.select(F.size(as_double(F.col(vec_col))).alias("d")).first()
        d = r["d"] if r is not None else None
        return int(d) if d is not None and d > 0 else None
    except Exception:
        return None


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; NULL if either side has zero norm.

    try_divide, not / : under default-ANSI Spark a zero-norm vector
    would throw DIVIDE_BY_ZERO and abort the job instead of honoring
    the documented NULL."""
    return F.try_divide(dot(a, b), norm(a) * norm(b))
