"""Vector expressions over ``array<float>`` embedding columns.

Exact-arithmetic discipline for cross-engine checkability: embeddings are
quantized to integer milli-units (round(x*1000)), so dot products and
squared norms are exact BIGINTs; cosine = dot / sqrt(na*nb) is then a
deterministic double (same integer inputs -> same IEEE ops -> same bits in
every engine).

All JVM-side (``F.zip_with`` / ``F.aggregate`` higher-order functions) —
no Python UDFs in the hot path. A Pandas-UDF variant for batched NumPy
kernels lives in operators/similarity.py for the cases where per-row
expressions lose to BLAS.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

QUANT = 1000


def quantize(col: Column) -> Column:
    """array<float> -> array<bigint> in milli-units. The float is widened
    to double BEFORE scaling so every engine rounds the same value."""
    return F.transform(col, lambda x: F.round(x.cast("double") * QUANT).cast("long"))


def quantize_sql(expr: str) -> str:
    return f"[CAST(ROUND(CAST(x AS DOUBLE) * {QUANT}) AS BIGINT) for x in {expr}]"


def int_dot(a: Column, b: Column) -> Column:
    """Exact integer dot product of two quantized vectors."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def int_dot_sql(a: str, b: str) -> str:
    # element-wise product then exact integer sum
    return (
        f"CAST(list_sum([({a})[i] * ({b})[i] "
        f"for i in range(1, len({a}) + 1)]) AS BIGINT)"
    )


def sq_norm(a: Column) -> Column:
    return int_dot(a, a)


def cosine_from_int(dot: Column, na: Column, nb: Column) -> Column:
    """Deterministic double cosine from exact integer dot + squared norms."""
    return dot.cast("double") / F.sqrt(na.cast("double") * nb.cast("double"))


def cosine_from_int_sql(dot: str, na: str, nb: str) -> str:
    return f"(CAST({dot} AS DOUBLE) / sqrt(CAST({na} AS DOUBLE) * CAST({nb} AS DOUBLE)))"
