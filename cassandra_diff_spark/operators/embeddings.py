"""Embedding-distribution profiling: centroids and drift — the
monitoring layer over an embedding corpus (did this source's vectors
move after the encoder update? is the new crawl's distribution the
old one's?).

Exact-arithmetic discipline (the same rule as the ANN family): vectors
quantize to integer milli-units, so per-dimension SUMS are exact
BIGINTs — order-independent, map-side-combinable, and bit-identical in
any engine; each mean is then ONE double division of exact integers.

Scale shape: :func:`embedding_centroids` is a single aggregation scan
with ``dim`` fused integer-sum expressions over the quantized array —
the token is never exploded into ``n * dim`` shuffle rows (the naive
``posexplode -> groupBy(group, dim)`` shape multiplies the shuffle by
the dimension; at 100 TB that is the whole job). The output is
``|groups| * dim`` rows — kilobytes — and every downstream comparison
(:func:`centroid_shift`) runs on that.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cassandra_diff_spark.functions.vectors import QUANT, quantize


def embedding_centroids(
    df: DataFrame,
    vec_col: str,
    *,
    dim: int,
    by: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Per-group centroid in long form: ``(*by, dim, sum_q, n, mean)``
    where ``sum_q`` is the EXACT integer milli-unit component sum,
    ``n`` the vector count, and ``mean = sum_q / (n * 1000)`` — one
    deterministic double division per component.

    One scan, one map-side-combined shuffle of ``dim`` fused sums; the
    quantized array materializes once per row. Null vectors are
    excluded; rows whose vector is shorter than ``dim`` would sum nulls
    and are rejected loudly instead (``element_at`` past the end).
    """
    by = list(by) if by else []
    sel = df.filter(F.col(vec_col).isNotNull()).filter(
        F.size(F.col(vec_col)) >= int(dim)
    )
    q = sel.select(*by, quantize(F.col(vec_col)).alias("__q"))
    aggs = [F.count(F.lit(1)).alias("n")] + [
        F.sum(F.element_at(F.col("__q"), d + 1)).alias(f"__s{d}")
        for d in range(int(dim))
    ]
    g = q.groupBy(*by).agg(*aggs)
    return g.select(
        *by,
        "n",
        F.posexplode(F.array(*[F.col(f"__s{d}") for d in range(int(dim))]))
        .alias("dim", "sum_q"),
    ).select(
        *by,
        "dim",
        F.col("sum_q").cast("long").alias("sum_q"),
        F.col("n").cast("long").alias("n"),
        (
            F.col("sum_q").cast("double")
            / (F.col("n").cast("double") * F.lit(float(QUANT)))
        ).alias("mean"),
    )


def centroid_shift(
    cur: DataFrame,
    ref: DataFrame,
    *,
    by: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Per-group drift between two centroid frames (both in
    :func:`embedding_centroids` long form): ``(*by, cos_sim, l2_shift,
    n_cur, n_ref)``.

    * ``cos_sim``: cosine between the two MEAN vectors (computed from
      the exact integer sums — scale-invariant, so sums stand in for
      means with no extra rounding until the final doubles);
    * ``l2_shift``: euclidean distance between the mean vectors.

    Runs entirely on the kilobyte centroid frames — no data rescans:
    compare tonight's drop against a persisted reference centroid table
    to alert on encoder or distribution drift.
    """
    by = list(by) if by else []
    a = cur.select(*by, "dim", F.col("mean").alias("__ma"),
                   F.col("n").alias("n_cur"))
    b = ref.select(*by, "dim", F.col("mean").alias("__mb"),
                   F.col("n").alias("n_ref"))
    j = a.join(b, by + ["dim"])
    return j.groupBy(*by).agg(
        (
            F.sum(F.col("__ma") * F.col("__mb"))
            / F.sqrt(
                F.sum(F.col("__ma") * F.col("__ma"))
                * F.sum(F.col("__mb") * F.col("__mb"))
            )
        ).alias("cos_sim"),
        F.sqrt(
            F.sum(
                (F.col("__ma") - F.col("__mb"))
                * (F.col("__ma") - F.col("__mb"))
            )
        ).alias("l2_shift"),
        F.max("n_cur").alias("n_cur"),
        F.max("n_ref").alias("n_ref"),
    )


def fold_centroids(
    a: DataFrame,
    b: DataFrame,
    *,
    by: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Fold two centroid frames (long form) into one — incremental
    centroid maintenance: integer component sums and counts are
    ADDITIVE, so folding a new batch's centroids into the persisted
    table equals rebuilding over the union exactly, without re-reading
    history. Output schema == :func:`embedding_centroids`."""
    by = list(by) if by else []
    cols = by + ["dim", "sum_q", "n"]
    u = a.select(*cols).unionByName(b.select(*cols))
    from cassandra_diff_spark.functions.vectors import QUANT

    return (
        u.groupBy(*by, "dim")
        .agg(F.sum("sum_q").alias("sum_q"), F.sum("n").alias("n"))
        .select(
            *by,
            "dim",
            F.col("sum_q").cast("long").alias("sum_q"),
            F.col("n").cast("long").alias("n"),
            (
                F.col("sum_q").cast("double")
                / (F.col("n").cast("double") * F.lit(float(QUANT)))
            ).alias("mean"),
        )
    )
