"""Mergeable distinct-count sketches (Apache DataSketches HLL, built
into Spark): the incremental-cardinality path for a partitioned 100 TB
corpus.

Why sketches and not ``approx_count_distinct``: a sketch is a VALUE —
a few KB of binary state you can persist per shard/day/source and
MERGE later. New data means sketching only the new shard and unioning
it with the stored state; the historical corpus is never rescanned.
``approx_count_distinct`` answers once and leaves nothing to build on.

All kernels are JVM aggregate functions (``hll_sketch_agg`` /
``hll_union_agg`` / ``hll_sketch_estimate``) — map-side combinable,
bytes-per-group state, no Python in the path. Merge exactness:
unioning per-shard sketches of the same ``lg_k`` yields the SAME
estimate as sketching everything in one pass (the HLL union is
lossless at equal lg_k) — pytest asserts equality, the gate asserts
accuracy against the exact count.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def sketch_distinct(
    df: DataFrame,
    cols: Sequence[str],
    *,
    by: Optional[Sequence[str]] = None,
    lg_k: int = 12,
) -> DataFrame:
    """Per-group HLL sketches of each column's distinct values:
    ``(*by, col_<c>_sketch binary, ...)`` — one map-side-combined
    aggregation pass, a few KB per (group, column). Persist this frame
    (e.g. per ingest batch / day / shard) and fold new batches in with
    :func:`merge_sketches`; :func:`sketch_estimates` reads cardinalities
    out at any time without touching data."""
    by = list(by) if by else []
    aggs = [
        F.hll_sketch_agg(F.col(c).cast("string"), int(lg_k)).alias(
            f"{c}_sketch"
        )
        for c in cols
    ]
    return df.groupBy(*by).agg(*aggs)


def merge_sketches(
    sketches: DataFrame,
    cols: Sequence[str],
    *,
    by: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Union sketch rows (shards/batches/days) down to one sketch per
    ``by`` group — the ROLLUP. Lossless at equal ``lg_k``: the merged
    sketch is identical to one built over the union of the inputs, so
    incremental maintenance costs nothing in accuracy."""
    by = list(by) if by else []
    aggs = [
        F.hll_union_agg(F.col(f"{c}_sketch"), True).alias(f"{c}_sketch")
        for c in cols
    ]
    return sketches.groupBy(*by).agg(*aggs)


def sketch_estimates(
    sketches: DataFrame,
    cols: Sequence[str],
    *,
    by: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Read distinct-count estimates out of sketch rows: ``(*by,
    n_distinct_<c> long, ...)`` — a kilobyte-scale projection, no data
    scan."""
    by = list(by) if by else []
    return sketches.select(
        *by,
        *[
            F.hll_sketch_estimate(F.col(f"{c}_sketch")).alias(f"n_distinct_{c}")
            for c in cols
        ],
    )


def heavy_hitters(
    df: DataFrame,
    col: str,
    threshold_frac: float,
    capacity: Optional[int] = None,
) -> DataFrame:
    """Exact frequent-item detection without shuffling the key space.

    Two passes:

    1. a per-partition **Misra-Gries summary** (capacity ``k =
       ceil(1/threshold_frac)``) built in one ``mapInPandas`` sweep using
       the mergeable-summaries rule (add counts, then subtract the
       (k+1)-st largest and drop non-positives).  Per-partition error is
       <= n_part/(k+1), so the union of summaries provably contains EVERY
       value with global frequency >= threshold_frac (> n/(k+1));
       the shuffle carries at most ``k`` candidates per partition, never
       the full key cardinality;
    2. an exact count of the candidate values only (broadcast semi-join +
       map-side-combined groupBy), filtered at ``cnt >=
       ceil(threshold_frac * total)``.

    The superset guarantee makes the output EXACTLY the heavy-hitter set
    a full groupBy would return — but at 100 TB with billions of distinct
    keys, pass 1 bounds the shuffle at k x partitions rows.  Nulls are
    ignored.  Output: ``(col, cnt, share_ppm)``.
    """
    import math

    k = capacity or max(int(math.ceil(1.0 / threshold_frac)), 1)
    src = df.select(F.col(col).alias("v")).filter(F.col("v").isNotNull())
    out_schema = src.schema

    def mg(batches):
        import pandas as pd

        counts: dict = {}
        for pdf in batches:
            for v, c in pdf["v"].value_counts(dropna=True).items():
                counts[v] = counts.get(v, 0) + int(c)
            if len(counts) > k:
                sub = sorted(counts.values(), reverse=True)[k]
                counts = {v: c - sub for v, c in counts.items() if c > sub}
        yield pd.DataFrame({"v": list(counts.keys())})

    cand = src.mapInPandas(mg, schema=out_schema).distinct()
    total = src.agg(F.count(F.lit(1)).alias("__total"))
    exact = (
        src.join(F.broadcast(cand), "v", "left_semi")
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        exact.crossJoin(F.broadcast(total))
        .filter(F.col("cnt") >= F.ceil(F.lit(threshold_frac) * F.col("__total")))
        .select(
            F.col("v").alias(col),
            F.col("cnt").cast("long").alias("cnt"),
            F.floor(F.lit(1_000_000) * F.col("cnt") / F.col("__total"))
            .cast("long")
            .alias("share_ppm"),
        )
    )


def key_overlap_estimate(
    a: DataFrame,
    b: DataFrame,
    col_a: str,
    col_b: Optional[str] = None,
    *,
    lg_k: int = 12,
) -> DataFrame:
    """Set overlap of two tables' key columns WITHOUT a join: sketch
    each side (one agg scan per table, map-side combinable), union the
    two kilobyte sketches, and estimate the intersection by
    inclusion-exclusion ``|A∩B| ≈ |A| + |B| - |A∪B|`` — the "how much
    do these two 100 TB key sets overlap" pre-flight at sketch cost
    (plan a diff, size a migration, detect a disjoint-keys join bug
    before paying for the join).

    Returns ONE row: ``(n_a, n_b, n_union, n_intersection,
    jaccard_milli)`` — all estimates (doubles; jaccard floored to
    integer milli). Error: each HLL estimate carries ~1.6% relative
    standard error at the default ``lg_k=12``; the inclusion-exclusion
    difference inherits error on the UNION's scale, so a small true
    intersection of two huge sets is noisy — raise ``lg_k`` (4 bytes x
    2^lg_k state) when the overlap, not the sizes, is the question.
    NULL keys are excluded on both sides.
    """
    ca = col_a
    cb = col_b or col_a
    sa = (
        a.filter(F.col(ca).isNotNull())
        .agg(F.hll_sketch_agg(F.col(ca).cast("string"), int(lg_k)).alias("__sk"))
    )
    sb = (
        b.filter(F.col(cb).isNotNull())
        .agg(F.hll_sketch_agg(F.col(cb).cast("string"), int(lg_k)).alias("__sk"))
    )
    un = (
        sa.unionByName(sb)
        .agg(F.hll_union_agg(F.col("__sk"), True).alias("__u"))
        .select(F.hll_sketch_estimate("__u").alias("n_union"))
    )
    est = (
        sa.select(F.hll_sketch_estimate("__sk").alias("n_a"))
        .crossJoin(sb.select(F.hll_sketch_estimate("__sk").alias("n_b")))
        .crossJoin(un)
    )
    inter = F.greatest(F.lit(0.0), F.col("n_a") + F.col("n_b") - F.col("n_union"))
    return est.select(
        "n_a",
        "n_b",
        "n_union",
        inter.alias("n_intersection"),
        F.floor(F.lit(1000.0) * inter / F.col("n_union"))
        .cast("long")
        .alias("jaccard_milli"),
    )
