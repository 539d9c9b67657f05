"""Token-range split math — parity with the reference's split planner
(DiffJob.calculateSplits, DiffJob.java:231-303).

In the Spark engine splits are mostly subsumed by shuffle partitioning +
AQE, but the math is kept for (a) journal bucketing, (b) resumable
work-unit planning, and (c) the split-assignment expression used to bucket
keys server-side. Python ints replace the reference's BigInteger
(DiffJob.java:248-266) — arbitrary precision either way.
"""

from __future__ import annotations

from typing import List

from pyspark.sql import Column
from pyspark.sql import functions as F

from cassandra_diff_spark.model import Split

#: Murmur3-ring bounds (TokenHelper.java:26-40)
MURMUR3_MIN = -(2**63)
MURMUR3_MAX = 2**63 - 1
#: Random-partitioner bounds (TokenHelper.java:42-58)
RANDOM_MIN = -1
RANDOM_MAX = 2**127 - 1


def calculate_splits(
    num_splits: int,
    num_buckets: int,
    min_token: int = MURMUR3_MIN,
    max_token: int = MURMUR3_MAX,
) -> List[Split]:
    """Equal-width contiguous splits covering (min_token, max_token],
    split i assigned to bucket ``i % num_buckets``
    (DiffJob.java:246-267; bucket assignment :252).
    """
    if num_splits < 1:
        raise ValueError("num_splits must be >= 1")
    width = (max_token - min_token) // num_splits
    splits = []
    start = min_token
    for i in range(num_splits):
        end = max_token if i == num_splits - 1 else start + width
        splits.append(Split(split_number=i, bucket=i % num_buckets, start=start, end=end))
        start = end
    return splits


def validate_range(start: int, end: int, min_token: int, max_token: int) -> None:
    """Reject null/wrapping/out-of-bounds ranges
    (Differ.validateRange, Differ.java:294-301)."""
    if not (min_token <= start < end <= max_token):
        raise ValueError(
            f"invalid token range ({start}, {end}] for ring [{min_token}, {max_token}]"
        )


def split_assignment(token: Column, num_splits: int, min_token: int, max_token: int) -> Column:
    """Expression assigning each token to its equal-width split number —
    the distributed analog of Split.contains (integer arithmetic only, so
    external SQL oracles can reproduce it)."""
    width = (max_token - min_token) // num_splits
    # decimal(38,0) avoids bigint overflow of (token - min) on the full
    # Murmur3 ring; offset is non-negative so truncation == floor
    off = token.cast("decimal(38,0)") - F.lit(min_token).cast("decimal(38,0)")
    raw = (off / F.lit(width).cast("decimal(38,0)")).cast("bigint")
    return F.least(raw, F.lit(num_splits - 1))


def split_assignment_sql(token_sql: str, num_splits: int, min_token: int, max_token: int) -> str:
    width = (max_token - min_token) // num_splits
    return (
        f"LEAST(CAST((({token_sql}) - ({min_token})) // {width} AS BIGINT), "
        f"{num_splits - 1})"
    )


def balanced_split_report(
    df,
    pk,
    num_splits: int,
    *,
    grid: int = 4096,
    token=None,
    min_token: int = MURMUR3_MIN,
    max_token: int = MURMUR3_MAX,
):
    """DATA-DRIVEN split planning: where :func:`calculate_splits` cuts the
    ring into equal-WIDTH ranges (DiffJob.java:246-267 — balanced only if
    keys hash uniformly), this plans splits with near-equal ROW counts
    from the table's actual token histogram: one keys-only scan
    aggregates row counts over a ``grid``-cell equal-width grid
    (map-side combined, <= grid rows out), then cells are assigned to
    splits by exclusive-cumulative count — integer arithmetic end to
    end, so an external SQL oracle reproduces the plan bit for bit.

    Returns one row per non-empty split: ``(split_number, start_cell,
    end_cell, planned_rows)`` — cell indices on the grid; use
    :func:`balanced_splits` for contiguous ring ranges. Balance
    resolution is a grid cell: a single cell holding more than
    total/num_splits rows (a mega-hot token range) cannot be subdivided
    — raise ``grid`` for finer placement; the planning scan stays
    kilobyte-scale output regardless.
    """
    from pyspark.sql import Window
    from cassandra_diff_spark.functions.keys import token_expr

    tok = (token or token_expr)(list(pk))
    cell = split_assignment(tok, grid, min_token, max_token)
    counts = (
        df.select(cell.alias("cell"))
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # <= grid rows from here on: the single-partition windows are over
    # the kilobyte-scale histogram, never the data
    w_all = Window.partitionBy()
    w_cum = Window.orderBy("cell").rowsBetween(Window.unboundedPreceding, -1)
    return (
        counts.withColumn("total", F.sum("n").over(w_all))
        .withColumn("cum_ex", F.coalesce(F.sum("n").over(w_cum), F.lit(0)))
        .withColumn(
            "split_number",
            F.least(
                F.lit(num_splits - 1),
                F.expr(f"(cum_ex * {num_splits}) div total"),
            ).cast("long"),
        )
        .groupBy("split_number")
        .agg(
            F.min("cell").cast("long").alias("start_cell"),
            F.max("cell").cast("long").alias("end_cell"),
            F.sum("n").cast("long").alias("planned_rows"),
        )
    )


def balanced_splits(
    df,
    pk,
    num_splits: int,
    num_buckets: int,
    *,
    grid: int = 4096,
    token=None,
    min_token: int = MURMUR3_MIN,
    max_token: int = MURMUR3_MAX,
) -> List[Split]:
    """Contiguous :class:`Split` ranges from :func:`balanced_split_report`
    — same (start, end] semantics as :func:`calculate_splits`, boundaries
    placed at grid-cell edges so each split carries a near-equal share of
    the table's ROWS. The full ring stays covered: split 0 starts at
    ``min_token``, the last ends at ``max_token``, and interior
    boundaries fall after each split's last non-empty cell."""
    rows = sorted(
        balanced_split_report(
            df, pk, num_splits, grid=grid, token=token,
            min_token=min_token, max_token=max_token,
        ).collect(),
        key=lambda r: r.split_number,
    )
    width = (max_token - min_token) // grid
    splits: List[Split] = []
    start = min_token
    for i, r in enumerate(rows):
        if i == len(rows) - 1:
            end = max_token
        else:
            # ring edge AFTER this split's last non-empty cell
            end = min_token + (r.end_cell + 1) * width
        splits.append(
            Split(
                split_number=len(splits),
                bucket=len(splits) % num_buckets,
                start=start,
                end=end,
            )
        )
        start = end
    return splits


def key_skew_report(df, pk, top_n: int = 20, *, token=None):
    """Partition-skew diagnostic — what you run BEFORE choosing
    ``skew_safe`` or salting: the ``top_n`` heaviest partition keys by
    row count, with each key's share of the table in parts-per-million.
    One map-side-combined groupBy on the key columns; the global sort
    ranks only the aggregated key counts (AQE handles the rest)."""
    counts = df.groupBy(*pk).agg(F.count(F.lit(1)).alias("n_rows"))
    from pyspark.sql import Window

    total = F.sum("n_rows").over(Window.partitionBy())
    return (
        counts.withColumn("total__", total)
        .withColumn(
            "ppm", F.expr("(n_rows * 1000000) div total__").cast("long")
        )
        .orderBy(F.col("n_rows").desc(), *[F.col(c).asc() for c in pk])
        .limit(top_n)
        .select(*pk, F.col("n_rows").cast("long"), "ppm")
    )
