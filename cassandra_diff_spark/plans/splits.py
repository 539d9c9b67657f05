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
