"""Cassandra RandomPartitioner tokens — the 2^127-wide ring (F1
completion for the RANDOM partitioner, reference TokenHelper.java:42-58).

Definition (public Cassandra spec): token = abs(BigInteger(md5(key))) —
the 16 md5 digest bytes read as a SIGNED big-endian 128-bit integer,
absolute value, giving tokens in [0, 2^127]. The ring bounds the
reference exposes are [-1, 2^127 - 1] (start-exclusive convention).

Spark has no 128-bit integer type (decimal tops out at 38 digits; the
ring needs 39), so tokens are carried as 39-digit ZERO-PADDED DECIMAL
STRINGS: lexicographic order on equal-length zero-padded non-negative
decimals equals numeric order, so range predicates, ordering, and
equality all work as plain string comparisons JVM-side. Token math
(hashing, split assignment) runs in Arrow-batched Python where ints are
arbitrary-precision — the same opt-in-parity trade as the Murmur3
partitioner (functions/murmur3.py).

Oracle story: for TEXT partition keys the CQL serialization is the utf-8
string itself, so DuckDB's md5(VARCHAR) sees the same bytes and the
whole token pipeline is SQL-reproducible with HUGEINT (128-bit) math —
see random_token_sql. Binary-serialized key types (bigint etc.) hash
identically here but DuckDB cannot md5 a BLOB, so they are covered by
pytest against the hashlib definition instead.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

from cassandra_diff_spark.functions.murmur3 import serialize_pk

#: Ring bounds (TokenHelper.java:42-58); 39 decimal digits carry 2^127.
RANDOM_MIN = -1
RANDOM_MAX = 2**127 - 1
TOKEN_WIDTH = 39


def random_token_of_bytes(data: bytes) -> int:
    """abs(signed 128-bit big-endian md5 digest) — the RandomPartitioner
    token of a serialized partition key."""
    return abs(int.from_bytes(hashlib.md5(data).digest(), "big", signed=True))


def pad_token(token: int) -> str:
    """Zero-padded fixed-width decimal form (lexicographic == numeric)."""
    if token < 0:
        raise ValueError("RandomPartitioner tokens are non-negative")
    return str(token).zfill(TOKEN_WIDTH)


def random_token(cols: list[str], cql_types: list[str]) -> Column:
    """DataFrame column of RandomPartitioner tokens (39-digit zero-padded
    strings) over the partition-key columns, serialized per CQL type —
    composite keys use the CompositeType envelope, exactly as the
    Murmur3 path does."""
    from pyspark.sql.functions import pandas_udf

    types = list(cql_types)

    @pandas_udf("string")
    def tok(*series: pd.Series) -> pd.Series:
        return pd.Series(
            [
                pad_token(random_token_of_bytes(serialize_pk(vals, types)))
                for vals in zip(*series)
            ]
        )

    return tok(*[F.col(c) for c in cols])


def random_split_assignment(token: Column, num_splits: int) -> Column:
    """Split number of a RandomPartitioner token under the equal-width
    grid of ``calculate_splits(n, b, RANDOM_MIN, RANDOM_MAX)``: split i
    covers (i*width - 1, (i+1)*width - 1], i.e. token // width capped at
    n-1 — 128-bit division, Arrow-batched."""
    from pyspark.sql.functions import pandas_udf

    width = (RANDOM_MAX - RANDOM_MIN) // num_splits
    cap = num_splits - 1

    @pandas_udf("long")
    def assign(s: pd.Series) -> pd.Series:
        return pd.Series(
            [min(int(t) // width, cap) for t in s], dtype="int64"
        )

    return assign(token)


def random_token_range_predicate(
    token: Column, start: int | None, end: int | None
) -> Column:
    """Half-open range ``start < token <= end`` on the 2^127 ring via
    zero-padded string comparison (DiffCluster.java:226-227 semantics).
    ``start=RANDOM_MIN`` (-1) is below every token and drops the lower
    bound rather than comparing a negative against padded strings."""
    pred = F.lit(True)
    if start is not None and start >= 0:
        pred = pred & (token > F.lit(pad_token(start)))
    if end is not None:
        pred = pred & (token <= F.lit(pad_token(end)))
    return pred


def random_token_sql(key_expr: str) -> str:
    """DuckDB twin of :func:`random_token` for a TEXT partition key
    (utf-8 serialization == the string): md5 hex split into two unsigned
    64-bit halves, recombined as a signed-128 absolute value in HUGEINT,
    zero-padded to 39 digits."""
    two64 = "18446744073709551616::HUGEINT"
    return f"""lpad((
      CASE WHEN ('0x' || substr(md5({key_expr}), 1, 16))::UBIGINT::HUGEINT
                < 9223372036854775808::HUGEINT
        THEN ('0x' || substr(md5({key_expr}), 1, 16))::UBIGINT::HUGEINT * {two64}
             + ('0x' || substr(md5({key_expr}), 17, 16))::UBIGINT::HUGEINT
        ELSE (18446744073709551615::UBIGINT
              - ('0x' || substr(md5({key_expr}), 1, 16))::UBIGINT)::HUGEINT * {two64}
             + ({two64} - ('0x' || substr(md5({key_expr}), 17, 16))::UBIGINT::HUGEINT)
      END)::VARCHAR, {TOKEN_WIDTH}, '0')"""


def random_split_assignment_sql(token_sql_expr: str, num_splits: int) -> str:
    """DuckDB twin of :func:`random_split_assignment` (HUGEINT division
    of the unpadded token)."""
    width = (RANDOM_MAX - RANDOM_MIN) // num_splits
    return (
        f"CAST(LEAST(({token_sql_expr})::HUGEINT // {width}::HUGEINT, "
        f"{num_splits - 1}) AS BIGINT)"
    )
