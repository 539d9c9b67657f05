"""Skew-safe joins: salting for hot keys.

A shuffle join hashes rows to tasks BY KEY, so one pathologically hot key
(the null-ish user id, the default domain, the empty document) serializes
into one straggler task no matter how many executors exist — the classic
100 TB failure mode. AQE's skew-join handles sort-merge SPLITS of an
oversized partition, but only when statistics see it (post-shuffle, same
stage) and not for aggregation-feeding joins planned otherwise.
:func:`salted_join` is the explicit fix: the skewed (big) side spreads
each key over ``salt`` sub-keys, the other side replicates each row
``salt`` times, and the join runs on ``(key, salt)`` — the hot key's rows
now land on ``salt`` tasks. Results are EXACTLY a plain join: every big-
side row carries ONE salt value and meets exactly the one matching
replica of each small-side row (the oracle-paired gate asserts equality).

Cost model: the replicated side ships ``salt`` copies through its
exchange — use :func:`~pyspark.sql.functions.broadcast` instead when the
small side fits in memory (replication x broadcast is pointless); salting
earns its keep when the small side is too big to broadcast but ``salt``
copies of it still beat one straggler task holding the hot key.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: internal salt column name (never visible in output)
SALT_COL = "__salt"


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: Sequence[str],
    *,
    how: str = "inner",
    salt: int = 16,
) -> DataFrame:
    """Join ``skewed`` (the big side with hot keys) to ``other`` on the
    ``on`` columns, spread over ``salt`` sub-partitions per key. Output
    columns and rows are identical to ``skewed.join(other, on, how)``;
    only the physical distribution differs (the exchange hashes
    ``on + [salt]``, so a hot key parallelizes ``salt``-ways).

    ``how``: ``inner`` or ``left`` (outer semantics on the REPLICATED
    side would need a post-dedup — use a plain join there).

    The salt is a deterministic hash of the skewed row's full column set
    (uniform even when the join key is constant); any per-row value
    works — correctness never depends on it, because each skewed row
    holds exactly one salt value and meets exactly the one matching
    replica of each ``other`` row.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    on = list(on)
    if int(salt) < 1:
        raise ValueError(f"salt must be >= 1, got {salt}")
    # xxhash64 rejects map columns; hash the hashable subset (results
    # never depend on the salt's value — see the docstring — only its
    # spread), falling back to a per-task row counter when nothing is
    # hashable
    hashable = [
        c for c, t in skewed.dtypes if not t.startswith("map<")
    ]
    salt_val = (
        F.pmod(F.xxhash64(*[F.col(c) for c in hashable]), F.lit(int(salt)))
        if hashable
        else F.pmod(F.monotonically_increasing_id(), F.lit(int(salt)))
    )
    s = skewed.withColumn(SALT_COL, salt_val)
    o = other.withColumn(
        SALT_COL,
        F.explode(F.array(*[F.lit(i).cast("long") for i in range(int(salt))])),
    )
    return s.join(o, on=on + [SALT_COL], how=how).drop(SALT_COL)


def join_explosion_profile(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    *,
    top_n: int = 20,
) -> DataFrame:
    """Pre-flight cost profile of an equi-join: the EXACT number of
    output rows each key would produce, for the ``top_n`` worst keys —
    the "is this join about to emit 10^15 rows / serialize into one
    straggler" check you run BEFORE a 100 TB join, priced at two
    count-aggregations instead of the join itself.

    For each join key, ``out_rows = n_left * n_right`` exactly (inner
    join semantics; NULL keys never match and are excluded). The two
    count frames are |distinct keys|-sized — their join shuffles key
    counts, never data rows. Output: ``(*keys, n_left, n_right,
    out_rows)``, the ``top_n`` largest by ``(out_rows, keys)`` — the
    deterministic tiebreak makes the cutoff reproducible.

    Reading the result: a hot ``out_rows`` >> the rest means salt that
    key (:func:`salted_join`) or pre-aggregate one side; a TOTAL far
    above both input sizes means the keys are not what you thought
    (fan-out join bug). Use :func:`join_explosion_summary` for the
    one-row totals.
    """
    keys = list(keys)
    if not keys:
        raise ValueError("need at least one join key")
    lc = (
        left.dropna(subset=keys)
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n_left"))
    )
    rc = (
        right.dropna(subset=keys)
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n_right"))
    )
    prof = lc.join(rc, keys, "inner").select(
        *keys,
        "n_left",
        "n_right",
        (F.col("n_left") * F.col("n_right")).alias("out_rows"),
    )
    return prof.orderBy(
        F.col("out_rows").desc(), *[F.col(k).asc() for k in keys]
    ).limit(int(top_n))


def join_explosion_summary(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
) -> DataFrame:
    """One-row totals for the pre-flight: ``(matching_keys,
    total_out_rows, max_key_out_rows)`` — exact inner-join output size
    and the worst single key's contribution, from the same two count
    aggregations as :func:`join_explosion_profile`."""
    keys = list(keys)
    if not keys:
        raise ValueError("need at least one join key")
    lc = (
        left.dropna(subset=keys)
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n_left"))
    )
    rc = (
        right.dropna(subset=keys)
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n_right"))
    )
    per = lc.join(rc, keys, "inner").select(
        (F.col("n_left") * F.col("n_right")).alias("__o")
    )
    return per.agg(
        F.count(F.lit(1)).alias("matching_keys"),
        F.coalesce(F.sum("__o"), F.lit(0)).cast("long").alias("total_out_rows"),
        F.coalesce(F.max("__o"), F.lit(0)).cast("long").alias("max_key_out_rows"),
    )
