"""THE CORE: declarative table-diff as one Spark logical plan.

Replaces the reference's entire executor machinery — the hand-rolled
streaming merge join over token-ordered key iterators
(RangeComparator.java:58-187), the per-partition row zip-join
(PartitionComparator.java:51-84), and the async comparison pool
(ComparisonExecutor.java:62-124) — with a full-outer join + aggregation
pipeline that Catalyst/AQE physicalizes (sort-merge join, partial+final
hash aggregation, skew handling).

Semantics carried over exactly (SURVEY.md §7.1):
  * 9 counters of RangeStats.java:31-39.
  * "values" counted over regular = all-minus-clustering columns, so the
    partition keys are value-counted too (TableSpec.java:84-87).
  * Partition mismatched  iff  clustering divergence OR mismatched_values>0
    (RangeComparator.java:221-229).
  * Fail-fast: a clustering divergence stops counting inside that partition
    (PartitionComparator.java:60-83) — reproduced positionally in
    ``align="positional"`` via row_number alignment.
  * Disallowed tokens -> skipped counter, checked before sampling; sampler
    rejections are silently uncounted; only-in-source/target keys are
    counted before either filter (RangeComparator.java:125-143).
  * Null-aware value equality (PartitionComparator.java:116-133) -> ``<=>``.

Two alignment modes:
  * ``align="set"`` (default, the scale path): one full-outer join on
    pk+clustering. Exact reference parity whenever clustering keys are
    unique within a partition (guaranteed by the Cassandra data model);
    after a divergence it keeps comparing re-aligned rows instead of
    aborting the partition.
  * ``align="positional"`` (parity path): row_number per side in clustering
    order, join on (pk, rn) — bit-identical to the reference's zip-join on
    its full test matrix, including mid-partition insertions.

Scale notes (100 TB): both modes are single-pass, shuffle only on key
columns, never collect to the driver, and push column pruning/filters to
the scan. Sampling/token predicates can be applied pre-join
(``prefilter=True``) to prune both sides before the shuffle when exact
only-in counting of filtered keys is not required.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import reduce
from typing import Callable, Optional, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from cassandra_diff_spark.model import STAT_FIELDS, TableSpec
from cassandra_diff_spark.functions.keys import token_expr


#: Mismatch classification values (reference: MismatchType.java:22-28 plus
#: the implicit matched/skipped states of RangeComparator.java:201-229).
CAT_MATCHED = "matched"
CAT_MISMATCHED = "mismatched"
CAT_ONLY_IN_SOURCE = "only_in_source"
CAT_ONLY_IN_TARGET = "only_in_target"
CAT_SKIPPED = "skipped"


@dataclass
class DiffResult:
    """Lazy DataFrames; nothing is executed until an action runs."""

    partition_detail: DataFrame  # one row per partition key: category + counters
    mismatches: DataFrame  # journal shape: pk cols + token + mismatch_type
    stats: DataFrame  # single row: table + the 9 RangeStats counters


def _and_all(cols: Sequence[Column]) -> Column:
    return reduce(lambda a, b: a & b, cols) if cols else F.lit(True)


def build_diff(
    src: DataFrame,
    tgt: DataFrame,
    spec: TableSpec,
    *,
    align: str = "set",
    token: Optional[Callable[[Sequence[str]], Column]] = None,
    token_filter: Optional[Callable[[Column], Column]] = None,
    sampler: Optional[Callable[[Column], Column]] = None,
    prefilter: bool = False,
) -> DiffResult:
    """Build the diff plan for one (source, target) table pair.

    token:        fn(pk_cols) -> token Column (default xxhash64).
    token_filter: fn(token Column) -> Boolean Column; False => partition is
                  counted ``skipped`` (SpecificTokens semantics, P5).
    sampler:      fn(token Column) -> Boolean Column; False => partition is
                  silently excluded (SA1 semantics).
    prefilter:    apply sampler/token predicates to both sides BEFORE the
                  join (prunes the shuffle; only-in counting then only sees
                  surviving keys — scale mode, not bit-parity).
    """
    spec.validate_against(src.columns, tgt.columns)
    pk = list(spec.partition_key)
    ck = list(spec.clustering)
    reg = list(spec.regular_columns(src.columns))
    tok_fn = token or token_expr

    if prefilter:
        # scale mode: prune both sides before the shuffle; filtered keys are
        # then invisible to only-in/skipped counting (documented trade-off)
        for p in (token_filter, sampler):
            if p is not None:
                src = src.filter(p(tok_fn(pk)))
                tgt = tgt.filter(p(tok_fn(pk)))
        token_filter = None
        sampler = None

    if align == "set":
        joined = _join_set(src, tgt, pk, ck, reg)
    elif align == "positional":
        joined = _join_positional(src, tgt, pk, ck, reg)
    else:
        raise ValueError(f"align must be 'set' or 'positional', got {align!r}")

    return _classify_and_aggregate(
        joined, spec, pk, reg_count=len(reg), tok_fn=tok_fn,
        token_filter=token_filter, sampler=sampler,
    )


def _prefixed(df: DataFrame, cols: Sequence[str], prefix: str) -> DataFrame:
    return df.select(
        *[F.col(c).alias(f"{prefix}{c}") for c in cols],
        F.lit(True).alias(f"{prefix}present__"),
    )


def _row_value_counts(reg: Sequence[str]) -> Column:
    """Count of regular columns whose values match null-safely
    (reference: checkRegularColumnEquality, PartitionComparator.java:116-133)."""
    if not reg:
        return F.lit(0).cast("long")
    return reduce(
        lambda a, b: a + b,
        [F.col(f"s_{c}").eqNullSafe(F.col(f"t_{c}")).cast("long") for c in reg],
    )


def _join_set(src, tgt, pk, ck, reg) -> DataFrame:
    """Full-outer join on pk+clustering — ONE shuffle per side.

    Reproduces J1 (key-level merge join, RangeComparator.java:106-166) and
    J2/J3 (row/value compare) in a single sort-merge join; Catalyst handles
    the token-ordered streaming the reference hand-codes.
    """
    keys = pk + ck
    cols = keys + [c for c in reg if c not in keys]
    s = _prefixed(src, cols, "s_")
    t = _prefixed(tgt, cols, "t_")
    cond = _and_all([F.col(f"s_{k}").eqNullSafe(F.col(f"t_{k}")) for k in keys])
    j = s.join(t, cond, "full_outer")

    s_present = F.coalesce(F.col("s_present__"), F.lit(False))
    t_present = F.coalesce(F.col("t_present__"), F.lit(False))
    # a row present on both sides is an aligned pair (clusterings equal by
    # join key); a one-sided row inside an in-both partition is a
    # clustering divergence
    return j.select(
        *[F.coalesce(F.col(f"s_{k}"), F.col(f"t_{k}")).alias(k) for k in pk],
        s_present.alias("s_present"),
        t_present.alias("t_present"),
        (s_present & t_present).alias("ck_eq"),
        (s_present & t_present).alias("in_prefix"),  # set mode: no fail-fast cutoff
        F.when(s_present & t_present, _row_value_counts(reg))
        .otherwise(F.lit(0))
        .alias("row_matched_values"),
    )


def _join_positional(src, tgt, pk, ck, reg) -> DataFrame:
    """Positional zip-join parity mode: row_number per side in clustering
    order, full-outer join on (pk, rn), prefix cutoff at the first
    clustering divergence (PartitionComparator.java:60-83 fail-fast)."""
    cols = list(dict.fromkeys(pk + ck + list(reg)))
    # clustering order with a full-row tiebreak: file sources (unlike the
    # Cassandra data model) may hold duplicate clustering keys; ordering by
    # every column keeps row numbering deterministic (identical rows are
    # interchangeable). asc_nulls_first matches CQL/DuckDB NULLS FIRST.
    order_cols = ck + [c for c in cols if c not in ck and c not in pk]
    order = [F.col(c).asc_nulls_first() for c in order_cols]

    def side(df: DataFrame, p: str) -> DataFrame:
        return df.select(
            *[F.col(c).alias(f"{p}{c}") for c in cols],
            F.lit(True).alias(f"{p}present__"),
            F.row_number().over(
                Window.partitionBy(*[F.col(c) for c in pk]).orderBy(*order)
            ).alias(f"{p}rn__"),
        )

    s = side(src, "s_")
    t = side(tgt, "t_")
    cond = _and_all(
        [F.col(f"s_{k}").eqNullSafe(F.col(f"t_{k}")) for k in pk]
        + [F.col("s_rn__") == F.col("t_rn__")]
    )
    j = s.join(t, cond, "full_outer")

    s_present = F.coalesce(F.col("s_present__"), F.lit(False))
    t_present = F.coalesce(F.col("t_present__"), F.lit(False))
    ck_eq = s_present & t_present & _and_all(
        [F.col(f"s_{c}").eqNullSafe(F.col(f"t_{c}")) for c in ck]
    )
    j = j.select(
        *[F.coalesce(F.col(f"s_{k}"), F.col(f"t_{k}")).alias(k) for k in pk],
        F.coalesce(F.col("s_rn__"), F.col("t_rn__")).alias("rn__"),
        s_present.alias("s_present"),
        t_present.alias("t_present"),
        ck_eq.alias("ck_eq"),
        F.when(ck_eq, _row_value_counts(reg)).otherwise(F.lit(0)).alias(
            "row_matched_values"
        ),
    )
    # fail-fast prefix: positions strictly before the first non-matching
    # position are the only ones counted (PartitionComparator.java:67-70)
    wp = Window.partitionBy(*pk)
    fail_rn = F.min(F.when(~F.col("ck_eq"), F.col("rn__"))).over(wp)
    return j.withColumn(
        "in_prefix", fail_rn.isNull() | (F.col("rn__") < fail_rn)
    )


def _classify_and_aggregate(
    joined: DataFrame,
    spec: TableSpec,
    pk: Sequence[str],
    reg_count: int,
    tok_fn,
    token_filter,
    sampler,
) -> DiffResult:
    nreg = F.lit(reg_count).cast("long")
    counted = F.col("ck_eq") & F.col("in_prefix")

    per_part = joined.groupBy(*pk).agg(
        F.max(F.col("s_present").cast("int")).alias("has_src"),
        F.max(F.col("t_present").cast("int")).alias("has_tgt"),
        F.min(F.col("ck_eq").cast("int")).alias("all_ck_eq"),
        F.sum(F.when(counted, 1).otherwise(0)).cast("long").alias("matched_rows"),
        F.sum(F.when(counted, F.col("row_matched_values")).otherwise(0))
        .cast("long")
        .alias("matched_values"),
        F.sum(F.when(counted, nreg - F.col("row_matched_values")).otherwise(0))
        .cast("long")
        .alias("mismatched_values"),
    )

    token_col = tok_fn(pk).alias("token")
    per_part = per_part.withColumn("token", token_col)

    in_both = (F.col("has_src") == 1) & (F.col("has_tgt") == 1)
    skip_pred = (
        ~token_filter(F.col("token")) if token_filter is not None else F.lit(False)
    )
    category = (
        F.when(F.col("has_tgt") == 0, F.lit(CAT_ONLY_IN_SOURCE))
        .when(F.col("has_src") == 0, F.lit(CAT_ONLY_IN_TARGET))
        .when(skip_pred, F.lit(CAT_SKIPPED))
        .when(
            (F.col("all_ck_eq") == 1) & (F.col("mismatched_values") == 0),
            F.lit(CAT_MATCHED),
        )
        .otherwise(F.lit(CAT_MISMATCHED))
    )
    per_part = per_part.withColumn("category", category)

    # sampler: silently exclude unsampled in-both, non-skipped partitions
    # (RangeComparator.java:137-143 — only-in and skipped keys unaffected)
    if sampler is not None:
        per_part = per_part.filter(
            (F.col("category") != CAT_MATCHED)
            & (F.col("category") != CAT_MISMATCHED)
            | sampler(F.col("token"))
        )

    compared = F.col("category").isin(CAT_MATCHED, CAT_MISMATCHED)
    partition_detail = per_part.select(
        *pk,
        "token",
        "category",
        F.when(compared, F.col("matched_rows")).otherwise(0).alias("matched_rows"),
        F.when(compared, F.col("matched_values")).otherwise(0).alias("matched_values"),
        F.when(compared, F.col("mismatched_values"))
        .otherwise(0)
        .alias("mismatched_values"),
        (F.col("all_ck_eq") == 1).alias("all_clusterings_match"),
    )

    mismatches = partition_detail.filter(
        F.col("category").isin(CAT_MISMATCHED, CAT_ONLY_IN_SOURCE, CAT_ONLY_IN_TARGET)
    ).select(
        *pk,
        "token",
        F.when(F.col("category") == CAT_MISMATCHED, F.lit("PARTITION_MISMATCH"))
        .when(F.col("category") == CAT_ONLY_IN_SOURCE, F.lit("ONLY_IN_SOURCE"))
        .otherwise(F.lit("ONLY_IN_TARGET"))
        .alias("mismatch_type"),
    )

    def n(cat: str) -> Column:
        return F.coalesce(
            F.sum(F.when(F.col("category") == cat, 1).otherwise(0)), F.lit(0)
        ).cast("long")

    stats = partition_detail.agg(
        n(CAT_MATCHED).alias("matched_partitions"),
        n(CAT_MISMATCHED).alias("mismatched_partitions"),
        F.lit(0).cast("long").alias("error_partitions"),
        n(CAT_SKIPPED).alias("skipped_partitions"),
        n(CAT_ONLY_IN_SOURCE).alias("only_in_source"),
        n(CAT_ONLY_IN_TARGET).alias("only_in_target"),
        F.coalesce(F.sum("matched_rows"), F.lit(0)).cast("long").alias("matched_rows"),
        F.coalesce(F.sum("matched_values"), F.lit(0))
        .cast("long")
        .alias("matched_values"),
        F.coalesce(F.sum("mismatched_values"), F.lit(0))
        .cast("long")
        .alias("mismatched_values"),
    ).select(F.lit(spec.name).alias("table"), *STAT_FIELDS)

    return DiffResult(
        partition_detail=partition_detail, mismatches=mismatches, stats=stats
    )
