"""Structured-data privacy for training pipelines: deterministic
pseudonymization (surrogate keys that preserve referential integrity
across tables and runs) and k-anonymity auditing (which
quasi-identifier combinations are rare enough to re-identify someone).

The text-side PII scrub (functions/text.py) handles free text; these
operators handle the STRUCTURED columns — customer keys, emails-as-
columns, account ids — that a corpus's metadata tables carry.

Determinism discipline: pseudonyms are a pure function of
(secret, value), so the same value maps to the same token in every
table, shard, and engine — joins still work after pseudonymization,
and the DuckDB oracle reproduces the tokens bit-for-bit. Rotating the
secret rotates every token (the unlinkability lever).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pseudonymize(
    df: DataFrame,
    cols: Sequence[str],
    secret: str,
    keep_null: bool = True,
) -> DataFrame:
    """Replace each listed column with a keyed deterministic surrogate:
    the first 15 hex chars of ``md5(secret || ':' || value)`` — a
    60-bit token as a type-uniform STRING regardless of the input type.
    Equal values get equal tokens — foreign-key joins between
    pseudonymized tables keep working — while the secret keys the
    mapping (no rainbow table without it).

    NULLs stay NULL by default (``keep_null=False`` tokenizes them as
    the literal 'null' sentinel instead, hiding WHICH rows were null at
    the cost of making all nulls one group).

    MAP-ONLY: one expression per column, no shuffle, no lookup table to
    build or leak. This is pseudonymization, not anonymization —
    combine with :func:`k_anonymity_report` to audit what the remaining
    quasi-identifiers still reveal.
    """
    if not cols:
        raise ValueError("pseudonymize needs at least one column")
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"columns not in frame: {missing}")
    out = df
    for c in cols:
        val = F.col(c).cast("string")
        if not keep_null:
            val = F.coalesce(val, F.lit("null"))
        tok = F.substring(
            F.md5(F.concat(F.lit(secret), F.lit(":"), val)), 1, 15
        )
        # keep_null: concat with NULL is NULL, md5(NULL) is NULL — the
        # token is already NULL without an explicit branch
        out = out.withColumn(c, tok)
    return out


def k_anonymity_report(
    df: DataFrame,
    quasi_cols: Sequence[str],
    k: int,
) -> DataFrame:
    """Which quasi-identifier combinations occur fewer than ``k`` times
    — the re-identification audit to run BEFORE releasing a dataset:
    a (zip, birth-year, gender) combination shared by 2 rows is a
    fingerprint, not an aggregate. NULL is a real value of a quasi
    column (two all-null rows are the same combination).

    Returns one row per violating combination:
    ``(*quasi_cols, n)`` with ``n < k``, smallest groups first being
    the most identifying (ordering left to the consumer — the frame is
    unordered like every other operator output).

    Scale shape: ONE map-side-combined groupBy at combination
    cardinality, then a filter — the same cost as any profile
    aggregation; no window, no join.
    """
    quasi_cols = list(quasi_cols)
    if not quasi_cols:
        raise ValueError("k_anonymity_report needs at least one quasi column")
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    return (
        df.groupBy(*quasi_cols)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") < k)
    )


def suppress_to_k(
    df: DataFrame,
    quasi_cols: Sequence[str],
    k: int,
) -> DataFrame:
    """Enforce k-anonymity by suppression — the baseline release
    transform: drop every row whose quasi-identifier combination occurs
    fewer than ``k`` times, so each surviving row hides among at least
    ``k-1`` identical-looking others. (Generalization — coarsening
    values instead of dropping rows — preserves more data; compose
    ``F.year``/bucketing projections upstream and re-audit.)

    NULL is a real quasi value (the :func:`k_anonymity_report`
    convention), so the suppression join is NULL-SAFE — an all-null
    combination seen once is still a fingerprint and still drops.

    Scale shape: one combination-cardinality groupBy (the audit) +
    one broadcast-able null-safe anti-join of the violating
    combinations against the data; columns pass through untouched.
    """
    quasi_cols = list(quasi_cols)
    bad = k_anonymity_report(df, quasi_cols, k).select(
        *[F.col(c).alias(f"__v_{c}") for c in quasi_cols]
    )
    cond = None
    for c in quasi_cols:
        e = df[c].eqNullSafe(bad[f"__v_{c}"])
        cond = e if cond is None else (cond & e)
    return df.join(F.broadcast(bad), cond, "left_anti")


def l_diversity_report(
    df: DataFrame,
    quasi_cols: Sequence[str],
    sensitive_col: str,
    l: int,
) -> DataFrame:
    """Which quasi-identifier groups carry fewer than ``l`` DISTINCT
    sensitive values — the audit k-anonymity misses (Machanavajjhala et
    al. 2007): a group of 500 rows hides its members perfectly, yet if
    every row shares one diagnosis the attacker learns it without
    singling anyone out. NULL is a real value on both sides (an
    all-null sensitive column is ONE value — maximally homogeneous).

    One row per violating group:
    ``(*quasi_cols, n, n_sensitive)`` with ``n_sensitive < l``.

    Scale shape: ONE groupBy at combination cardinality with an exact
    count_distinct on the sensitive column (Spark's Expand doubles the
    shuffle rows — acceptable here because the frame is the AUDITED
    table, and exactness is the point of an audit; the HLL profilers
    cover the approximate tier).
    """
    quasi_cols = list(quasi_cols)
    if not quasi_cols:
        raise ValueError("l_diversity_report needs at least one quasi column")
    if sensitive_col in quasi_cols:
        raise ValueError(
            f"sensitive column {sensitive_col!r} cannot also be a quasi column"
        )
    if l < 2:
        raise ValueError(f"l must be >= 2, got {l}")
    # count_distinct ignores NULLs — add the null presence back so NULL
    # counts as a value (the stated contract)
    has_null = F.max(
        F.when(F.col(sensitive_col).isNull(), 1).otherwise(0)
    )
    return (
        df.groupBy(*quasi_cols)
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.count_distinct(F.col(sensitive_col)) + has_null)
            .cast("long")
            .alias("n_sensitive"),
        )
        .filter(F.col("n_sensitive") < l)
    )


def t_closeness_report(
    df: DataFrame,
    quasi_cols: Sequence[str],
    sensitive_col: str,
) -> DataFrame:
    """Per-group t-closeness (Li et al. 2007) — the third classic
    privacy audit after :func:`k_anonymity_report` and
    :func:`l_diversity_report`: even a diverse group leaks when its
    sensitive DISTRIBUTION differs sharply from the table's (a group
    skewed to the top salary band reveals "these people earn a lot").
    Distance is the ordered-category earth-mover's distance

        ``t = (1/(k-1)) · Σ_i |cumP(i) - cumQ(i)|``

    (P = group distribution, Q = global; bands ordered by the sensitive
    value's natural sort — pass an ordered band column like
    l_diversity's price_band). EXACT integers: per band the gap is
    ``|cum_g·N - cum_G·n_g|`` and

        ``t_micro = (1e6 · Σ gaps) div ((k-1) · n_g · N)``

    — no float; cross-products must stay < 2^63 (n_g·N caveat). NULL
    is a band, ordered FIRST (Spark/DuckDB both sort NULL first
    ascending). One row per group: ``(*quasi_cols, n, t_micro)`` —
    report, not filter: the caller picks the threshold.

    Scale shape: one (quasi, band) groupBy; the group×band evaluation
    grid is built by crossing the group frame with the kilobyte global
    band list (never the data), cumulatives via windows over ≤ k rows
    per group.
    """
    quasi_cols = list(quasi_cols)
    if not quasi_cols:
        raise ValueError("t_closeness_report needs at least one quasi column")
    if sensitive_col in quasi_cols:
        raise ValueError(
            f"sensitive column {sensitive_col!r} cannot also be a quasi column"
        )
    from pyspark.sql import Window

    s = F.col(sensitive_col)
    cells = df.groupBy(*quasi_cols, s.alias("__s")).agg(
        F.count(F.lit(1)).alias("__c")
    )
    wg = Window.orderBy(F.col("__s").asc_nulls_first()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    glob = (
        cells.groupBy("__s")
        .agg(F.sum("__c").alias("__gc"))
        .select(
            "__s",
            F.sum("__gc").over(wg).alias("__cum_glob"),
        )
    )
    totals = cells.agg(
        F.sum("__c").alias("__N"),
        F.count_distinct("__s").alias("__kd"),
        F.max(F.when(F.col("__s").isNull(), 1).otherwise(0)).alias("__hn"),
    ).select(
        "__N", (F.col("__kd") + F.col("__hn")).alias("__k")
    )
    groups = cells.groupBy(*quasi_cols).agg(F.sum("__c").alias("n"))
    # evaluation grid: every group × every global band (null-safe join
    # back to the group's own count at that band)
    grid = groups.crossJoin(F.broadcast(glob))
    gcells = cells.select(
        *[F.col(c).alias(f"__q_{c}") for c in quasi_cols],
        F.col("__s").alias("__sb"),
        "__c",
    )
    cond = F.col("__sb").eqNullSafe(F.col("__s"))
    for c in quasi_cols:
        cond = cond & F.col(f"__q_{c}").eqNullSafe(F.col(c))
    j = grid.join(gcells, cond, "left")
    wq = (
        Window.partitionBy(*quasi_cols)
        .orderBy(F.col("__s").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = j.select(
        *quasi_cols,
        "n",
        "__cum_glob",
        F.sum(F.coalesce(F.col("__c"), F.lit(0))).over(wq).alias("__cum_grp"),
    )
    out = (
        filled.crossJoin(F.broadcast(totals))
        .groupBy(*quasi_cols)
        .agg(
            F.max("n").alias("n"),
            F.sum(
                F.abs(
                    F.col("__cum_grp") * F.col("__N")
                    - F.col("__cum_glob") * F.col("n")
                )
            ).alias("__gapsum"),
            F.max("__N").alias("__Nv"),
            F.max("__k").alias("__kv"),
        )
    )
    return out.select(
        *quasi_cols,
        "n",
        F.expr(
            "CASE WHEN (__kv - 1) * n * __Nv = 0 THEN NULL"
            " ELSE (1000000 * __gapsum) div ((__kv - 1) * n * __Nv) END"
        ).alias("t_micro"),
    )
