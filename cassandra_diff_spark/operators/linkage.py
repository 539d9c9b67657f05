"""Fuzzy record linkage / entity resolution: find near-identical
records (typos, transcription noise) WITHOUT an all-pairs comparison.

The classic blocking design: each record enters one bucket per blocking
strategy (a cheap deterministic key — a prefix, a suffix, a
length+initial, a sorted-token fingerprint), candidate pairs are
generated ONLY within a bucket, and the expensive edit-distance filter
runs on candidates alone. Multiple strategies give recall (a typo that
breaks one key usually survives another); the pair-level dedup at the
end removes the overlap.

Scale shape (100 TB of records):

* every stage is a hash shuffle on the block key or the pair — no
  cartesian anywhere; the candidate count is sum over buckets of
  |bucket|^2, which ``max_block`` caps explicitly (a degenerate key —
  e.g. a constant prefix — would otherwise go quadratic; dropped
  buckets are reported, never silently searched);
* ``levenshtein`` is a JVM built-in evaluated inside whole-stage
  codegen on candidates only;
* the pair dedup is a map-side-combinable ``min`` aggregation.

Composes with :func:`cassandra_diff_spark.operators.dedup.dedup_clusters`
(pairs -> connected components -> survivors) exactly like the text-dedup
pair generators.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def fuzzy_dup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    block_keys: Sequence[Column],
    max_edit: int,
    max_block: Optional[int] = None,
) -> DataFrame:
    """Candidate-blocked fuzzy duplicate pairs: ``(id_a, id_b,
    edit_dist)`` with ``id_a < id_b`` and ``levenshtein(text_a, text_b)
    <= max_edit``, considering only pairs that share at least one
    blocking key.

    * ``block_keys``: one Column expression per blocking strategy,
      evaluated over ``df``'s columns. NULL block keys drop the record
      from that strategy (not from the others).
    * ``max_block``: drop any (strategy, key) bucket holding more than
      this many records — the quadratic-blowup guard. Use
      :func:`fuzzy_block_profile` to size it; dropped buckets mean a
      blocking key that does not discriminate, not data loss you can
      ignore.
    """
    if not block_keys:
        raise ValueError("need at least one blocking strategy")
    sides = []
    for k, key in enumerate(block_keys):
        sides.append(
            df.select(
                F.lit(k).alias("__strat"),
                key.cast("string").alias("__bk"),
                F.col(id_col).alias("__id"),
                F.col(text_col).alias("__txt"),
            ).filter(F.col("__bk").isNotNull() & F.col("__txt").isNotNull())
        )
    b = sides[0]
    for s in sides[1:]:
        b = b.unionByName(s)
    if max_block is not None:
        # bucket-size gate: one count window over the same (strategy,
        # key) partitioning the join shuffles on anyway
        w = Window.partitionBy("__strat", "__bk")
        b = b.withColumn("__n", F.count(F.lit(1)).over(w)).filter(
            F.col("__n") <= int(max_block)
        ).drop("__n")
    left = b.select(
        "__strat", "__bk", F.col("__id").alias("id_a"), F.col("__txt").alias("__ta")
    )
    right = b.select(
        "__strat", "__bk", F.col("__id").alias("id_b"), F.col("__txt").alias("__tb")
    )
    pairs = (
        left.join(right, ["__strat", "__bk"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("edit_dist", F.levenshtein("__ta", "__tb"))
        .filter(F.col("edit_dist") <= int(max_edit))
    )
    # a pair found by several strategies reports once (distance is the
    # same wherever it was found; min keeps the agg map-side combinable)
    return pairs.groupBy("id_a", "id_b").agg(F.min("edit_dist").alias("edit_dist"))


def fuzzy_block_profile(
    df: DataFrame,
    *,
    block_keys: Sequence[Column],
    text_col: Optional[str] = None,
    top: int = 20,
) -> DataFrame:
    """Per-strategy blocking diagnostics: the ``top`` largest buckets of
    each strategy as ``(strat, block_key, n, n_pairs)`` — the pre-flight
    that sizes ``max_block`` (``n_pairs = n*(n-1)/2`` is what a bucket
    costs to search). Pass the same ``text_col`` as
    :func:`fuzzy_dup_pairs` so null-text records (which the join skips)
    don't inflate the estimate."""
    if text_col is not None:
        df = df.filter(F.col(text_col).isNotNull())
    frames = []
    for k, key in enumerate(block_keys):
        g = (
            df.select(key.cast("string").alias("block_key"))
            .filter(F.col("block_key").isNotNull())
            .groupBy("block_key")
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.col("n").desc(), F.col("block_key"))
            .limit(int(top))
            .select(
                F.lit(k).alias("strat"),
                "block_key",
                "n",
                (F.col("n") * (F.col("n") - 1) / 2).cast("long").alias("n_pairs"),
            )
        )
        frames.append(g)
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


def token_sort_key(col: Column) -> Column:
    """Canonical form for word-order-insensitive matching: lowercase,
    strip punctuation to spaces, collapse whitespace, SORT the tokens,
    re-join — "Smith, John A." and "john a smith" share one key. Use as
    a blocking strategy (word reorder breaks every prefix/suffix key)
    or as the compare column itself for reorder-tolerant scoring."""
    w = F.split(
        F.trim(F.regexp_replace(F.lower(col), r"[^a-z0-9]+", " ")), r"\s+"
    )
    return F.array_join(F.array_sort(w), " ")


def token_sort_key_sql(expr: str) -> str:
    """DuckDB twin of :func:`token_sort_key` (oracle parity)."""
    return (
        f"array_to_string(list_sort(regexp_split_to_array(trim("
        f"regexp_replace(lower({expr}), '[^a-z0-9]+', ' ', 'g')), '\\s+')), ' ')"
    )


def fuzzy_match_pairs(
    df: DataFrame,
    id_col: str,
    fields: dict,
    *,
    block_keys: Sequence[Column],
    min_score_pct: int,
    max_block: Optional[int] = None,
) -> DataFrame:
    """Field-WEIGHTED fuzzy matching: candidate pairs (blocked exactly
    like :func:`fuzzy_dup_pairs`) score as the weighted mean of
    per-field edit similarities and survive at ``score_pct >=
    min_score_pct``.

    * ``fields``: ``{column: weight}`` (positive ints — integer weights
      keep the score arithmetic identical in any engine). Per-field
      similarity = ``100 * (maxlen - levenshtein) / maxlen`` (both
      null = 100; one null = 0).
    * Output: ``(id_a, id_b, score_pct double, <field>_sim...)`` — the
      per-field breakdown stays visible so survivorship rules can
      reason per attribute ("same name, different address").

    Same scale shape as :func:`fuzzy_dup_pairs`: candidates only within
    blocking buckets, JVM ``levenshtein`` inside codegen on candidates
    alone, ``max_block`` as the quadratic guard, min-agg pair dedup
    across strategies.
    """
    if not fields:
        raise ValueError("need at least one scored field")
    if not block_keys:
        raise ValueError("need at least one blocking strategy")
    if any(int(w) <= 0 for w in fields.values()):
        raise ValueError(f"weights must be positive ints, got {fields}")
    fcols = list(fields)
    sides = []
    for k, key in enumerate(block_keys):
        sides.append(
            df.select(
                F.lit(k).alias("__strat"),
                key.cast("string").alias("__bk"),
                F.col(id_col).alias("__id"),
                *[F.col(c).cast("string").alias(f"__f_{c}") for c in fcols],
            ).filter(F.col("__bk").isNotNull())
        )
    b = sides[0]
    for s in sides[1:]:
        b = b.unionByName(s)
    if max_block is not None:
        w = Window.partitionBy("__strat", "__bk")
        b = b.withColumn("__n", F.count(F.lit(1)).over(w)).filter(
            F.col("__n") <= int(max_block)
        ).drop("__n")
    left = b.select(
        "__strat",
        "__bk",
        F.col("__id").alias("id_a"),
        *[F.col(f"__f_{c}").alias(f"__a_{c}") for c in fcols],
    )
    right = b.select(
        "__strat",
        "__bk",
        F.col("__id").alias("id_b"),
        *[F.col(f"__f_{c}").alias(f"__b_{c}") for c in fcols],
    )
    cand = left.join(right, ["__strat", "__bk"]).filter(
        F.col("id_a") < F.col("id_b")
    )

    def sim(c: str) -> Column:
        a, bb = F.col(f"__a_{c}"), F.col(f"__b_{c}")
        ml = F.greatest(F.length(a), F.length(bb))
        return (
            F.when(a.isNull() & bb.isNull(), F.lit(100.0))
            .when(a.isNull() | bb.isNull(), F.lit(0.0))
            .when(ml == 0, F.lit(100.0))
            .otherwise(
                F.lit(100.0) * (ml - F.levenshtein(a, bb)) / ml
            )
        )

    total_w = sum(int(w) for w in fields.values())
    scored = cand.select(
        "id_a",
        "id_b",
        *[sim(c).alias(f"{c}_sim") for c in fcols],
    ).withColumn(
        "score_pct",
        sum(
            (F.col(f"{c}_sim") * F.lit(int(fields[c])) for c in fcols),
            start=F.lit(0.0),
        )
        / F.lit(total_w),
    ).filter(F.col("score_pct") >= F.lit(float(min_score_pct)))
    return scored.groupBy("id_a", "id_b").agg(
        F.min("score_pct").alias("score_pct"),
        *[F.min(f"{c}_sim").alias(f"{c}_sim") for c in fcols],
    )
