"""Corpus curation: the end-to-end keep/drop pipeline a training-data
build runs over raw documents — exact dedup survivorship, quality gate,
language ID, token budgeting — composed from the engine's text
primitives as ONE declarative plan.

Shape: a single projection computes fingerprint + quality + lang + token
count per document (all Catalyst expressions — no Python in the hot
path), one hash-shuffle picks the dedup survivor per fingerprint
(map-side partial min), and the corpus-level rollup is an ordinary
partial-aggregated groupBy. Nothing is iterative, nothing touches the
driver: the same plan runs at 100 TB with the fingerprint shuffle as the
only data-sized exchange, and every step is reproducible in plain SQL
for the DuckDB oracle.

Pipeline order is deliberate: dedup BEFORE the quality gate, so the
surviving copy of a duplicated document is the globally minimal id (the
same survivor the standalone exact_dedup reports), not the minimal id
among quality-passing copies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cassandra_diff_spark.functions.text import (
    fingerprint,
    langid,
    n_bpe_tokens,
    quality_milli,
)


def clean_corpus(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_quality_milli: int = 500,
) -> DataFrame:
    """Kept documents after exact-dedup survivorship + quality gate.

    Returns (id, lang, quality_milli, n_tokens) for every document that
    (a) is the minimum-id copy of its exact-content fingerprint group and
    (b) scores at least ``min_quality_milli``.
    """
    scored = df.select(
        F.col(id_col).alias("id"),
        fingerprint(F.col(text_col)).alias("fp"),
        quality_milli(F.col(text_col)).alias("quality_milli"),
        langid(F.col(text_col)).alias("lang"),
        n_bpe_tokens(F.col(text_col)).alias("n_tokens"),
    )
    # survivor keys (fp, min id) joined back on BOTH columns — a plain
    # two-column equi-join, no self-join lineage ambiguity
    survivors = scored.groupBy("fp").agg(F.min("id").alias("id"))
    return (
        scored.join(survivors, ["fp", "id"])
        .filter(F.col("quality_milli") >= min_quality_milli)
        .select("id", "lang", "quality_milli", "n_tokens")
    )


def corpus_stats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_quality_milli: int = 500,
) -> DataFrame:
    """Per-language rollup of the cleaned corpus: what survives curation
    and how many training tokens it contributes.

    Returns (lang, n_docs, total_tokens, quality_sum) — integer sums so
    the result is engine-exact (consumers derive averages)."""
    kept = clean_corpus(df, id_col, text_col, min_quality_milli)
    return kept.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.sum("quality_milli").cast("long").alias("quality_sum"),
    )
