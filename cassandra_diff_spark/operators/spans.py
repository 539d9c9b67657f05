"""Exact substring (duplicate-span) deduplication.

Detects runs of ``k`` or more whitespace tokens that occur more than once
anywhere in the corpus (including twice within one document), merges
overlapping hits into maximal spans, and optionally rewrites documents with
every *non-canonical* duplicated span removed — the first occurrence in
``(doc_id, pos)`` order survives, every later copy is cut.

The reference engine (cassandra-diff) has no text operators; this follows
the exact-substring deduplication of Lee et al. 2022 ("Deduplicating
Training Data Makes Language Models Better"), re-expressed Spark-first
instead of via a suffix array:

- the k-gram inventory is **map-only**: ``transform`` over the token array
  hashes each window in place, and only a 60-bit hash plus an int position
  survive into the shuffle (never the gram text);
- the duplicated-gram set is **one map-side-combinable groupBy** on the
  hash — at 100 TB this is the same shape as the exact-dedup hash groupBy;
- span merging is a per-document **gaps-and-islands window** whose state is
  bounded by document length, never corpus size;
- the cleaner explodes positions only for duplicated occurrences (a small
  minority of the corpus by construction), so the token-level anti-join
  stays proportional to the duplicate mass, not the corpus.

Cross-engine hash: the 60-bit md5 prefix from ``functions.text.md5_hash64``
so DuckDB oracles can reproduce every number bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from cassandra_diff_spark.functions.text import md5_hash64_sql, n_words, words

DEFAULT_K = 8


def _gram_hash_expr(k: int) -> str:
    """Map-only per-position k-gram hash over the ``__toks`` array.

    ``transform`` with the (element, index) lambda hashes the window that
    STARTS at each of the first ``n - k + 1`` positions; the outer ``slice``
    trims the positions whose window would run off the end.
    """
    return (
        f"transform(slice(__toks, 1, greatest(size(__toks) - {k - 1}, 0)), "
        f"(x, i) -> cast(conv(substring(md5(concat_ws(' ', "
        f"slice(__toks, i + 1, {k}))), 1, 15), 16, 10) as long))"
    )


def gram_occurrences(
    df: DataFrame, id_col: str, text_col: str, k: int = DEFAULT_K
) -> DataFrame:
    """(id, pos, h): every k-token window with its 60-bit hash.

    ``pos`` is the 0-based token index of the window start.  Documents
    shorter than ``k`` tokens produce no rows.
    """
    toks = df.select(F.col(id_col), words(F.col(text_col)).alias("__toks"))
    return toks.select(
        F.col(id_col),
        F.posexplode(F.expr(_gram_hash_expr(k))).alias("pos", "h"),
    ).select(id_col, F.col("pos").cast("long").alias("pos"), "h")


def duplicate_spans(
    df: DataFrame, id_col: str, text_col: str, k: int = DEFAULT_K
) -> DataFrame:
    """Maximal duplicated spans per document.

    A position is *hit* when its k-gram occurs >= 2 times corpus-wide; hits
    whose windows overlap or touch (gap <= k) merge into one span.  Output:
    ``(id, span_start, span_end, span_tokens)`` with ``span_end``
    exclusive, both 0-based token indexes.
    """
    occ = gram_occurrences(df, id_col, text_col, k)
    # duplicated-gram detection as a count window over h, NOT groupBy +
    # self-semi-join: the join form evaluates the tokenize+gram-hash
    # subtree twice (no ReusedExchange — the aggregate and join sides
    # need different outputs) and shuffles twice; the window form is ONE
    # h-shuffle over a single gram pass
    wh = Window.partitionBy("h")
    hits = (
        occ.withColumn("__cnt", F.count(F.lit(1)).over(wh))
        .filter(F.col("__cnt") >= 2)
        .select(id_col, "pos")
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    isl = hits.withColumn(
        "__new", F.when(F.col("pos") - F.lag("pos").over(w) > k, 1).otherwise(0)
    ).withColumn("__isl", F.sum("__new").over(w))
    return (
        isl.groupBy(id_col, "__isl")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + F.lit(k)).cast("long").alias("span_end"),
        )
        .select(
            id_col,
            F.col("span_start").cast("long").alias("span_start"),
            "span_end",
            (F.col("span_end") - F.col("span_start")).alias("span_tokens"),
        )
    )


def remove_duplicate_spans(
    df: DataFrame, id_col: str, text_col: str, k: int = DEFAULT_K
) -> DataFrame:
    """Rewrite documents with non-canonical duplicated k-grams removed.

    For each duplicated gram the canonical occurrence is the least
    ``(id, pos)``; every token covered by a *non-canonical* occurrence is
    dropped and the survivors are re-joined with single spaces (output text
    is whitespace-normalized by construction).  Documents shorter than
    ``k`` tokens, or with no duplicated grams, pass through intact.

    Output: ``(id, n_tokens, n_tokens_clean, text_clean)``.  A document
    whose every token was covered comes back with ``text_clean = ''``.
    """
    occ = gram_occurrences(df, id_col, text_col, k)
    # same single-pass window shape as duplicate_spans: count + canonical
    # (least (id, pos)) per gram hash in ONE h-shuffle, no re-evaluation
    # of the gram subtree through a groupBy + join-back
    wh = Window.partitionBy("h")
    noncanon = (
        occ.withColumn("__cnt", F.count(F.lit(1)).over(wh))
        .withColumn(
            "__first", F.min(F.struct(F.col(id_col), F.col("pos"))).over(wh)
        )
        .filter(
            (F.col("__cnt") >= 2)
            & ~(
                (F.col(id_col) == F.col(f"__first.{id_col}"))
                & (F.col("pos") == F.col("__first.pos"))
            )
        )
        .select(id_col, "pos")
    )
    covered = noncanon.select(
        id_col,
        F.explode(F.sequence(F.col("pos"), F.col("pos") + F.lit(k - 1))).alias("tpos"),
    ).distinct()
    tokens = df.select(
        F.col(id_col), F.posexplode(words(F.col(text_col))).alias("tpos", "tok")
    ).select(id_col, F.col("tpos").cast("long").alias("tpos"), "tok")
    kept = tokens.join(covered, [id_col, "tpos"], "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens_clean"),
        F.expr(
            "array_join(transform(array_sort(collect_list(struct(tpos, tok))),"
            " s -> s.tok), ' ')"
        ).alias("text_clean"),
    )
    return (
        df.select(F.col(id_col), n_words(F.col(text_col)).cast("long").alias("n_tokens"))
        .join(rebuilt, id_col, "left")
        .select(
            id_col,
            "n_tokens",
            F.coalesce(F.col("n_tokens_clean"), F.lit(0)).cast("long").alias(
                "n_tokens_clean"
            ),
            F.coalesce(F.col("text_clean"), F.lit("")).alias("text_clean"),
        )
    )


def gram_occurrences_sql(table: str, id_col: str, text_col: str, k: int) -> str:
    """DuckDB twin of :func:`gram_occurrences` (a CTE body)."""
    gram = f"array_to_string(t[pos + 1:pos + {k}], ' ')"
    return f"""
    toks AS (SELECT {id_col}, regexp_split_to_array(trim({text_col}), '\\s+') AS t
             FROM {table}),
    posn AS (SELECT {id_col}, t,
                    unnest(range(0, greatest(len(t) - {k - 1}, 0))) AS pos
             FROM toks),
    grams AS (SELECT {id_col}, pos, {md5_hash64_sql(gram)} AS h FROM posn)
    """
