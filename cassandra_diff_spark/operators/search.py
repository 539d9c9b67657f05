"""Keyword search over the corpus: BM25 ranking.

The reference engine (cassandra-diff) has no search surface; this adds the
retrieval primitive a training-data pipeline needs for decontamination
lookups, eval-set mining, and corpus QA ("which documents talk about X").

Spark-first shape, built to hold at 100 TB:

- the postings scan filters to the query terms BEFORE any shuffle, so the
  shuffled volume is proportional to the hit list, not the corpus;
- document frequencies and corpus stats are kilobyte-scale aggregates,
  joined back with explicit ``broadcast()`` — no second corpus shuffle;
- per-term BM25 weights are rounded to integer micro-units *before* the
  per-document sum, making the aggregation order-free — bit-identical
  across engines (and across retries/partitionings of the same job), which
  is what lets a DuckDB oracle hash-match the scores exactly.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cassandra_diff_spark.functions.text import words

SCORE_SCALE = 1_000_000  # micro-units: ROUND(w * 1e6) per term, then SUM


def bm25_topk(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: Sequence[str],
    top_k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k documents by BM25 score for a bag of query terms.

    Output: ``(id, n_terms, score_u)`` ordered by ``(score_u DESC, id)``
    and limited to ``top_k`` — the tiebreak on ``id`` makes the cutoff
    deterministic.  ``score_u`` is the BM25 score in integer micro-units
    (sum over terms of ``ROUND(idf * tf*(k1+1) / (tf + k1*(1-b+b*dl/avgdl))
    * 1e6)``); ``idf = ln(1 + (N - df + 0.5)/(df + 0.5))`` (the
    Robertson-Sparck Jones form used by Lucene).
    """
    terms = sorted(set(query_terms))
    toks = docs.select(F.col(id_col), words(F.col(text_col)).alias("__t"))
    dl = toks.select(F.col(id_col), F.size("__t").cast("long").alias("__dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("__n_docs"), F.sum("__dl").alias("__tot")
    ).select(
        "__n_docs", (F.col("__tot").cast("double") / F.col("__n_docs")).alias("__avgdl")
    )
    hits = toks.select(F.col(id_col), F.explode("__t").alias("__term")).filter(
        F.col("__term").isin(terms)
    )
    tf = hits.groupBy(id_col, "__term").agg(F.count(F.lit(1)).alias("__tf"))
    dfreq = tf.groupBy("__term").agg(F.count(F.lit(1)).alias("__df"))
    weighted = (
        tf.join(dl, id_col)
        .join(F.broadcast(dfreq), "__term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "__idf",
            F.log(
                F.lit(1.0)
                + (F.col("__n_docs") - F.col("__df") + 0.5) / (F.col("__df") + 0.5)
            ),
        )
        .withColumn(
            "__w_u",
            F.round(
                F.col("__idf")
                * (F.col("__tf") * (k1 + 1.0))
                / (
                    F.col("__tf")
                    + k1 * (1.0 - b + b * F.col("__dl") / F.col("__avgdl"))
                )
                * SCORE_SCALE
            ).cast("long"),
        )
    )
    return (
        weighted.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_terms"),
            F.sum("__w_u").alias("score_u"),
        )
        .orderBy(F.col("score_u").desc(), F.col(id_col))
        .limit(top_k)
    )


def bm25_topk_sql(
    table: str,
    id_col: str,
    text_col: str,
    query_terms: Sequence[str],
    top_k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> str:
    """DuckDB twin of :func:`bm25_topk` (same micro-unit rounding)."""
    terms = sorted(set(query_terms))
    in_list = ", ".join("'" + t.replace("'", "''") + "'" for t in terms)
    return f"""
WITH toks AS (SELECT {id_col},
                     regexp_split_to_array(trim({text_col}), '\\s+') AS t
              FROM {table}),
dl AS (SELECT {id_col}, CAST(len(t) AS BIGINT) AS dl FROM toks),
stats AS (SELECT count(*) AS n_docs,
                 CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
          FROM dl),
hits AS (SELECT {id_col}, unnest(t) AS term FROM toks),
tf AS (SELECT {id_col}, term, count(*) AS tf FROM hits
       WHERE term IN ({in_list}) GROUP BY {id_col}, term),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
w AS (SELECT tf.{id_col},
             CAST(ROUND(ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
                  * (tf.tf * ({k1} + 1.0))
                  / (tf.tf + {k1} * (1.0 - {b} + {b} * dl.dl / s.avgdl))
                  * {SCORE_SCALE}) AS BIGINT) AS w_u
      FROM tf JOIN dl USING ({id_col}) JOIN dfreq d USING (term)
      CROSS JOIN stats s)
SELECT {id_col}, CAST(count(*) AS BIGINT) AS n_terms,
       CAST(sum(w_u) AS BIGINT) AS score_u
FROM w GROUP BY {id_col}
ORDER BY score_u DESC, {id_col} LIMIT {top_k}
"""


def rrf_fuse(
    rankings: "Sequence[DataFrame]",
    id_col: str,
    *,
    k: int = 60,
    top_k: int = 10,
) -> DataFrame:
    """Reciprocal-rank fusion of N retriever rankings (the standard
    hybrid-search combiner: BM25 + dense ANN + any prior, fused without
    score calibration). Each input carries ``(id_col, rank)`` with rank
    1-based; a document's fused score is ``SUM_lists floor(10^6 /
    (k + rank))`` — PURE INTEGER arithmetic (micro-units), so the sum
    is order-free and engine-exact, same trick as the BM25 weights.
    ``k`` is the usual dampening constant (Cormack et al.'s 60).

    Output: ``(id, n_lists, rrf_u)`` ordered ``rrf_u DESC, id`` and
    limited to ``top_k`` — deterministic cutoff.

    Scale shape: the inputs are top-k lists (kilobytes); union + one
    tiny aggregation. The heavy lifting happened inside the retrievers;
    fusion adds no corpus-sized work by construction.
    """
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    from functools import reduce

    u = reduce(
        lambda a, b: a.unionByName(b),
        [
            r.select(F.col(id_col), F.col("rank").cast("long").alias("rank"))
            for r in rankings
        ],
    )
    contrib = F.floor(F.lit(1_000_000) / (F.col("rank") + F.lit(int(k)))).cast(
        "long"
    )
    return (
        u.select(id_col, contrib.alias("__c"))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_lists"),
            F.sum("__c").alias("rrf_u"),
        )
        .orderBy(F.col("rrf_u").desc(), F.col(id_col))
        .limit(top_k)
    )


def with_rank(ranking: DataFrame, id_col: str, order_cols) -> DataFrame:
    """Attach the 1-based ``rank`` column :func:`rrf_fuse` consumes,
    from an explicit deterministic ordering (include a unique
    tiebreaker). Window over a top-k-sized frame — driver-cheap."""
    from pyspark.sql import Window

    w = Window.orderBy(*order_cols)
    return ranking.withColumn("rank", F.row_number().over(w).cast("long"))
