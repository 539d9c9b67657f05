"""Mergeable distinct-count sketches (Apache DataSketches HLL, built
into Spark): the incremental-cardinality path for a partitioned 100 TB
corpus.

Why sketches and not ``approx_count_distinct``: a sketch is a VALUE —
a few KB of binary state you can persist per shard/day/source and
MERGE later. New data means sketching only the new shard and unioning
it with the stored state; the historical corpus is never rescanned.
``approx_count_distinct`` answers once and leaves nothing to build on.

All kernels are JVM aggregate functions (``hll_sketch_agg`` /
``hll_union_agg`` / ``hll_sketch_estimate``) — map-side combinable,
bytes-per-group state, no Python in the path. Merge exactness:
unioning per-shard sketches of the same ``lg_k`` yields the SAME
estimate as sketching everything in one pass (the HLL union is
lossless at equal lg_k) — pytest asserts equality, the gate asserts
accuracy against the exact count.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def sketch_distinct(
    df: DataFrame,
    cols: Sequence[str],
    *,
    by: Optional[Sequence[str]] = None,
    lg_k: int = 12,
) -> DataFrame:
    """Per-group HLL sketches of each column's distinct values:
    ``(*by, col_<c>_sketch binary, ...)`` — one map-side-combined
    aggregation pass, a few KB per (group, column). Persist this frame
    (e.g. per ingest batch / day / shard) and fold new batches in with
    :func:`merge_sketches`; :func:`sketch_estimates` reads cardinalities
    out at any time without touching data."""
    by = list(by) if by else []
    aggs = [
        F.hll_sketch_agg(F.col(c).cast("string"), int(lg_k)).alias(
            f"{c}_sketch"
        )
        for c in cols
    ]
    return df.groupBy(*by).agg(*aggs)


def merge_sketches(
    sketches: DataFrame,
    cols: Sequence[str],
    *,
    by: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Union sketch rows (shards/batches/days) down to one sketch per
    ``by`` group — the ROLLUP. Lossless at equal ``lg_k``: the merged
    sketch is identical to one built over the union of the inputs, so
    incremental maintenance costs nothing in accuracy."""
    by = list(by) if by else []
    aggs = [
        F.hll_union_agg(F.col(f"{c}_sketch"), True).alias(f"{c}_sketch")
        for c in cols
    ]
    return sketches.groupBy(*by).agg(*aggs)


def sketch_estimates(
    sketches: DataFrame,
    cols: Sequence[str],
    *,
    by: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Read distinct-count estimates out of sketch rows: ``(*by,
    n_distinct_<c> long, ...)`` — a kilobyte-scale projection, no data
    scan."""
    by = list(by) if by else []
    return sketches.select(
        *by,
        *[
            F.hll_sketch_estimate(F.col(f"{c}_sketch")).alias(f"n_distinct_{c}")
            for c in cols
        ],
    )


def heavy_hitters(
    df: DataFrame,
    col: str,
    threshold_frac: float,
    capacity: Optional[int] = None,
) -> DataFrame:
    """Exact frequent-item detection without shuffling the key space.

    Two passes:

    1. a per-partition **Misra-Gries summary** (capacity ``k =
       ceil(1/threshold_frac)``) built in one ``mapInPandas`` sweep using
       the mergeable-summaries rule (add counts, then subtract the
       (k+1)-st largest and drop non-positives).  Per-partition error is
       <= n_part/(k+1), so the union of summaries provably contains EVERY
       value with global frequency >= threshold_frac (> n/(k+1));
       the shuffle carries at most ``k`` candidates per partition, never
       the full key cardinality;
    2. an exact count of the candidate values only (broadcast semi-join +
       map-side-combined groupBy), filtered at ``cnt >=
       ceil(threshold_frac * total)``.

    The superset guarantee makes the output EXACTLY the heavy-hitter set
    a full groupBy would return — but at 100 TB with billions of distinct
    keys, pass 1 bounds the shuffle at k x partitions rows.  Nulls are
    ignored.  Output: ``(col, cnt, share_ppm)``.
    """
    import math

    k = capacity or max(int(math.ceil(1.0 / threshold_frac)), 1)
    src = df.select(F.col(col).alias("v")).filter(F.col("v").isNotNull())
    out_schema = src.schema

    def mg(batches):
        import pandas as pd

        counts: dict = {}
        for pdf in batches:
            for v, c in pdf["v"].value_counts(dropna=True).items():
                counts[v] = counts.get(v, 0) + int(c)
            if len(counts) > k:
                sub = sorted(counts.values(), reverse=True)[k]
                counts = {v: c - sub for v, c in counts.items() if c > sub}
        yield pd.DataFrame({"v": list(counts.keys())})

    cand = src.mapInPandas(mg, schema=out_schema).distinct()
    total = src.agg(F.count(F.lit(1)).alias("__total"))
    exact = (
        src.join(F.broadcast(cand), "v", "left_semi")
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        exact.crossJoin(F.broadcast(total))
        .filter(F.col("cnt") >= F.ceil(F.lit(threshold_frac) * F.col("__total")))
        .select(
            F.col("v").alias(col),
            F.col("cnt").cast("long").alias("cnt"),
            F.floor(F.lit(1_000_000) * F.col("cnt") / F.col("__total"))
            .cast("long")
            .alias("share_ppm"),
        )
    )


def key_overlap_estimate(
    a: DataFrame,
    b: DataFrame,
    col_a: str,
    col_b: Optional[str] = None,
    *,
    lg_k: int = 12,
) -> DataFrame:
    """Set overlap of two tables' key columns WITHOUT a join: sketch
    each side (one agg scan per table, map-side combinable), union the
    two kilobyte sketches, and estimate the intersection by
    inclusion-exclusion ``|A∩B| ≈ |A| + |B| - |A∪B|`` — the "how much
    do these two 100 TB key sets overlap" pre-flight at sketch cost
    (plan a diff, size a migration, detect a disjoint-keys join bug
    before paying for the join).

    Returns ONE row: ``(n_a, n_b, n_union, n_intersection,
    jaccard_milli)`` — all estimates (doubles; jaccard floored to
    integer milli). Error: each HLL estimate carries ~1.6% relative
    standard error at the default ``lg_k=12``; the inclusion-exclusion
    difference inherits error on the UNION's scale, so a small true
    intersection of two huge sets is noisy — raise ``lg_k`` (4 bytes x
    2^lg_k state) when the overlap, not the sizes, is the question.
    NULL keys are excluded on both sides.
    """
    ca = col_a
    cb = col_b or col_a
    sa = (
        a.filter(F.col(ca).isNotNull())
        .agg(F.hll_sketch_agg(F.col(ca).cast("string"), int(lg_k)).alias("__sk"))
    )
    sb = (
        b.filter(F.col(cb).isNotNull())
        .agg(F.hll_sketch_agg(F.col(cb).cast("string"), int(lg_k)).alias("__sk"))
    )
    un = (
        sa.unionByName(sb)
        .agg(F.hll_union_agg(F.col("__sk"), True).alias("__u"))
        .select(F.hll_sketch_estimate("__u").alias("n_union"))
    )
    est = (
        sa.select(F.hll_sketch_estimate("__sk").alias("n_a"))
        .crossJoin(sb.select(F.hll_sketch_estimate("__sk").alias("n_b")))
        .crossJoin(un)
    )
    inter = F.greatest(F.lit(0.0), F.col("n_a") + F.col("n_b") - F.col("n_union"))
    return est.select(
        "n_a",
        "n_b",
        "n_union",
        inter.alias("n_intersection"),
        F.floor(F.lit(1000.0) * inter / F.col("n_union"))
        .cast("long")
        .alias("jaccard_milli"),
    )


def cm_sketch_build(
    df: DataFrame,
    col: str,
    *,
    depth: int = 4,
    width: int = 1024,
    seed: int = 0,
) -> DataFrame:
    """Count-Min sketch of a key column's frequencies: a ``depth x
    width`` integer counter matrix in long form ``(row, idx, cnt)`` —
    the mergeable approximate-frequency store (persist per shard/day,
    :func:`fold_cm_sketches` new batches in, query any key's count
    without the key-cardinality groupBy state).

    Exact-arithmetic contract: cell assignment is the cross-engine md5
    hash (``idx = md5_hash64(f"{row}:{seed}:" + key) % width``) and the
    counters are plain integer sums — the sketch, and therefore every
    ESTIMATE read from it, is bit-identical in any engine (approximate
    SEMANTICS, deterministic VALUES — the estimate errs only upward, by
    collision mass ~ n/width per row, and min-over-rows takes the least
    collided). NULL keys are excluded.

    One map-side-combined groupBy whose reduce cardinality is at most
    ``depth x width`` cells — never the key cardinality.
    """
    if depth < 1 or width < 1:
        raise ValueError(f"need depth, width >= 1, got {depth}, {width}")
    from cassandra_diff_spark.functions.text import md5_hash64

    src = df.filter(F.col(col).isNotNull()).select(
        F.col(col).cast("string").alias("__k")
    )
    rows = src.select(
        "__k",
        F.explode(F.array(*[F.lit(r) for r in range(int(depth))])).alias("row"),
    )
    idx = md5_hash64(
        F.concat(F.col("row").cast("string"), F.lit(f":{seed}:"), F.col("__k"))
    ) % int(width)
    return (
        rows.select("row", idx.alias("idx"))
        .groupBy("row", "idx")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def fold_cm_sketches(sketches: Sequence[DataFrame]) -> DataFrame:
    """Additive fold of Count-Min sketches built with the SAME
    depth/width/seed: counters add cell-wise, so the fold equals the
    one-shot build over the unioned data exactly."""
    if not sketches:
        raise ValueError("fold_cm_sketches: need at least one sketch")
    u = sketches[0].select("row", "idx", "cnt")
    for s in sketches[1:]:
        u = u.unionByName(s.select("row", "idx", "cnt"))
    return u.groupBy("row", "idx").agg(F.sum("cnt").cast("long").alias("cnt"))


def cm_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    *,
    depth: int = 4,
    width: int = 1024,
    seed: int = 0,
) -> DataFrame:
    """Frequency estimates for a key frame from a Count-Min sketch:
    ``(key_col, est)`` with ``est = min over rows of counter[h_row(k)]``
    (0 when a cell is absent — an absent cell is a zero counter).
    The sketch frame is depth x width cells — it joins in broadcast;
    the keys never shuffle. Estimates are upper bounds: ``est >= true``
    always, with overshoot ~ n/width per row before the min.
    """
    from cassandra_diff_spark.functions.text import md5_hash64

    k = keys.filter(F.col(key_col).isNotNull()).select(
        F.col(key_col),
        F.explode(F.array(*[F.lit(r) for r in range(int(depth))])).alias("row"),
    )
    idx = md5_hash64(
        F.concat(
            F.col("row").cast("string"),
            F.lit(f":{seed}:"),
            F.col(key_col).cast("string"),
        )
    ) % int(width)
    j = k.withColumn("idx", idx).join(F.broadcast(sketch), ["row", "idx"], "left")
    return (
        j.groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("long").alias("est"))
    )


#: bits packed per bloom word — 63 keeps every mask positive, so the
#: shift/AND arithmetic is identical in Spark and DuckDB (bit 63 would
#: ride the sign bit and overflow-check differently across engines)
BLOOM_WORD_BITS = 63


def _bloom_pos_sql(i: int, seed: int, col: str, m_bits: int) -> str:
    """Spark-SQL fragment: the i-th bloom bit position of ``col``
    (cross-engine md5, same formula the DuckDB twin spells)."""
    return (
        f"(conv(substring(md5(concat('{i}:{seed}:', cast(`{col}` as string))),"
        f" 1, 15), 16, 10) % {int(m_bits)})"
    )


def bloom_build(
    df: DataFrame,
    col: str,
    *,
    m_bits: int = 1 << 20,
    k: int = 5,
    seed: int = 0,
) -> DataFrame:
    """Bloom filter of a key column as a PACKED integer bitset frame
    ``(word, bits)`` — at most ``ceil(m_bits / 63)`` rows regardless of
    key cardinality (2^20 bits ≈ 16 k rows ≈ 130 KB: broadcastable).

    Positions are the cross-engine md5 hash (``md5_hash64(f"{i}:{seed}:"
    + key) % m_bits`` for i < k), packing is ``bit_or`` of single-bit
    masks — one map-side-combined groupBy whose reduce cardinality is
    the word count, never the key count. Building is idempotent
    (re-adding keys changes nothing) and per-shard bitsets fold
    losslessly with another ``bit_or`` groupBy. NULL keys are excluded.
    """
    if m_bits < BLOOM_WORD_BITS or k < 1:
        raise ValueError(f"need m_bits >= {BLOOM_WORD_BITS} and k >= 1")
    src = df.filter(F.col(col).isNotNull()).select(
        F.col(col).cast("string").alias("__k")
    )
    rows = src.select(
        F.explode(
            F.array(
                *[
                    F.expr(_bloom_pos_sql(i, seed, "__k", m_bits))
                    for i in range(int(k))
                ]
            )
        ).alias("pos")
    )
    return (
        rows.select(
            F.expr(f"pos div {BLOOM_WORD_BITS}").alias("word"),
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), CAST(pos % {BLOOM_WORD_BITS} AS INT))"
            ).alias("__mask"),
        )
        .groupBy("word")
        .agg(F.expr("bit_or(__mask)").cast("long").alias("bits"))
    )


def bloom_filter_keys(
    df: DataFrame,
    col: str,
    bloom: DataFrame,
    *,
    m_bits: int = 1 << 20,
    k: int = 5,
    seed: int = 0,
) -> DataFrame:
    """MAP-ONLY membership prefilter: keep rows whose key has ALL ``k``
    bloom positions set — the shuffle-reduction step before a big
    join/diff (drop most non-matching rows at the scan; false positives
    pass through and the downstream join re-checks them, so the
    composition stays EXACT — and because positions are hash-defined,
    even the FP set is deterministic and engine-reproducible).

    The bitset frame collapses to ONE ``map<long,long>`` broadcast row
    (the ``encode_documents`` posture); membership is ``k`` md5
    expressions + AND of masked lookups — pure Catalyst, no explode, no
    shuffle, no Python. Rows with a NULL key are dropped (a bloom
    cannot witness null). ``m_bits``/``k``/``seed`` must match the
    build.
    """
    if m_bits < BLOOM_WORD_BITS or k < 1:
        raise ValueError(f"need m_bits >= {BLOOM_WORD_BITS} and k >= 1")
    # densify the sparse (word, bits) frame into an INDEXED array<long>
    # (the classifier_score lesson: element_at on a map column LINEARLY
    # scans UnsafeMapData — k lookups x 16k-word scans per row; array
    # element_at is O(1) and the dense bitset is ~130 KB either way)
    n_words = (int(m_bits) + BLOOM_WORD_BITS - 1) // BLOOM_WORD_BITS
    bm = bloom.agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("word"), F.col("bits")))
        ).alias("__m")
    ).select(
        F.transform(
            F.sequence(F.lit(0), F.lit(n_words - 1)),
            lambda i: F.coalesce(
                F.element_at(F.col("__m"), i.cast("long")),
                F.lit(0).cast("long"),
            ),
        ).alias("__bm")
    )
    out = df.filter(F.col(col).isNotNull()).crossJoin(F.broadcast(bm))
    cond = F.lit(True)
    for i in range(int(k)):
        pos = _bloom_pos_sql(i, seed, col, m_bits)
        cond = cond & (
            F.expr(
                f"element_at(__bm,"
                f" CAST({pos} div {BLOOM_WORD_BITS} AS INT) + 1)"
                f" & shiftleft(CAST(1 AS BIGINT),"
                f" CAST({pos} % {BLOOM_WORD_BITS} AS INT))"
            )
            != 0
        )
    return out.filter(cond).drop("__bm")
