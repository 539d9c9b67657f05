"""Corpus vocabulary build + document encoding — the tokenizer-adjacent
step of a training-data pipeline: count every token once, freeze the
top-V vocabulary, and turn each document into its id sequence.

Scale shape (100 TB corpus):

* :func:`build_vocab` has exactly ONE large shuffle — the map-side-
  combined ``groupBy(token).count()`` whose reduce-side cardinality is
  the DISTINCT token count, not the corpus token count. The top-V cut
  runs on that (much smaller) frame; the final id assignment windows
  over only V rows.
* :func:`encode_documents` is MAP-ONLY over the corpus: the vocabulary
  collapses to a single map-typed row, broadcast to every task, and the
  lookup is a ``transform`` over the per-document words array — the
  token stream is never exploded, never shuffled, never re-grouped.
  BUT Spark evaluates ``element_at`` on a map COLUMN as a linear scan,
  so the zero-shuffle plan pays O(|vocab|) per token — fine for small
  vocabularies, ruinous at 32k tokens. :func:`encode_documents_join`
  is the real-vocabulary twin: broadcast HASH join (O(1) per token) +
  ONE regroup shuffle carrying only (doc_id, pos, id) integers.

Both use the cross-engine ``words`` tokenizer from
:mod:`cassandra_diff_spark.functions.text`, so DuckDB oracles reproduce
results bit-for-bit.
"""

from __future__ import annotations

import time as _time
from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cassandra_diff_spark.functions.text import words


def token_counts(df: DataFrame, text_col: str) -> DataFrame:
    """``(token, n)`` corpus token frequencies — one explode + one
    map-side-combined aggregation. Empty/whitespace documents contribute
    nothing (``words('')`` is ``['']``, filtered here)."""
    return (
        df.select(F.explode(words(F.col(text_col))).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )


#: Fail-fast ceiling for the vocabulary-bounded stages of id assignment
#: (the top-V cut's single merge task; the per-n-group row_number
#: partitions): fine for any real vocabulary (GPT-2 50k, sentencepiece
#: <=1M) but must not silently absorb a corpus-sized "vocabulary".
#: 4M rows of (token, n) is ~100 MB in the merge task — the documented
#: bound, same discipline as kendall_tau's max_cells.
MAX_VOCAB_SIZE = 4_000_000


def vocab_from_counts(
    counts: DataFrame,
    *,
    vocab_size: int,
    min_count: int = 1,
    first_id: int = 1,
) -> DataFrame:
    """Freeze a vocabulary from an ALREADY-AGGREGATED ``(token, n)``
    counts frame — the tail :func:`build_vocab` and the incremental
    path (:func:`fold_token_counts`) share.

    Id assignment is the two-level decomposition of the global
    ``(n DESC, token ASC)`` row number, with NO un-partitioned window
    anywhere in the plan (the library invariant, shared with the
    spearman/AUC prefix-sum core):

      ``token_id = #{top rows with larger n}        (prefix sum)
                 + row_number within the n-group    (PARTITIONED window)
                 + first_id - 1``

    The top-V cut is still ``orderBy + limit`` (Catalyst
    TakeOrderedAndProject — per-partition top-V, merged once); the
    cross-count term then runs through
    :func:`~cassandra_diff_spark.operators.validate._running_below`
    (literal split boundaries, bucket-partitioned prefix window,
    broadcast cross-bucket offsets) over the distinct-count frame, and
    the in-group term is a window PARTITIONED by ``n``. ``vocab_size``
    stays fail-fast capped at :data:`MAX_VOCAB_SIZE` (the cut's merge
    task and the n-group window partitions are vocab-bounded).

    PARTIALLY EAGER by contract: sizing the prefix-sum buckets and
    materializing the distinct-count offset frame run bounded jobs at
    call time (the spearman ``_split_points`` discipline) over the
    top-V frame; the intermediate ``vals`` cache is LOCAL and released
    before returning (the auc_exact pattern). Only ``top`` — which the
    returned plan still reads — is ``tracked_cache``'d so the
    corpus-sized counting aggregation runs exactly once; long-lived
    sessions should call ``operators.release_caches()`` after
    materializing the result.
    """
    if int(vocab_size) > MAX_VOCAB_SIZE:
        raise ValueError(
            f"vocab_size={vocab_size} exceeds MAX_VOCAB_SIZE="
            f"{MAX_VOCAB_SIZE}: the top-V merge and id assignment are "
            "sized for vocabulary-bounded frames by design; a larger "
            "'vocabulary' is a corpus-sized frame — keep the (token, n) "
            "counts frame unfrozen (it is already globally usable via "
            "joins) or shard ids by token hash instead"
        )
    if int(first_id) - 1 + int(vocab_size) > 2 ** 31 - 1:
        # token_id is a stable 32-bit INT column; fail fast instead of
        # overflowing the cast (ANSI mode throws, legacy mode wraps)
        raise ValueError(
            f"first_id={first_id} + vocab_size={vocab_size} exceeds the "
            "32-bit token_id range; stack id spaces below 2^31"
        )
    from cassandra_diff_spark.operators import tracked_cache
    from cassandra_diff_spark.operators.validate import (
        _running_below,
        _split_points,
    )

    top = (
        counts.filter(F.col("n") >= int(min_count))
        .orderBy(F.col("n").desc(), F.col("token").asc())
        .limit(int(vocab_size))
    )
    top = tracked_cache(top)
    splits = _split_points(
        top.select((-F.col("n")).alias("__v")), ["__v"]
    )["__v"]["splits"]
    vals = top.groupBy((-F.col("n")).alias("__v")).agg(
        F.count(F.lit(1)).alias("__cnt")
    )
    if splits:
        # the prefix core reads vals twice (window + bucket totals);
        # LOCAL persist + eager collect below (the auc_exact pattern),
        # so this cache never outlives the call — only `top`, which the
        # RETURNED plan still reads, stays tracked for release_caches()
        vals = vals.persist()
    try:
        below = _running_below(vals, "__cnt", "__below", splits).select(
            (-F.col("__v")).alias("__n"), "__below"
        )
        # distinct-count cardinality rows (<= V, usually << V): the
        # broadcast below would collect these to the driver anyway —
        # materialize them NOW so vals can be released before returning
        below = counts.sparkSession.createDataFrame(
            below.collect(), below.schema
        )
    finally:
        if splits:
            vals.unpersist()
    w = Window.partitionBy("n").orderBy(F.col("token").asc())
    return (
        top.join(F.broadcast(below), top["n"] == F.col("__n"))
        .select(
            (
                F.col("__below")
                + F.row_number().over(w)
                + F.lit(int(first_id) - 1)
            )
            .cast("int")
            .alias("token_id"),
            "token",
            "n",
        )
        # id-ordered presentation, as before the prefix-sum rewrite — a
        # V-bounded range sort, not a window
        .orderBy("token_id")
    )


def build_vocab(
    df: DataFrame,
    text_col: str,
    *,
    vocab_size: int,
    min_count: int = 1,
    first_id: int = 1,
) -> DataFrame:
    """Frozen top-``vocab_size`` vocabulary: ``(token_id, token, n)``.

    Deterministic total order — count DESC, then token ASC — so equal-
    count tokens always receive the same ids on any cluster/run; ids
    are dense starting at ``first_id`` (reserve 0 for OOV by default).
    """
    return vocab_from_counts(
        token_counts(df, text_col),
        vocab_size=vocab_size,
        min_count=min_count,
        first_id=first_id,
    )


def fold_token_counts(
    counts: DataFrame, batch: DataFrame, text_col: str
) -> DataFrame:
    """Fold a NEW document batch into persisted ``(token, n)`` counts —
    incremental vocabulary maintenance: the historical corpus is never
    re-tokenized; only its distinct-token-sized count table (persist it
    per drop) unions with the batch's counts through one map-side-
    combined sum. ``vocab_from_counts`` over the fold equals
    ``build_vocab`` over corpus+batch exactly (counts are additive), so
    refreshing the vocabulary after every ingest costs one batch scan.
    """
    return (
        counts.unionByName(token_counts(batch, text_col))
        .groupBy("token")
        .agg(F.sum("n").alias("n"))
    )


def encode_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    vocab: DataFrame,
    *,
    oov_id: int = 0,
    keep_cols: Sequence[str] = (),
) -> DataFrame:
    """Encode each document against a frozen vocabulary: ``(doc_id,
    *keep_cols, token_ids, n_tokens, n_oov)`` where ``token_ids`` is the
    document's word sequence mapped through the vocab (order-preserving;
    unknown tokens become ``oov_id``). ``keep_cols`` pass metadata
    (language, source, license) through the map-only encode so
    downstream packing/sharding never needs a join back to the corpus.

    Map-only: ``vocab`` (columns ``token``, ``token_id``) aggregates to
    ONE ``map<string,int>`` row, joined in by a broadcast nested-loop
    join (1 row — effectively a broadcast variable expressed in the
    plan), and each document encodes via ``transform`` +
    ``element_at`` on its words array. No explode, no re-group, no
    shuffle of the token stream.
    """
    vmap = vocab.agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("token"), F.col("token_id").cast("int")))
        ).alias("__vmap")
    )
    w = words(F.col(text_col))
    ids = F.when(
        F.length(F.trim(F.col(text_col))) == 0, F.array().cast("array<int>")
    ).otherwise(
        F.transform(
            w,
            lambda t: F.coalesce(
                F.element_at(F.col("__vmap"), t), F.lit(int(oov_id)).cast("int")
            ),
        )
    )
    keep = [F.col(c) for c in keep_cols]
    return (
        df.crossJoin(F.broadcast(vmap))
        .select(
            F.col(id_col).alias("doc_id"),
            *keep,
            ids.alias("token_ids"),
        )
        .select(
            "doc_id",
            *keep_cols,
            "token_ids",
            F.size("token_ids").cast("long").alias("n_tokens"),
            F.size(
                F.filter("token_ids", lambda i: i == F.lit(int(oov_id)))
            ).cast("long").alias("n_oov"),
        )
    )


def hash_embed(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    dim: int = 64,
) -> DataFrame:
    """Feature-hashing document vectors (the "hashing trick"): every
    token adds ±1 at component ``md5_hash64(token) % dim`` (sign from
    the next hash bit) — a model-free, vocabulary-free text embedding
    that feeds the engine's ANN / embedding-dedup / centroid-drift
    operators directly. Output ``(doc_id, emb array<long>, n_tokens)``.

    MAP-ONLY: token hashes materialize once per document and a single
    ``aggregate`` higher-order fold builds the dense vector in-place —
    the token stream is never exploded or shuffled (the groupBy(doc,
    component) formulation ships every token through an exchange; at
    corpus scale that shuffle IS the job). Integer counts end to end,
    so the vector is bit-identical in any engine.
    """
    from cassandra_diff_spark.functions.text import md5_hash64

    w = words(F.col(text_col))
    hs = F.when(
        F.length(F.trim(F.col(text_col))) == 0, F.array().cast("array<long>")
    ).otherwise(F.transform(w, lambda t: md5_hash64(t)))
    d = int(dim)
    emb = F.aggregate(
        F.col("__hs"),
        F.array_repeat(F.lit(0).cast("long"), d),
        lambda acc, h: F.transform(
            acc,
            # sign bit = (h div d) % 2, written as pmod(h, 2d) < d so the
            # arithmetic stays exact-integer (h / d would promote to
            # double and lose bits above 2^53 on the 60-bit hash)
            lambda x, i: x
            + F.when(
                F.pmod(h, F.lit(d)) == i.cast("long"),
                F.when(
                    F.pmod(h, F.lit(2 * d)) < F.lit(d), F.lit(1)
                ).otherwise(F.lit(-1)),
            ).otherwise(F.lit(0)).cast("long"),
        ),
    )
    return (
        df.select(F.col(id_col).alias("doc_id"), hs.alias("__hs"))
        .select(
            "doc_id",
            emb.alias("emb"),
            F.size("__hs").cast("long").alias("n_tokens"),
        )
    )


LM_SCALE = 1_000_000  # micro-nats: ROUND(ln p * 1e6) per token, then SUM


def lm_unigram_score(
    df: DataFrame,
    id_col: str,
    text_col: str,
    counts: DataFrame | None = None,
    alpha: float = 1.0,
) -> DataFrame:
    """Per-document add-alpha unigram log-likelihood — the CCNet-style
    language-model quality signal (fluent in-distribution text scores
    high, gibberish and boilerplate-of-another-register score low).

    ``counts`` is an ``(token, n)`` frame from :func:`token_counts` (pass a
    persisted one to score new batches against a frozen corpus model —
    the incremental path); default scores the corpus against itself.
    Token log-probability is ``ln((n + alpha) / (T + alpha * V))`` with
    ``n = 0`` for out-of-vocabulary tokens, ``T`` total training tokens,
    ``V`` distinct training tokens.

    Scale shape: model stats are one broadcast row; the model itself is a
    broadcast map-side join (unigram vocabularies are MBs even at web
    scale); per-token micro-nat rounding BEFORE the sum keeps the
    aggregation order-free and cross-engine bit-stable.

    Output: ``(id, n_tokens, logprob_u)`` — ``logprob_u`` is the summed
    per-token log-probability in integer micro-nats; divide by
    ``n_tokens`` for the mean. Empty documents score 0 with 0 tokens.
    """
    if counts is None:
        counts = token_counts(df, text_col)
    stats = counts.agg(
        F.sum("n").alias("__T"), F.count(F.lit(1)).alias("__V")
    )
    toks = (
        df.select(F.col(id_col), F.explode(words(F.col(text_col))).alias("token"))
        .filter(F.col("token") != "")
    )
    scored = (
        toks.join(F.broadcast(counts), "token", "left")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "__lp_u",
            F.round(
                F.log(
                    (F.coalesce(F.col("n"), F.lit(0)) + F.lit(alpha))
                    / (F.col("__T") + F.lit(alpha) * F.col("__V"))
                )
                * LM_SCALE
            ).cast("long"),
        )
    )
    per_doc = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.sum("__lp_u").alias("logprob_u"),
    )
    return (
        df.select(id_col).distinct()
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce("logprob_u", F.lit(0)).cast("long").alias("logprob_u"),
        )
    )


def doc_frequencies(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """``(token, df)``: the number of DISTINCT documents containing each
    token — the idf input. ``array_distinct`` runs per document BEFORE
    the explode, so each document ships each of its tokens once (the
    shuffle carries the document's vocabulary, not its length) and a
    plain COUNT gives the document frequency with no count_distinct
    Expand. Persist this frame to freeze an idf model
    (:func:`hash_embed_tfidf`'s ``dfreq=`` incremental path)."""
    return (
        df.filter(F.col(text_col).isNotNull())
        .select(
            F.col(id_col),
            F.explode(
                F.when(
                    F.length(F.trim(F.col(text_col))) == 0,
                    F.array().cast("array<string>"),
                ).otherwise(F.array_distinct(words(F.col(text_col))))
            ).alias("token"),
        )
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("df"))
    )


def hash_embed_tfidf(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    dim: int = 64,
    dfreq: Optional[DataFrame] = None,
    n_docs: Optional[int] = None,
) -> DataFrame:
    """TF-IDF-weighted feature hashing: like :func:`hash_embed`, but
    each token adds ``±idf_u`` instead of ±1 at its hashed component —
    stopwords (df ~ N) contribute ~0 while informative tokens dominate,
    which is what the downstream cosine ANN / near-dup / centroid
    operators actually want from a model-free text vector.

    ``idf_u = round(1e6 * ln((N+1)/(df+1)))`` — an integer micro-nat
    weight (the :func:`lm_unigram_score` rounding discipline: per-token
    rounding BEFORE the sum keeps every component an exact, order-free
    integer). Repeated tokens add repeatedly — tf comes free from the
    fold. Tokens absent from ``dfreq`` take df = 0 (the max-idf OOV
    weight).

    Pass a persisted ``dfreq`` (+ its ``n_docs``) to embed new batches
    against a FROZEN idf model — the incremental path that keeps
    tonight's vectors comparable with last month's index. Default
    derives both from ``df`` itself (N = non-null-text document count,
    computed in-plan — no driver count).

    Scale shape: the idf table aggregates to ONE map row (vocabularies
    are MBs at web scale — same broadcast posture as
    :func:`encode_documents`) and the vector builds in the same
    MAP-ONLY higher-order fold as :func:`hash_embed`: the token stream
    is never exploded, joined, or shuffled. NULL-text documents are
    excluded; empty documents embed as the zero vector.
    """
    from cassandra_diff_spark.functions.text import md5_hash64

    base = df.filter(F.col(text_col).isNotNull())
    if dfreq is None:
        dfreq = doc_frequencies(df, id_col, text_col)
    if n_docs is None:
        nrow = base.agg(F.count(F.lit(1)).cast("long").alias("__N"))
    else:
        nrow = base.sparkSession.range(1).select(
            F.lit(int(n_docs)).cast("long").alias("__N")
        )
    imap = dfreq.agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("token"), F.col("df").cast("long")))
        ).alias("__dfmap")
    )
    d = int(dim)
    w = words(F.col(text_col))
    idf_u = lambda t: F.round(  # noqa: E731
        F.log(
            (F.col("__N") + F.lit(1)).cast("double")
            / (F.coalesce(F.element_at(F.col("__dfmap"), t), F.lit(0)) + F.lit(1)).cast(
                "double"
            )
        )
        * LM_SCALE
    ).cast("long")
    pairs = F.when(
        F.length(F.trim(F.col(text_col))) == 0,
        F.array().cast("array<struct<h:bigint,w:bigint>>"),
    ).otherwise(
        F.transform(
            w, lambda t: F.struct(md5_hash64(t).alias("h"), idf_u(t).alias("w"))
        )
    )
    emb = F.aggregate(
        F.col("__p"),
        F.array_repeat(F.lit(0).cast("long"), d),
        lambda acc, p: F.transform(
            acc,
            lambda x, i: x
            + F.when(
                F.pmod(p["h"], F.lit(d)) == i.cast("long"),
                F.when(
                    F.pmod(p["h"], F.lit(2 * d)) < F.lit(d), p["w"]
                ).otherwise(-p["w"]),
            ).otherwise(F.lit(0)).cast("long"),
        ),
    )
    return (
        base.crossJoin(F.broadcast(imap))
        .crossJoin(F.broadcast(nrow))
        .select(F.col(id_col).alias("doc_id"), pairs.alias("__p"))
        .select(
            "doc_id",
            emb.alias("emb"),
            F.size("__p").cast("long").alias("n_tokens"),
        )
    )


def cooccurrence_counts(
    df: DataFrame,
    text_col: str,
    window: int = 2,
    symmetric: bool = True,
) -> DataFrame:
    """Skipgram co-occurrence counts — the word2vec/GloVe statistics
    pass: for every token position, count each token within the next
    ``window`` positions as a context. ``symmetric=True`` (the usual
    co-occurrence matrix) also credits the mirrored (context, center)
    event, so each within-window token pair contributes one count in
    each direction; ``False`` keeps only left-to-right pairs.

    Output: ``(token_a, token_b, n)``. Empty tokens (the ``words('')``
    artifact) are excluded, same contract as :func:`token_counts`.

    Scale shape: pair generation is a pure Catalyst nested-transform
    over the per-document words array — the token stream explodes once
    into (a, b) pairs and meets ONE map-side-combined groupBy whose
    reduce cardinality is the DISTINCT pair-type count (Zipf-bounded),
    not the corpus pair count. No join, no window, no Python. The
    symmetric mirror is emitted INSIDE the same per-row pairs array
    (not a union of the exploded stream with its swap, which would run
    the scan + tokenize + explode subtree twice pre-exchange): the
    doubled array holds exactly the union's multiset, so the grouped
    counts are bit-identical.
    """
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    toks = df.select(words(F.col(text_col)).alias("__w"))
    sz = F.size(F.col("__w"))
    # sequence(1, 0) would DESCEND ([1, 0]) — guard short docs explicitly
    outer = F.when(sz >= 2, F.sequence(F.lit(1), sz - 1)).otherwise(
        F.array().cast("array<int>")
    )

    def _dir(swap: bool):
        return F.flatten(
            F.transform(
                outer,
                lambda i: F.transform(
                    F.sequence(F.lit(1), F.least(F.lit(window), sz - i)),
                    lambda d: F.struct(
                        F.element_at(F.col("__w"), i + d if swap else i).alias("a"),
                        F.element_at(F.col("__w"), i if swap else i + d).alias("b"),
                    ),
                ),
            )
        )

    pairs = (
        F.concat(_dir(False), _dir(True)) if symmetric else _dir(False)
    )
    p = (
        toks.select(F.explode(pairs).alias("p"))
        .select(F.col("p.a").alias("token_a"), F.col("p.b").alias("token_b"))
        .filter((F.col("token_a") != "") & (F.col("token_b") != ""))
    )
    return p.groupBy("token_a", "token_b").agg(F.count(F.lit(1)).alias("n"))


def pmi_pairs(cooc: DataFrame, min_count: int = 1) -> DataFrame:
    """Pointwise mutual information over a co-occurrence frame — the
    collocation/phrase-mining signal ("new york" binds; "of the" does
    not): ``PMI(a,b) = ln(n_ab * N / (n_a * n_b))`` in integer
    micro-nats with the per-cell rounding discipline of
    :func:`~cassandra_diff_spark.operators.stats.mutual_info`, so the
    score is bit-identical in any engine.

    Marginals are computed over the FULL matrix before the
    ``min_count`` display filter (dropping rare pairs must not deflate
    the denominators). Output: ``(token_a, token_b, n, pmi_micronat)``.

    Scale shape: the corpus-sized work already happened in
    :func:`cooccurrence_counts`; marginals are vocabulary-sized
    groupBys JOINED back on the token — deliberately not windows
    partitioned by token, which would pin every partner of a stopword
    ("the" co-occurs with half the vocabulary) into ONE task; the join
    shape lets AQE split the hot tokens. The global total broadcasts.
    """
    ma = cooc.groupBy("token_a").agg(F.sum("n").alias("__ca"))
    mb = cooc.groupBy("token_b").agg(F.sum("n").alias("__cb"))
    total = cooc.agg(F.sum("n").alias("__nn"))
    cells = (
        cooc.join(ma, "token_a")
        .join(mb, "token_b")
        .select("token_a", "token_b", "n", "__ca", "__cb")
        .crossJoin(F.broadcast(total))
    )
    n_d = F.col("n").cast("double")
    term = F.round(
        F.log(
            (n_d * F.col("__nn").cast("double"))
            / (F.col("__ca").cast("double") * F.col("__cb").cast("double"))
        )
        * F.lit(1e6)
    ).cast("long")
    return (
        cells.filter(F.col("n") >= min_count)
        .select("token_a", "token_b", "n", term.alias("pmi_micronat"))
    )


def js_divergence(counts_a: DataFrame, counts_b: DataFrame) -> DataFrame:
    """Jensen-Shannon divergence between two token-frequency frames —
    the corpus-drift alarm for TEXT ("did this month's crawl change
    vocabulary"), completing the drift triad next to centroid_shift
    (embeddings) and profile_drift (columns). Inputs are two
    :func:`token_counts` frames ``(token, n)`` — persist yesterday's,
    diff today's, the corpora are never re-tokenized.

    ``JS = 0.5*KL(P||M) + 0.5*KL(Q||M)`` with ``M = (P+Q)/2``, in
    integer micro-nats: the per-token term
    ``0.5 * (p*ln(2·a·B/(a·B+b·A)) + q*ln(2·b·A/(a·B+b·A)))`` is
    computed from the exact integer counts (a zero count contributes 0
    by the KL convention), ROUNDED per token, then integer-summed —
    order-free and engine-exact (the PMI/entropy discipline). Bounds:
    0 (identical) to ln 2 ≈ 693147 micro-nats (disjoint).

    One row: ``(n_tokens_union, total_a, total_b, js_micronat)``.

    Scale shape: ONE null-safe full-outer join of two vocabulary-sized
    count frames + broadcast totals + a global integer sum — nothing
    corpus-sized moves.
    """
    a = counts_a.select(F.col("token").alias("t"), F.col("n").alias("ca"))
    b = counts_b.select(F.col("token").alias("t"), F.col("n").alias("cb"))
    ta = a.agg(F.sum("ca").alias("tot_a"))
    tb = b.agg(F.sum("cb").alias("tot_b"))
    j = (
        a.join(b, "t", "full_outer")
        .select(
            F.coalesce(F.col("ca"), F.lit(0)).alias("ca"),
            F.coalesce(F.col("cb"), F.lit(0)).alias("cb"),
        )
        .crossJoin(F.broadcast(ta))
        .crossJoin(F.broadcast(tb))
    )
    # doubles built from exact integers; the mixture ratio uses the
    # cross products so no intermediate distribution is materialized
    aB = F.col("ca").cast("double") * F.col("tot_b").cast("double")
    bA = F.col("cb").cast("double") * F.col("tot_a").cast("double")
    p = F.col("ca").cast("double") / F.col("tot_a").cast("double")
    q = F.col("cb").cast("double") / F.col("tot_b").cast("double")
    term = F.round(
        (
            F.when(F.col("ca") == 0, F.lit(0.0)).otherwise(
                p * F.log(F.lit(2.0) * aB / (aB + bA))
            )
            + F.when(F.col("cb") == 0, F.lit(0.0)).otherwise(
                q * F.log(F.lit(2.0) * bA / (aB + bA))
            )
        )
        * F.lit(0.5)
        * F.lit(1e6)
    ).cast("long")
    return j.select(term.alias("__t"), "tot_a", "tot_b").agg(
        F.count(F.lit(1)).alias("n_tokens_union"),
        F.max("tot_a").alias("total_a"),
        F.max("tot_b").alias("total_b"),
        F.sum("__t").alias("js_micronat"),
    )


def fold_cooccurrence_counts(
    cooc: DataFrame,
    batch: DataFrame,
    text_col: str,
    window: int = 2,
    symmetric: bool = True,
) -> DataFrame:
    """Fold a NEW document batch into persisted co-occurrence counts —
    the incremental arm of the collocation/PMI pipeline (the
    fold_token_counts pattern: skipgram pair counts are additive, so
    fold == rebuild exactly and the historical corpus is never
    re-tokenized). Pass the SAME ``window``/``symmetric`` the persisted
    frame was built with — a mismatch silently mixes two different
    statistics (the same contract every fold in the family carries).

    One batch scan + one map-side-combined sum over the union at
    pair-type cardinality.
    """
    return (
        cooc.unionByName(
            cooccurrence_counts(batch, text_col, window=window, symmetric=symmetric)
        )
        .groupBy("token_a", "token_b")
        .agg(F.sum("n").alias("n"))
    )


# ---------------------------------------------------------------- BPE
#
# Byte-pair-encoding tokenizer training, Spark-first. The classic
# algorithm (Sennrich et al. 2016) iterates: count adjacent symbol
# pairs, merge the most frequent pair everywhere, repeat. Re-expressed
# for a 100 TB corpus:
#
#   * training runs over the WORD-FREQUENCY table, not the corpus — one
#     corpus-sized tokenize+groupBy up front, then every merge iteration
#     touches only |word types| rows (Zipf: millions, not trillions);
#   * a merge is ONE map-only string REPLACE plus ONE shuffle at
#     symbol-pair-type cardinality (the cooccurrence_counts shape) and a
#     single 1-row collect of the argmax — per iteration, regardless of
#     corpus size;
#   * encoding is map-only: the learned merge list folds into nested
#     JVM-side replace expressions (literals in the plan — nothing is
#     broadcast, no UDF), applied per word inside higher-order array
#     functions, so the token stream is never exploded or shuffled.
#
# Symbol sequences are represented as MARKER-WRAPPED strings: every
# symbol is enclosed in \x01..\x02, so the pair (a, b) occurs in a word
# iff the string "\x01a\x02\x01b\x02" occurs — no false matches across
# symbol boundaries ("aa b" never matches "a b") — and a merge is a
# plain left-to-right non-overlapping REPLACE, which has IDENTICAL
# semantics in Spark, DuckDB, and Python str.replace ("a a a" with
# (a,a) -> "aa a", exactly the classic pairwise-walk merge). Pair
# counting counts overlapping occurrences (the classic get_stats), the
# merge applies non-overlapping left-to-right (the classic merge): both
# faithful to the reference algorithm. Ties break (count DESC, left
# ASC, right ASC) — deterministic, byte-wise in both engines.

_BPE_L = "\x01"  #: symbol open marker
_BPE_R = "\x02"  #: symbol close marker
_BPE_EOW = "\x03"  #: end-of-word symbol byte (rendered "</w>" in outputs)
_BPE_EOW_SHOW = "</w>"


def _bpe_marker_free(col):
    """True iff the word contains none of the three marker bytes NOR
    the rendered end-of-word marker ``</w>`` (both engines drop such
    words identically before training/encoding). The rendered marker is
    the one reserved token of the OUTPUT alphabet: a word containing
    the literal substring ``</w>`` would decode with a spurious
    boundary, so the domain excludes it up front — closing the decode
    round-trip hole instead of relying on corpora never containing
    it."""
    return ~col.rlike("[\x01\x02\x03]") & ~col.contains(_BPE_EOW_SHOW)


def _bpe_wrap(word_col):
    """Initial symbol string of a word: each character wrapped in
    markers, plus the end-of-word symbol."""
    return F.concat(
        F.array_join(
            F.transform(
                F.split(word_col, ""),
                lambda c: F.concat(F.lit(_BPE_L), c, F.lit(_BPE_R)),
            ),
            "",
        ),
        F.lit(_BPE_L + _BPE_EOW + _BPE_R),
    )


def bpe_word_counts(df: DataFrame, text_col: str) -> DataFrame:
    """(word, cnt, syms): the word-frequency table with each word's
    initial wrapped symbol string — the ONLY corpus-sized pass of BPE
    training (map-side-combined groupBy at word-type cardinality)."""
    w = (
        df.filter(F.col(text_col).isNotNull())
        .select(F.explode(words(F.col(text_col))).alias("word"))
        .filter((F.col("word") != "") & _bpe_marker_free(F.col("word")))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    return w.select("word", "cnt", _bpe_wrap(F.col("word")).alias("syms"))


def bpe_pair_counts(wc: DataFrame) -> DataFrame:
    """(left_sym, right_sym, pair_count) over a (cnt, syms) frame: every
    adjacent symbol pair, occurrences weighted by word frequency. One
    shuffle at pair-type cardinality."""
    d = wc.select(
        "cnt",
        F.expr("substring(syms, 2, length(syms) - 2)").alias("__body"),
    ).select("cnt", F.split("__body", _BPE_R + _BPE_L).alias("__sy"))
    pairs = F.zip_with(
        F.expr("slice(__sy, 1, size(__sy) - 1)"),
        F.expr("slice(__sy, 2, size(__sy) - 1)"),
        lambda a, b: F.struct(a.alias("a"), b.alias("b")),
    )
    return (
        d.select("cnt", F.explode(pairs).alias("p"))
        .groupBy(
            F.col("p.a").alias("left_sym"), F.col("p.b").alias("right_sym")
        )
        .agg(F.sum("cnt").cast("long").alias("pair_count"))
    )


def bpe_train(
    df: DataFrame,
    text_col: str,
    num_merges: int = 32,
    *,
    min_count: int = 1,
    checkpoint_every: int = 16,
) -> list[tuple[int, str, str, str, int]]:
    """Train a BPE merge list: ``[(merge_rank, left_sym, right_sym,
    merged, pair_count)]``, rank 1-based in merge order. Stops early
    when no pair reaches ``min_count`` (or none is left).

    The returned list is a driver-held kilobyte object (like
    :func:`~cassandra_diff_spark.operators.similarity.pq_train`'s
    codebooks): vocab-sized, never data-sized. Each iteration collects
    exactly ONE argmax row; ``checkpoint_every`` localCheckpoints the
    word table to keep the nested-replace lineage bounded for large
    merge counts."""
    # the word table is scanned once per merge iteration — persist it so
    # the corpus-sized tokenize+groupBy runs exactly once, not N times
    base = bpe_word_counts(df, text_col).select("cnt", "syms").persist()
    cur = base
    merges: list[tuple[int, str, str, str, int]] = []
    for rank in range(1, int(num_merges) + 1):
        best = (
            bpe_pair_counts(cur)
            .orderBy(
                F.col("pair_count").desc(),
                F.col("left_sym").asc(),
                F.col("right_sym").asc(),
            )
            .limit(1)
            .collect()
        )
        if not best or best[0].pair_count < min_count:
            break
        a, b, n = best[0].left_sym, best[0].right_sym, best[0].pair_count
        merges.append((rank, a, b, a + b, int(n)))
        pat = _BPE_L + a + _BPE_R + _BPE_L + b + _BPE_R
        rep = _BPE_L + a + b + _BPE_R
        cur = cur.withColumn("syms", F.replace(F.col("syms"), F.lit(pat), F.lit(rep)))
        if checkpoint_every and rank % int(checkpoint_every) == 0:
            cur = cur.localCheckpoint()
    base.unpersist()
    return merges


def _bpe_pair_counts_local(s: str) -> dict:
    """Adjacent-pair occurrence counts of one wrapped symbol string —
    the driver-side twin of :func:`bpe_pair_counts` for a single word."""
    sy = s[1:-1].split(_BPE_R + _BPE_L)
    out: dict = {}
    for p in zip(sy, sy[1:]):
        out[p] = out.get(p, 0) + 1
    return out


def _bpe_delta_frame(frame: DataFrame, pat: str, rep: str) -> DataFrame:
    """(left_sym, right_sym, pair_count) of the SIGNED pair-count
    change one merge makes to a ``(cnt, syms)`` word frame: affected
    words contribute their pre-merge pairs at ``-cnt`` and post-merge
    pairs at ``+cnt`` through one EXPLODE, so the input frame is
    evaluated ONCE (a union of two selects re-ran the lineage twice —
    measured 23 s vs 15 s at 256 merges on the gate docs). The reduce
    rides :func:`bpe_pair_counts`'s groupBy — Catalyst's partial hash
    aggregate does the map-side combine JVM-side, which is why this is
    NOT a Pandas UDF: the per-word delta diff is exactly "count pairs
    of two strings", already expressible as vectorized expressions, and
    the shuffle is at changed-pair-type cardinality either way."""
    aff = frame.filter(F.col("syms").contains(pat))
    src = aff.select(
        F.explode(
            F.array(
                F.struct(
                    (-F.col("cnt")).alias("cnt"),
                    F.col("syms").alias("syms"),
                ),
                F.struct(
                    F.col("cnt").alias("cnt"),
                    F.replace(F.col("syms"), F.lit(pat), F.lit(rep)).alias(
                        "syms"
                    ),
                ),
            )
        ).alias("x")
    ).select("x.cnt", "x.syms")
    return bpe_pair_counts(src).filter(F.col("pair_count") != 0)


def _bpe_merge_step_local_ref(words_: list, index: dict, a: str, b: str):
    """Reference (whole-word recount) twin of
    :func:`_bpe_merge_step_local`, kept for the property tests that
    pin the neighbor-diff kernel's net deltas and rewrites to it.
    Reads the index the same lazily-verified way; maintenance only
    ADDS (the shared lazy-index contract)."""
    pat = _BPE_L + a + _BPE_R + _BPE_L + b + _BPE_R
    rep = _BPE_L + a + b + _BPE_R
    net: dict = {}
    aff: list = []
    for widx in index.get((a, b), ()):
        cnt, s = words_[widx]
        if pat not in s:
            continue  # stale entry — adjacency merged away earlier
        aff.append(widx)
        old = _bpe_pair_counts_local(s)
        new_s = s.replace(pat, rep)
        new = _bpe_pair_counts_local(new_s)
        for p in old.keys() | new.keys():
            d = (new.get(p, 0) - old.get(p, 0)) * cnt
            if d:
                net[p] = net.get(p, 0) + d
            if p not in old and p in new:
                index.setdefault(p, set()).add(widx)
        words_[widx][1] = new_s
    index.pop((a, b), None)
    return aff, {p: d for p, d in net.items() if d}


def _bpe_merge_step_local(words_: list, index: dict, a: str, b: str):
    """The Sennrich per-merge bookkeeping SHARED by every driver-
    resident merge loop (:func:`_bpe_train_local` and the batched
    stage of :func:`bpe_train_incremental` — one body, so the two
    paths' byte-identity contract cannot drift): rewrite the words
    containing (a, b) in place, maintain the inverted ``pair -> {word
    idx}`` index, and return ``(affected_word_indices, net_delta)``
    where net_delta maps pair -> signed count change (a net-zero pair
    change is not a change).

    NEIGHBOR-DIFF kernel (r12: the head-window cost was whole-word
    recounts — two splits + two dict builds per affected word): only
    the adjacencies AROUND each merged occurrence change, so the
    deltas are computed straight off the marker-aligned occurrence
    positions (``str.find``-scanned with the same non-overlapping
    left-to-right advance as ``str.replace``, whose output stays the
    canonical rewrite). Adjacent occurrences dedupe by ownership:
    every occurrence owns its left pair and its (a, b); it owns its
    right pair only when the NEXT occurrence is not flush against it
    (else that pair IS the next occurrence's left pair). Marker
    wrapping makes every match symbol-aligned, so neighbor symbols
    parse by scanning to the enclosing markers.

    The index is LAZILY VERIFIED: maintenance only ADDS entries (the
    two new-adjacency pairs per occurrence, both involving the merged
    symbol); entries go stale when a later merge removes a pair from
    a word, and every reader — this function — re-checks ``pat in s``
    before diffing, so stale entries cost one C-level substring scan
    and nothing else. ``aff`` counts only verified words, matching the
    eager bookkeeping it replaced (property-pinned against
    :func:`_bpe_merge_step_local_ref`)."""
    pat = _BPE_L + a + _BPE_R + _BPE_L + b + _BPE_R
    rep = _BPE_L + a + b + _BPE_R
    ab = a + b
    plen = len(pat)
    net: dict = {}
    aff: list = []
    for widx in index.get((a, b), ()):
        cnt, s = words_[widx]
        i = s.find(pat)
        if i < 0:
            continue  # stale entry — adjacency merged away earlier
        aff.append(widx)
        occs = [i]
        i = s.find(pat, i + plen)
        while i >= 0:
            occs.append(i)
            i = s.find(pat, i + plen)
        n_occ = len(occs)
        for k, i in enumerate(occs):
            net[(a, b)] = net.get((a, b), 0) - cnt
            if i > 0:
                # old left pair (prev, a); new left pair (prev', ab)
                # where prev' is the merged symbol when the previous
                # occurrence ends flush at i
                j = s.rfind(_BPE_L, 0, i)
                prev_sym = s[j + 1 : i - 1]
                p_old = (prev_sym, a)
                net[p_old] = net.get(p_old, 0) - cnt
                p_new = (
                    ab if (k and occs[k - 1] + plen == i) else prev_sym,
                    ab,
                )
                net[p_new] = net.get(p_new, 0) + cnt
                index.setdefault(p_new, set()).add(widx)
            end = i + plen
            if end < len(s) and not (
                k + 1 < n_occ and occs[k + 1] == end
            ):
                # right pair owned only when the next occurrence is
                # not flush (else it is that occurrence's left pair)
                m = s.find(_BPE_R, end)
                nxt_sym = s[end + 1 : m]
                p_old = (b, nxt_sym)
                net[p_old] = net.get(p_old, 0) - cnt
                p_new = (ab, nxt_sym)
                net[p_new] = net.get(p_new, 0) + cnt
                index.setdefault(p_new, set()).add(widx)
        words_[widx][1] = s.replace(pat, rep)
    # the merged pair is extinct in every word (ab != a and ab != b,
    # so no new (a, b) adjacency can survive the rewrite)
    index.pop((a, b), None)
    return aff, {p: d for p, d in net.items() if d}


def _bpe_train_local(
    rows: list,
    num_merges: int,
    *,
    min_count: int,
    max_pair_types: int,
    stats: list | None,
    stats_every: int,
) -> list[tuple[int, str, str, str, int]]:
    """Driver-resident merge loop over a collected ``(cnt, syms)`` word
    table — the under-cap fast path of :func:`bpe_train_incremental`
    (see there for the dispatch contract). Byte-identical output by
    construction: same wrapped-string representation, the SAME
    left-to-right non-overlapping replace (Python ``str.replace`` —
    semantics pinned equal to Spark/DuckDB REPLACE by the engine's BPE
    tests), same ``(count DESC, left, right)`` tie-break, and the same
    net-delta accounting (a net-zero pair change is not a change).

    The classic Sennrich fast structure: besides the pair-count dict,
    an inverted index ``pair -> {word idx}`` makes each merge touch
    only the words that CONTAIN the pair — per-merge work proportional
    to affected words, with zero job-launch overhead, which is why this
    path beats the distributed delta loop by ~1000x per merge whenever
    the word table fits on the driver.

    The argmax is a LAZY-DELETION MAX-HEAP, not a dict scan: the r10
    4096-merge probe showed the scan's per-merge cost growing with the
    pair-type table (0.06 s/merge in the first quarter of the schedule,
    0.15 in the last — a quadratic total that would put 32k merges at
    hours, not minutes). Every count change pushes a fresh
    ``(-count, left, right)`` entry; pops discard entries whose count
    no longer matches the live dict. Tuple order reproduces the exact
    ``(count DESC, left ASC, right ASC)`` tie-break of the scan, so the
    merge sequence is byte-identical (property-tested against the
    distributed path)."""
    import heapq

    words_: list[list] = [[int(cnt), s] for cnt, s in rows]
    pc: dict[tuple[str, str], int] = {}
    index: dict[tuple[str, str], set] = {}
    for widx, (cnt, s) in enumerate(words_):
        for p, k in _bpe_pair_counts_local(s).items():
            pc[p] = pc.get(p, 0) + k * cnt
            index.setdefault(p, set()).add(widx)
    if len(pc) > int(max_pair_types):
        raise ValueError(
            f"more than max_pair_types={max_pair_types} distinct symbol "
            "pairs — the driver-side count table would not fit; raise the "
            "cap or use bpe_train (distributed recount per merge)"
        )
    heap = [(-n, p[0], p[1]) for p, n in pc.items()]
    heapq.heapify(heap)
    merges: list[tuple[int, str, str, str, int]] = []
    for rank in range(1, int(num_merges) + 1):
        # pop past stale entries (count changed since push, or pair gone)
        while heap and pc.get((heap[0][1], heap[0][2])) != -heap[0][0]:
            heapq.heappop(heap)
        if not heap:
            break
        negn, a, b = heapq.heappop(heap)
        n = -negn
        if n < min_count:
            break
        merges.append((rank, a, b, a + b, int(n)))
        aff, net = _bpe_merge_step_local(words_, index, a, b)
        n_delta = 0
        for p, d in net.items():
            if not d:
                continue
            n_delta += 1
            c = pc.get(p, 0) + d
            if c < 0:  # accounting must balance exactly; never heal silently
                raise AssertionError(
                    f"negative pair count for {p!r} after merge {rank}"
                )
            if c:
                pc[p] = c
                # lazy heap maintenance: push the fresh count; any older
                # entry for p is now stale and filtered at pop time
                heapq.heappush(heap, (-c, p[0], p[1]))
            else:
                pc.pop(p, None)
        if stats is not None and (
            rank == 1 or rank % max(int(stats_every), 1) == 0
        ):
            # 4th element: wall-clock stamp, so probes can derive the
            # per-merge TIME trend from one run (earlier consumers index
            # [0..2] only — the append is backward compatible)
            stats.append((rank, len(aff), n_delta, _time.time()))
    return merges


def bpe_train_incremental(
    df: DataFrame,
    text_col: str,
    num_merges: int = 32,
    *,
    min_count: int = 1,
    checkpoint_every: int = 16,
    max_pair_types: int = 5_000_000,
    stats: list | None = None,
    stats_every: int = 1,
    driver_word_cap: int = 1_000_000,
    batch_pairs: int = 64,
    batch_word_cap: int = 2_000_000,
    cluster_delta_min_words: int = 0,
) -> list[tuple[int, str, str, str, int]]:
    """:func:`bpe_train` with INCREMENTAL pair counting — the path for
    real vocabularies (a 32k-merge train is 32k iterations; recounting
    every pair each time is 32k pair-type shuffles over the full word
    table). Identical output to :func:`bpe_train` (same representation,
    same tie-break, property-tested equal); only the bookkeeping moves.

    The classic observation (Sennrich's own fast implementation): a
    merge changes pair counts ONLY inside words that contain the merged
    pair. So pair counts live in a driver-side dict, seeded by ONE full
    distributed count, and each iteration:

      * argmax is a driver dict scan — NO Spark job;
      * ``affected = cur.filter(syms CONTAINS pattern)`` — the marker
        wrapping makes the containment test exact, no false positives
        across symbol boundaries;
      * one job computes signed deltas: affected words contribute their
        pre-merge pairs at ``-cnt`` and post-merge pairs at ``+cnt``
        through the same :func:`bpe_pair_counts` shuffle — whose input
        is now |affected| rows, not |word types| (Zipf: the affected
        set collapses once merges leave the head);
      * the word table advances by the same map-only REPLACE as
        :func:`bpe_train` (no-op on unaffected rows), checkpointed
        every ``checkpoint_every`` merges to bound the nested lineage.

    Driver memory is O(pair types) — ints in a dict, the same budget
    class as pq_train's codebooks but data-dependent, so it is
    FAIL-FAST capped at ``max_pair_types`` (the MAX_DRIVER_QUERIES
    discipline): past the cap, fall back to :func:`bpe_train`, which
    holds only one argmax row at a time.

    HYBRID dispatch (the ``dedup_clusters`` union-find pattern): when
    the word-TYPE table itself fits on the driver (``<=
    driver_word_cap`` types; limit-bounded Arrow probe, MEASURED
    ~850 MB of strings + pair counts + inverted index per 1M word
    types — r12 RSS probe, see ``bpe_driver_resident_rss_mb`` — at
    the 1M default), the whole merge loop runs
    driver-side in :func:`_bpe_train_local` — byte-identical output,
    per-merge cost microseconds instead of a Spark job, which is the
    difference between a 1024-merge train taking seconds and taking
    ~0.9 s x merges of pure job-launch overhead. Word types are
    Zipf-bounded, so even large corpora often fit; past the cap the
    distributed delta loop below carries (its per-merge shuffle volume
    is proportional to AFFECTED words — the 100 TB term), and
    ``driver_word_cap=0`` forces it (tests, probes).

    ``stats``, if a list, receives one ``(rank, n_affected_word_types,
    n_delta_pair_types, wall_clock_ts)`` tuple per sampled merge — the
    work-proportionality evidence, plus a ``time.time()`` stamp so one
    run yields the per-merge TIME trend. The stamp is the r10-added 4th
    element: index access to ``[0..2]`` is stable, but consumers that
    tuple-unpack must bind all four, and the stamp makes raw ``stats``
    rows non-reproducible across runs by design (strip element 3 when
    comparing). The affected count costs one extra job
    (which re-runs the bounded replace lineage), so ``stats_every``
    samples it: 1 records every merge (tests/diagnostics), N records
    every Nth (the 1024-merge scale probe samples at 64 so the trend
    costs ~16 jobs, not 1024).

    Measured honestly: at TEST scale both paths are bound by per-merge
    Spark JOB overhead, not shuffle volume (60k synthetic docs / 50k
    word types / 300k pair types: 128 merges = 59 s incremental vs 55 s
    batch — a wash). The incremental win is the shuffle-volume term:
    it matters when one full pair-type recount costs much more than a
    job launch — i.e. real corpora, where the pair table is GBs and the
    Zipf-tail merges touch a sliver of words.

    The over-cap distributed loop BATCHES merges per Spark job (the r10
    verdict item: its per-merge wall time was ~0.7 s of pure job-launch
    floor). One job collects every word containing any of the top-
    ``batch_pairs`` candidate pairs; the merge loop then runs DRIVER-
    side over that bounded subset — exactly :func:`_bpe_train_local`'s
    bookkeeping — for as long as the global argmax stays "fully local"
    (all its occurrences inside the collected subset: true by
    construction for the candidates, and for pairs CREATED by a batch
    merge, which can only exist in rewritten — hence collected —
    words). The first argmax that might have occurrences outside the
    subset flushes the batch: the accumulated replaces apply to the
    distributed word table lazily (non-collected words contain no
    merged pattern, so the chained REPLACE is the identity on them) and
    a fresh candidate set is collected. Merge sequence BYTE-IDENTICAL
    to the sequential loop (property-tested): every merge is still
    chosen by the exact global argmax with the same tie-break, and its
    deltas are globally exact because all of its occurrences were
    local. ``batch_word_cap`` bounds the driver collect (2M default:
    the staged copy has no global pair table or full index, so it is
    lighter than the driver-resident path — measured ~350-450 B/word,
    ~0.8 GB at the cap): ONE sizing
    aggregate counts each candidate's affected word types up front and
    the batch takes the longest candidate prefix whose summed counts
    fit the cap (sum >= union, an a-priori bound — no wasted over-cap
    collect in the Zipf head, where one hot pair can touch ~20% of word
    types); when even the TOP pair exceeds the cap, that one merge
    degrades to a single-merge distributed delta step (the r9 loop),
    then batching resumes — per-merge shuffle volume stays proportional
    to affected words in every regime. ``batch_pairs=0`` forces the
    single-merge loop (probes).

    The CLUSTER-staged overflow regime (VERDICT r11 #5): when even
    the TOP pair alone exceeds ``batch_word_cap`` (so no driver batch
    can be staged at all — the regime that used to degrade to one
    distributed delta step per merge), or when the sizing aggregate
    shows the candidate batch touches >= ``cluster_delta_min_words``
    word types (opt-in; 0 — the default — leaves the sum-trigger off,
    because the measured local[32] job floor of ~1 s/merge loses to
    the Arrow-staged driver batch wherever the driver CAN hold the
    words), nothing is collected —
    the staged subset stays a persisted DataFrame and each merge's
    signed deltas come from one :func:`_bpe_delta_frame` job over it
    (JVM-side explode + partial hash aggregate; the collect is at
    changed-pair-type cardinality, never word-sized). The staged frame
    is persisted once per ``checkpoint_every``-merge window; merges
    since its materialization ride each job as chained on-the-fly
    ``F.replace`` expressions, so the per-merge plan depth is CONSTANT
    (a per-merge persisted chain grew the analyzed plan every merge
    and sent Catalyst analysis super-linear), and each window boundary
    re-materializes the frame from the previous cache (recompute
    depth 1) before releasing it. Merge selection is the SAME global
    pc/heap argmax with the same ``local_ok`` exactness argument
    (candidates: their filter staged every containing word; created
    pairs: exist only in rewritten, hence staged, words), so the merge
    sequence stays byte-identical across all regimes (property-tested).
    Overflow merges thus cost one Spark job each — proportional to
    affected words, never driver-resident — while every batch the
    driver CAN hold keeps the Arrow-staged collect-and-loop path
    whose per-merge cost is microseconds.
    """
    base = bpe_word_counts(df, text_col).select("cnt", "syms").persist()
    # every driver-bound word/pair table crosses via Arrow (toArrow +
    # column-wise to_pylist), not Row-object collect(): the Row path
    # measured ~60k rows/s and fat (one Row object per word, ~1-2 GB
    # at the 1M cap); Arrow is a few x faster and the driver copy is
    # plain str/int lists — the r11 "measure the driver-resident
    # bound" item rides on this being the real representation
    if driver_word_cap:
        head = base.limit(int(driver_word_cap) + 1).toArrow()
        if head.num_rows <= int(driver_word_cap):
            try:
                return _bpe_train_local(
                    list(
                        zip(
                            head.column("cnt").to_pylist(),
                            head.column("syms").to_pylist(),
                        )
                    ),
                    num_merges,
                    min_count=min_count,
                    max_pair_types=max_pair_types,
                    stats=stats,
                    stats_every=stats_every,
                )
            finally:
                base.unpersist()
        del head  # over cap: fall through to the distributed delta loop
    cur = base
    seed = bpe_pair_counts(cur).limit(int(max_pair_types) + 1).toArrow()
    if seed.num_rows > int(max_pair_types):
        base.unpersist()
        raise ValueError(
            f"more than max_pair_types={max_pair_types} distinct symbol "
            "pairs — the driver-side count table would not fit; raise the "
            "cap or use bpe_train (distributed recount per merge)"
        )
    pc: dict[tuple[str, str], int] = dict(
        zip(
            zip(
                seed.column("left_sym").to_pylist(),
                seed.column("right_sym").to_pylist(),
            ),
            seed.column("pair_count").to_pylist(),
        )
    )
    del seed
    # same lazy-deletion heap argmax as the driver-local path: the dict
    # scan grows with the pair-type table (quadratic across a long merge
    # schedule); identical (count DESC, left, right) total order
    import heapq

    heap = [(-n_, p[0], p[1]) for p, n_ in pc.items()]
    heapq.heapify(heap)
    merges: list[tuple[int, str, str, str, int]] = []

    def _pop_live():
        """Pop until a LIVE entry surfaces (lazy-deletion cleanup of
        stale counts); None when the heap drains."""
        while heap:
            e = heapq.heappop(heap)
            if pc.get((e[1], e[2])) == -e[0]:
                return e
        return None

    def _apply_net(net: dict, local_ok: "set | None") -> int:
        """Fold signed pair-count deltas into pc/heap; returns the
        changed-pair count. When batching, a pair whose count goes
        0 -> positive was CREATED by a batch merge — its occurrences
        exist only in rewritten (collected) words, so it joins
        local_ok."""
        n_delta = 0
        for p, dlt in net.items():
            if not dlt:
                continue
            n_delta += 1
            old = pc.get(p, 0)
            c = old + dlt
            if c < 0:  # accounting must balance exactly; never heal
                raise AssertionError(f"negative pair count for {p!r}")
            if local_ok is not None and old == 0 and dlt > 0:
                local_ok.add(p)
            if c:
                pc[p] = c
                heapq.heappush(heap, (-c, p[0], p[1]))
            else:
                pc.pop(p, None)
        return n_delta

    def _sampled(rank_: int) -> bool:
        return stats is not None and (
            rank_ == 1 or rank_ % max(int(stats_every), 1) == 0
        )

    pending_since_cp = 0
    while len(merges) < int(num_merges):
        top = _pop_live()
        if top is None:
            break
        if -top[0] < min_count:
            break
        heapq.heappush(heap, top)  # selection re-runs inside the batch
        # ---- candidate set: the top batch_pairs live pairs. Every
        # candidate's occurrences are ALL inside the collected subset
        # (the filter matches every word containing its pattern), which
        # is what makes its deltas globally exact when merged locally.
        k = max(int(batch_pairs), 0)
        cand: list[tuple[str, str]] = []
        popped: list = []
        seen: set = set()
        while heap and len(cand) < max(k, 1):
            e = heapq.heappop(heap)
            if pc.get((e[1], e[2])) != -e[0]:
                continue  # stale: drop for good
            popped.append(e)
            if (e[1], e[2]) not in seen:
                seen.add((e[1], e[2]))
                cand.append((e[1], e[2]))
        for e in popped:
            heapq.heappush(heap, e)
        rows = None
        take_n = 0
        top_aff_cnt = None
        staged = None
        if k and cand and len(cand) <= 64:
            # ONE candidate-containment pass per batch: each word's
            # candidate MASK (two long columns, bit j = word contains
            # candidate j's pattern) is computed once into a persisted
            # frame; the sizing aggregate then reads per-candidate
            # affected-word counts as bitwise popcount sums off that
            # cache, and the staging collect is a bitwise filter off
            # the same cache — the 64-contains scan (the dominant head
            # cost once the kernel went neighbor-diff) runs once, not
            # two-to-three times. The sizing still bounds the collect
            # A-PRIORI: the batch takes the longest candidate PREFIX
            # whose summed counts fit the cap (sum >= union — no
            # wasted over-cap collect in the Zipf head, where a single
            # hot pair can touch ~20% of word types).
            pats = [
                _BPE_L + ca + _BPE_R + _BPE_L + cb + _BPE_R
                for ca, cb in cand
            ]
            m0 = F.lit(0).cast("long")
            m1 = F.lit(0).cast("long")
            for j, p in enumerate(pats):
                bit = F.col("syms").contains(p).cast("long")
                if j < 32:
                    m0 = m0 + bit * F.lit(1 << j)
                else:
                    m1 = m1 + bit * F.lit(1 << (j - 32))
            masked = cur.select(
                "cnt", "syms", m0.alias("m0"), m1.alias("m1")
            ).persist()
            try:
                cnt_row = masked.select(
                    *[
                        F.sum(
                            F.shiftright(
                                F.col("m0" if j < 32 else "m1"),
                                j % 32,
                            ).bitwiseAND(F.lit(1))
                        ).alias(f"c{j}")
                        for j in range(len(pats))
                    ]
                ).first()
                counts = [int(cnt_row[j] or 0) for j in range(len(pats))]
                top_aff_cnt = counts[0]
                if top_aff_cnt > int(batch_word_cap) or (
                    cluster_delta_min_words
                    and sum(counts) >= int(cluster_delta_min_words)
                ):
                    # capacity-overflow regime: the batch cannot be
                    # staged on the driver, so stage the candidate-
                    # affected subset CLUSTER-side — every candidate
                    # rides (no prefix cap; nothing is collected),
                    # deltas come from per-merge jobs below
                    staged = (
                        masked.filter(
                            (F.col("m0") != 0) | (F.col("m1") != 0)
                        )
                        .select("cnt", "syms")
                        .persist()
                    )
                    staged.count()  # materialize off masked's cache
                else:
                    tot = 0
                    for i, ci in enumerate(counts):
                        if tot + ci > int(batch_word_cap):
                            break
                        tot += ci
                        take_n = i + 1
                    if take_n:
                        bits0 = (1 << min(take_n, 32)) - 1
                        bits1 = (1 << max(take_n - 32, 0)) - 1
                        fcond = F.col("m0").bitwiseAND(F.lit(bits0)) != 0
                        if bits1:
                            fcond = fcond | (
                                F.col("m1").bitwiseAND(F.lit(bits1)) != 0
                            )
                        # Arrow staging off the mask cache: rows cross
                        # as Arrow columns (Row-object collect measured
                        # ~60k rows/s and ~1 KB/word on the driver)
                        rows = masked.filter(fcond).toArrow()
                    cand = cand[:take_n]
            finally:
                masked.unpersist()
        elif k and cand:
            # batch_pairs > 64: no mask encoding — the original
            # two-pass sizing + containment staging, candidate-only
            # index built by per-word recount below
            pats = [
                _BPE_L + ca + _BPE_R + _BPE_L + cb + _BPE_R
                for ca, cb in cand
            ]
            cnt_row = cur.select(
                *[
                    F.sum(F.col("syms").contains(p).cast("int")).alias(
                        f"c{i}"
                    )
                    for i, p in enumerate(pats)
                ]
            ).first()
            counts = [int(cnt_row[i] or 0) for i in range(len(pats))]
            top_aff_cnt = counts[0]
            if top_aff_cnt > int(batch_word_cap) or (
                cluster_delta_min_words
                and sum(counts) >= int(cluster_delta_min_words)
            ):
                cond = None
                for p in pats:
                    c_ = F.col("syms").contains(p)
                    cond = c_ if cond is None else (cond | c_)
                staged = cur.filter(cond).select("cnt", "syms").persist()
            else:
                tot = 0
                for i, ci in enumerate(counts):
                    if tot + ci > int(batch_word_cap):
                        break
                    tot += ci
                    take_n = i + 1
                if take_n:
                    cond = None
                    for p in pats[:take_n]:
                        c_ = F.col("syms").contains(p)
                        cond = c_ if cond is None else (cond | c_)
                    rows = (
                        cur.filter(cond).select("cnt", "syms").toArrow()
                    )
                cand = cand[:take_n]
        batch_reps: list[tuple[str, str]] = []
        if staged is not None:
            # ---- cluster-staged merge batch (VERDICT r11 #5): the
            # same global argmax + local_ok walk as the driver batch,
            # but each merge's signed deltas are ONE JVM-side job over
            # the persisted staged frame (collect at changed-pair-type
            # cardinality). The staged frame is persisted ONCE per
            # rewrite window, and the merges since its materialization
            # ride each delta job as <= rewrite_every chained F.replace
            # expressions applied ON THE FLY — NOT as a per-merge
            # persisted withColumn chain, whose analyzed plan grows
            # with every merge and sends Catalyst analysis +
            # cache-manager plan lookups super-linear (measured: ~1 s/
            # merge at rank 5, ~70 s/merge by rank 18 on a 40-doc
            # corpus). With the bounded window the per-merge plan
            # depth is CONSTANT; every rewrite_every merges one job
            # materializes a fresh staged frame from the old frame's
            # cache (recompute depth 1) and the old frame is released.
            local_ok = set(cand)
            rewrite_every = int(checkpoint_every) or 16
            pending: list[tuple[str, str]] = []

            def _live_syms():
                c = F.col("syms")
                for p_, r_ in pending:
                    c = F.replace(c, F.lit(p_), F.lit(r_))
                return c

            while len(merges) < int(num_merges):
                e = _pop_live()
                if e is None:
                    break
                if (e[1], e[2]) not in local_ok or -e[0] < min_count:
                    heapq.heappush(heap, e)  # next batch's (or no) merge
                    break
                negn, a, b = e
                rank = len(merges) + 1
                merges.append((rank, a, b, a + b, int(-negn)))
                pat = _BPE_L + a + _BPE_R + _BPE_L + b + _BPE_R
                rep = _BPE_L + a + b + _BPE_R
                live = staged.select("cnt", _live_syms().alias("syms"))
                deltas = _bpe_delta_frame(live, pat, rep).collect()
                net = {
                    (r.left_sym, r.right_sym): r.pair_count for r in deltas
                }
                n_delta = _apply_net(net, local_ok)
                if _sampled(rank):
                    # pre-merge affected word types, off the cache
                    n_aff = live.filter(
                        F.col("syms").contains(pat)
                    ).count()
                    stats.append((rank, n_aff, n_delta, _time.time()))
                pending.append((pat, rep))
                batch_reps.append((pat, rep))
                if len(pending) >= rewrite_every:
                    nxt = staged.select(
                        "cnt", _live_syms().alias("syms")
                    ).persist()
                    nxt.count()  # materialize off the old frame's cache
                    staged.unpersist()
                    staged = nxt
                    pending = []
            staged.unpersist()
        elif rows is None:
            # ---- single-merge distributed delta step: one EXPLODE
            # emits the signed pre/post rows, so the stacked word-table
            # plan evaluates ONCE per merge (a union of two selects
            # re-ran the whole nested-replace lineage twice — measured
            # 23 s vs 15 s at 256 merges on the gate docs)
            e = _pop_live()
            negn, a, b = e
            rank = len(merges) + 1
            merges.append((rank, a, b, a + b, int(-negn)))
            pat = _BPE_L + a + _BPE_R + _BPE_L + b + _BPE_R
            rep = _BPE_L + a + b + _BPE_R
            deltas = _bpe_delta_frame(cur, pat, rep).collect()
            net = {(r.left_sym, r.right_sym): r.pair_count for r in deltas}
            n_delta = _apply_net(net, None)
            if _sampled(rank):
                # the sizing aggregate already counted the top pair's
                # affected words; only the forced single-merge path
                # (batch_pairs=0) pays a count job here
                n_aff = (
                    top_aff_cnt
                    if top_aff_cnt is not None
                    else cur.filter(F.col("syms").contains(pat)).count()
                )
                stats.append((rank, n_aff, n_delta, _time.time()))
            cur = cur.withColumn(
                "syms", F.replace(F.col("syms"), F.lit(pat), F.lit(rep))
            )
            pending_since_cp += 1
        else:
            # ---- driver-side merge batch over the collected subset:
            # _bpe_train_local's bookkeeping, global pc/heap, and the
            # exact same argmax + tie-break — merges stay byte-identical
            # to the sequential loop; the batch flushes at the first
            # argmax that might have occurrences outside the subset
            words_: list[list] = [
                [c_, s_]
                for c_, s_ in zip(
                    rows.column("cnt").to_pylist(),
                    rows.column("syms").to_pylist(),
                )
            ]
            index: dict = {}
            if "m0" in rows.column_names:
                # candidate-only index off the JVM masks: the batch
                # loop reads the index solely for local_ok pairs, and
                # created pairs are added by the merge step itself.
                # The masks carry bits for ALL sized candidates — keep
                # only the take_n actually staged in this batch
                ms0 = rows.column("m0").to_pylist()
                ms1 = rows.column("m1").to_pylist()
                keep = (1 << take_n) - 1
                for widx in range(len(words_)):
                    m = (ms0[widx] | (ms1[widx] << 32)) & keep
                    while m:
                        index.setdefault(
                            cand[(m & -m).bit_length() - 1], set()
                        ).add(widx)
                        m &= m - 1
            else:  # batch_pairs > 64: candidate-only index by recount
                cset = set(cand)
                for widx, (cnt_, s_) in enumerate(words_):
                    for p in _bpe_pair_counts_local(s_):
                        if p in cset:
                            index.setdefault(p, set()).add(widx)
            del rows
            local_ok = set(cand)
            while len(merges) < int(num_merges):
                e = _pop_live()
                if e is None:
                    break
                if (e[1], e[2]) not in local_ok or -e[0] < min_count:
                    heapq.heappush(heap, e)  # next batch's (or no) merge
                    break
                negn, a, b = e
                rank = len(merges) + 1
                merges.append((rank, a, b, a + b, int(-negn)))
                batch_reps.append(
                    (
                        _BPE_L + a + _BPE_R + _BPE_L + b + _BPE_R,
                        _BPE_L + a + b + _BPE_R,
                    )
                )
                aff_ix, net = _bpe_merge_step_local(words_, index, a, b)
                n_delta = _apply_net(net, local_ok)
                if _sampled(rank):
                    stats.append((rank, len(aff_ix), n_delta, _time.time()))
        # flush (both batch regimes): the same replaces, in the same
        # order, applied to the distributed table (identity on
        # non-staged words — no merged pattern can occur there, see
        # docstring). The checkpoint check runs INSIDE the flush: a
        # batch can run hundreds of merges (every created pair joins
        # local_ok), and chaining them all before one checkpoint would
        # nest F.replace past what Catalyst analysis tolerates — the
        # exact lineage blow-up checkpoint_every exists to bound
        for pat, rep in batch_reps:
            cur = cur.withColumn(
                "syms", F.replace(F.col("syms"), F.lit(pat), F.lit(rep))
            )
            pending_since_cp += 1
            if checkpoint_every and pending_since_cp >= int(
                checkpoint_every
            ):
                # LAZY checkpoint: truncates the analyzed plan (the
                # nesting bound is what checkpoint_every contracts)
                # without launching a materialization job per
                # cadence — a 100-merge batch would otherwise pay
                # ~6 full-table jobs between two Spark actions; the
                # next sizing scan materializes the chain once
                cur = cur.localCheckpoint(eager=False)
                pending_since_cp = 0
        if checkpoint_every and pending_since_cp >= int(checkpoint_every):
            cur = cur.localCheckpoint()
            pending_since_cp = 0
    base.unpersist()
    return merges


#: schema of the persisted merge-table exchange format — what
#: bpe_train/bpe_train_incremental return row-wise, what the
#: vocab_bpe_train gate emits, and what any engine can store/ship as
#: the tokenizer artifact
BPE_MERGES_SCHEMA = (
    "merge_rank long, left_sym string, right_sym string, "
    "merged string, pair_count long"
)


def bpe_merges_to_frame(spark, merges) -> DataFrame:
    """Persistable DataFrame of a trained merge list — the tokenizer
    ARTIFACT (write it to parquet next to the model; kilobytes). The
    row order carries no meaning; ``merge_rank`` is the total order."""
    return spark.createDataFrame(
        [tuple(m) for m in merges], BPE_MERGES_SCHEMA
    )


def bpe_merges_from_frame(frame: DataFrame) -> list:
    """Load a merge list back from its persisted frame, in merge-rank
    order — a kilobyte collect by contract (vocab-sized, never data-
    sized), ready for :func:`bpe_apply` / :func:`bpe_encode_documents`."""
    return [
        (
            int(r["merge_rank"]),
            r["left_sym"],
            r["right_sym"],
            r["merged"],
            int(r["pair_count"]),
        )
        for r in frame.orderBy("merge_rank").collect()
    ]


#: Fail-fast ceiling for expression-path encoding: each merge nests one
#: more literal REPLACE into the column expression — Catalyst handles
#: hundreds, not a 32k-merge production vocabulary (analysis/codegen
#: depth). Past this, use bpe_encode_documents_udf (same semantics,
#: merge list in the task closure). Same discipline as MAX_VOCAB_SIZE.
MAX_EXPR_MERGES = 1000


def bpe_apply(word_col, merges) -> "F.Column":
    """Tokenize ONE word column with a learned merge list: the merges
    fold into nested literal replace expressions (JVM-side, no UDF, no
    broadcast), then the wrapped string splits back into symbols with
    the end-of-word byte rendered ``</w>``. Returns ``array<string>``.
    Fail-fast capped at :data:`MAX_EXPR_MERGES` — real vocabularies
    encode through :func:`bpe_encode_documents_udf`."""
    if len(merges) > MAX_EXPR_MERGES:
        raise ValueError(
            f"{len(merges)} merges exceeds MAX_EXPR_MERGES="
            f"{MAX_EXPR_MERGES}: the expression path nests one REPLACE "
            "per merge and Catalyst cannot analyze a vocabulary-sized "
            "expression tree — encode with bpe_encode_documents_udf "
            "(identical semantics, merge list in the task closure)"
        )
    w = _bpe_wrap(word_col)
    for _, a, b, _m, _n in merges:
        w = F.replace(
            w,
            F.lit(_BPE_L + a + _BPE_R + _BPE_L + b + _BPE_R),
            F.lit(_BPE_L + a + b + _BPE_R),
        )
    syms = F.split(F.substring(w, 2, F.length(w) - 2), _BPE_R + _BPE_L)
    return F.transform(
        syms, lambda s: F.replace(s, F.lit(_BPE_EOW), F.lit(_BPE_EOW_SHOW))
    )


def _bpe_encode_word_py(word: str, merges) -> list:
    """Encode ONE word driver/executor-side: the exact semantics of
    :func:`bpe_apply` — wrap, apply every merge in RANK ORDER as a
    left-to-right non-overlapping ``str.replace`` (pinned equal to
    Spark/DuckDB REPLACE by the engine's BPE tests), split back to
    symbols, render the end-of-word byte ``</w>``."""
    s = (
        "".join(_BPE_L + c + _BPE_R for c in word)
        + _BPE_L + _BPE_EOW + _BPE_R
    )
    for _, a, b, _m, _n in merges:
        # CPython returns the original object on a no-match replace, so
        # misses cost one scan and zero allocations
        s = s.replace(
            _BPE_L + a + _BPE_R + _BPE_L + b + _BPE_R,
            _BPE_L + a + b + _BPE_R,
        )
    return [
        sym.replace(_BPE_EOW, _BPE_EOW_SHOW)
        for sym in s[1:-1].split(_BPE_R + _BPE_L)
    ]


def _bpe_encode_word_fast(word: str, rank_of: dict) -> list:
    """Classic greedy per-word BPE encode — repeatedly merge the
    LOWEST-RANK pair present (all occurrences, left-to-right non-
    overlapping), O(len^2) per word INDEPENDENT of merge count, where
    rank-order replay costs O(merges x len) (~2 ms/word at 4096
    merges — minutes over a corpus).

    Provably equivalent to :func:`_bpe_encode_word_py`'s rank-order
    replay (property-pinned): a merge only fuses two adjacent symbols,
    so pairs of PRE-EXISTING symbols never become newly adjacent, and
    any pair containing a merged symbol was first counted in training
    AFTER that merge — its own merge rank is strictly larger. Hence the
    lowest-rank pair present is always exactly the next merge the
    sequential replay would apply."""
    syms = list(word)
    syms.append(_BPE_EOW)
    while True:
        best = None
        for i in range(len(syms) - 1):
            r = rank_of.get((syms[i], syms[i + 1]))
            if r is not None and (best is None or r < best):
                best = r
                ba, bb = syms[i], syms[i + 1]
        if best is None:
            break
        out = []
        i = 0
        n = len(syms)
        while i < n:
            if i + 1 < n and syms[i] == ba and syms[i + 1] == bb:
                out.append(ba + bb)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return [s.replace(_BPE_EOW, _BPE_EOW_SHOW) for s in syms]


#: Greedy-kernel word-length ceiling: :func:`_bpe_encode_word_fast` is
#: O(len^2) in the worst case (each pass scans all symbols; up to len
#: passes), so a single multi-100k-char whitespace-free "word" (a URL
#: blob, a DNA string, minified JS) would stall an executor for
#: minutes. Past the cap the word routes through
#: :func:`_bpe_encode_word_py` — rank-order replay, O(merges x len)
#: C-level scans, LINEAR in word length — which is property-pinned
#: value-identical, so the output does not change, only the kernel.
_BPE_GREEDY_MAX_CHARS = 1024

#: Per-task encode-cache bounds (ADVICE r11): the distinct-word cache
#: lives for the whole mapInPandas iterator, and a real corpus
#: partition can hold millions of word types — unbounded, the dict
#: grows to GBs and OOMs the executor. Cleared wholesale at either cap
#: (amortized O(1), no per-hit LRU bookkeeping); Zipf means the hot
#: head instantly re-warms, so the hit rate barely moves while task
#: memory stays CONSTANT in partition word cardinality. An entry is
#: charged ``len(word) + 8 * len(tokens)`` units, one unit ~ 16 real
#: bytes (str header ~49 B + list slot 8 B per token, dict/key
#: overhead amortized) — 8M units ~ 128 MB worst-case generation for
#: ANY word shape. The r12 cache-hostile probe caught the previous
#: chars-only charge under-pricing hex-blob words ~3x (their cost is
#: the 17-element token LIST, not the 16-char word): 360 MB observed
#: worker-peak delta where the doc said 128.
_BPE_CACHE_MAX_ENTRIES = 262_144
_BPE_CACHE_MAX_CHARS = 8_000_000

#: Output-frame token budget per yielded pandas frame: without it the
#: UDF emits ONE frame per INPUT Arrow batch (default 10k rows), and a
#: batch of token-heavy documents (10k docs x 10k tokens x ~60 B) would
#: build a multi-GB frame before Arrow ever sees it — a peak that the
#: word cache caps cannot bound because it is output, not cache. 1M
#: tokens ~ 60-120 MB per frame; mapInPandas concatenates the yielded
#: frames, so values are unchanged, only the peak is.
_BPE_OUT_BATCH_TOKENS = 1_000_000


def bpe_encode_documents_udf(
    df: DataFrame,
    id_col: str,
    text_col: str,
    merges,
    *,
    cache_max_entries: int = _BPE_CACHE_MAX_ENTRIES,
    cache_max_chars: int = _BPE_CACHE_MAX_CHARS,
    greedy_max_chars: int = _BPE_GREEDY_MAX_CHARS,
    out_batch_tokens: int = _BPE_OUT_BATCH_TOKENS,
) -> DataFrame:
    """:func:`bpe_encode_documents` for REAL merge lists — identical
    output (property-pinned), different plan. The expression path folds
    ``len(merges)`` NESTED ``F.replace`` calls into one column
    expression: fine at the gate's 8 merges, hundreds at most — a 32k-
    merge production vocabulary would build an expression tree Catalyst
    cannot analyze (the ``encode_documents_join`` lesson one level up:
    the zero-shuffle plan shape stops being the scale plan shape).

    Here the merge list rides the task closure ONCE (kilobytes-to-
    megabytes — the pq_train codebook budget class) and each word
    encodes in Python inside ``mapInPandas`` (Arrow-batched) through
    :func:`_bpe_encode_word_fast` — the classic greedy lowest-rank
    kernel, per-word cost INDEPENDENT of merge count and property-
    pinned equal to the expression path's rank-order replace — with a
    per-PARTITION distinct-word cache, so the cost is paid once per
    word TYPE per task (Zipf: most tokens repeat). Still MAP-ONLY over
    the corpus: no shuffle, no explode; the parallelism story is
    identical to the expression path, only the expression becomes a
    Python kernel.

    Bounded by construction (ADVICE r11): the word cache is size-capped
    (:data:`_BPE_CACHE_MAX_ENTRIES` / :data:`_BPE_CACHE_MAX_CHARS` —
    task memory constant in partition word cardinality) and words past
    :data:`_BPE_GREEDY_MAX_CHARS` route through the linear-in-length
    rank-order replay instead of the quadratic greedy kernel — same
    output, bounded worst case."""
    import re as _re

    import pandas as pd

    # rank lookup for the greedy kernel: first (lowest) rank wins if a
    # pair somehow repeats in the list
    rank_of: dict = {}
    for m in merges:
        rank_of.setdefault((m[1], m[2]), int(m[0]))
    out_schema = (
        f"id {dict(df.dtypes)[id_col]}, tokens array<string>, n_tokens long"
    )
    # re.ASCII pins \s to Java's ASCII class ([ \t\n\x0B\f\r]) — the
    # words() tokenizer the expression path uses; Python's default
    # unicode \s (and str.split()) would also split on U+00A0 etc.
    ws_re = _re.compile(r"\s+", _re.ASCII)
    # bind the bounds as VALUES so the task closure ships them (module
    # globals would re-resolve on the worker, where a test's
    # monkeypatch never lands)
    cap_entries = int(cache_max_entries)
    cap_chars = int(cache_max_chars)
    greedy_cap = int(greedy_max_chars)
    cap_out = int(out_batch_tokens)

    def _encode(batches):
        cache: dict = {}
        cache_chars = 0

        def _frame(ids, toks_col, n_col):
            return pd.DataFrame(
                {
                    "id": ids,
                    "tokens": pd.Series(toks_col, dtype="object"),
                    "n_tokens": pd.Series(n_col, dtype="int64"),
                }
            )

        for pdf in batches:
            ids, toks_col, n_col = [], [], []
            out_toks = 0
            for i, t in zip(pdf[id_col], pdf[text_col]):
                if t is None:
                    continue
                toks: list = []
                for w in ws_re.split(t):
                    if not w or (
                        "\x01" in w or "\x02" in w or "\x03" in w
                        or "</w>" in w
                    ):
                        continue
                    got = cache.get(w)
                    if got is None:
                        if len(w) <= greedy_cap:
                            got = _bpe_encode_word_fast(w, rank_of)
                        else:
                            # linear-in-length replay for pathological
                            # words (see _BPE_GREEDY_MAX_CHARS)
                            got = _bpe_encode_word_py(w, merges)
                        if (
                            len(cache) >= cap_entries
                            or cache_chars > cap_chars
                        ):
                            cache.clear()
                            cache_chars = 0
                        cache[w] = got
                        # token-list slots priced in, not just word
                        # chars (see _BPE_CACHE_MAX_CHARS)
                        cache_chars += len(w) + 8 * len(got)
                    toks.extend(got)
                ids.append(i)
                toks_col.append(toks)
                n_col.append(len(toks))
                out_toks += len(toks)
                if out_toks >= cap_out:
                    # flush mid-input-batch: bounds the output frame
                    # at ~out_batch_tokens regardless of how token-
                    # heavy the batch's documents are
                    yield _frame(ids, toks_col, n_col)
                    ids, toks_col, n_col = [], [], []
                    out_toks = 0
            if not ids:
                continue  # all-null batch: empty float64 columns would
                # hit Arrow's NumPyConverter instead of the list type
            yield _frame(ids, toks_col, n_col)

    return df.select(id_col, text_col).mapInPandas(_encode, out_schema)


def bpe_encode_documents(
    df: DataFrame, id_col: str, text_col: str, merges
) -> DataFrame:
    """(id, tokens array<string>, n_tokens): every document encoded with
    the learned merges — MAP-ONLY over the corpus (the whole pipeline is
    higher-order array expressions per row; the token stream is never
    exploded or shuffled, the same scale contract as
    :func:`encode_documents`).

    ONE entry point for both regimes (VERDICT r11 #4): past
    :data:`MAX_EXPR_MERGES` the nested-REPLACE expression tree stops
    being analyzable, so the call transparently returns the
    property-pinned value-identical :func:`bpe_encode_documents_udf`
    plan instead — same schema, same values, same map-only shape; only
    low-level :func:`bpe_apply` keeps the explicit raise."""
    if len(merges) > MAX_EXPR_MERGES:
        return bpe_encode_documents_udf(df, id_col, text_col, merges)
    toks = F.flatten(
        F.transform(
            F.filter(
                words(F.col(text_col)),
                lambda w: (w != "") & _bpe_marker_free(w),
            ),
            lambda w: bpe_apply(w, merges),
        )
    )
    return df.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("id"),
        toks.alias("tokens"),
        F.size(toks).cast("long").alias("n_tokens"),
    )


def bpe_decode(tokens_col) -> "F.Column":
    """Inverse of :func:`bpe_apply` for ONE tokens array column: BPE
    merges only ever CONCATENATE characters of a word (plus the
    word-final ``</w>`` marker), so decoding needs no merge table at
    all — join the symbols back together and turn each ``</w>`` into a
    word boundary. Map-only, pure Catalyst string expressions.

    Returns the whitespace-NORMALIZED text: original words joined by
    single spaces (the tokenizer is ``words()`` = split on ``\\s+``, so
    run-of-whitespace and leading/trailing whitespace are not
    recoverable by construction — ``decode(encode(x)) ==
    ' '.join(words(x))``, the round-trip a tokenizer ships with).

    Domain note (shared with encode): words containing the three marker
    bytes are dropped by encoding and therefore absent from the decode;
    a word containing the LITERAL substring ``</w>`` would decode with
    an extra boundary — the rendered end-of-word marker is the one
    reserved token of the output alphabet, exactly as in the reference
    BPE formulation (Sennrich et al. 2016)."""
    joined = F.array_join(tokens_col, "")
    return F.rtrim(F.replace(joined, F.lit(_BPE_EOW_SHOW), F.lit(" ")))


def bpe_decode_documents(
    df: DataFrame, id_col: str = "id", tokens_col: str = "tokens"
) -> DataFrame:
    """(id, text): every encoded document decoded back to its
    whitespace-normalized text — the verification half of the tokenizer
    round-trip (training pipelines assert ``decode(encode(x)) ==
    normalize(x)`` before shipping a tokenizer). MAP-ONLY over the
    encoded frame; composes with :func:`bpe_encode_documents`'s output
    schema by default."""
    return df.select(
        F.col(id_col).alias("id"),
        bpe_decode(F.col(tokens_col)).alias("text"),
    )


def encode_documents_join(
    df: DataFrame,
    id_col: str,
    text_col: str,
    vocab: DataFrame,
    *,
    oov_id: int = 0,
    keep_cols: Sequence[str] = (),
) -> DataFrame:
    """:func:`encode_documents` for REAL vocabularies — identical
    output (pytest-pinned on adversarial fixtures), different plan.

    The map path's lookup is ``element_at`` on a broadcast
    ``map<string,int>`` column, and Spark evaluates that as a LINEAR
    scan of UnsafeMapData (the ``classifier_score`` lesson, measured
    ~0.5 ns/entry): fine at the gate's 20-token vocab, ~16 us PER TOKEN
    at a 32k-token vocabulary — a real tokenization pass would spend
    essentially all its time scanning the map. Here the token stream
    posexplodes, BROADCAST HASH-joins the vocab (a real O(1) hash
    probe per token), and reassembles per document by sorting the
    (position, id) structs — one shuffle carrying only
    ``(doc_id, pos, id)`` integers, never text.

    Trade: the map path moves NOTHING (zero shuffle) but pays O(|V|)
    per token; this path pays one integer-stream shuffle but O(1) per
    token. Crossover is around |V| ~ 1k: below, either is fine; above,
    use this one. ``doc_id`` must be unique per document (the regroup
    merges rows that share one — the map path encodes per row).

    Edge contract (matches the map path exactly): NULL text ->
    ``token_ids`` NULL (and NULL counters); empty/whitespace text ->
    empty array, zero counters; unknown tokens -> ``oov_id``.
    """
    keeps = [F.col(c) for c in keep_cols]
    base = df.select(
        F.col(id_col).alias("doc_id"), *keeps, F.col(text_col).alias("__txt")
    )
    tok = base.select(
        "doc_id", F.posexplode(words(F.col("__txt"))).alias("__pos", "__t")
    )
    vb = vocab.select(
        F.col("token").alias("__t"), F.col("token_id").cast("int").alias("__tid")
    )
    assembled = (
        tok.join(F.broadcast(vb), "__t", "left")
        .groupBy("doc_id")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col("__pos").alias("p"),
                            F.coalesce(
                                F.col("__tid"), F.lit(int(oov_id)).cast("int")
                            ).alias("i"),
                        )
                    )
                ),
                lambda s: s["i"],
            ).alias("__ids")
        )
    )
    return (
        base.join(assembled, "doc_id", "left")
        .select(
            "doc_id",
            *keep_cols,
            F.when(
                F.length(F.trim(F.col("__txt"))) == 0,
                F.array().cast("array<int>"),
            )
            .otherwise(F.col("__ids"))
            .alias("token_ids"),
        )
        .select(
            "doc_id",
            *keep_cols,
            "token_ids",
            F.size("token_ids").cast("long").alias("n_tokens"),
            F.size(
                F.filter("token_ids", lambda i: i == F.lit(int(oov_id)))
            ).cast("long").alias("n_oov"),
        )
    )


def hash_embed_tfidf_join(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    dim: int = 64,
    dfreq: Optional[DataFrame] = None,
    n_docs: Optional[int] = None,
) -> DataFrame:
    """:func:`hash_embed_tfidf` for REAL idf tables — identical output
    (the vector is an order-free integer SUM, so the regroup cannot
    change a single bit), different plan: the idf lookup becomes a
    broadcast HASH join instead of an ``element_at`` map-column scan
    (O(|dfreq|) per token — the :func:`encode_documents_join` trap),
    and components assemble by ``groupBy (doc, component)`` integer
    sums followed by a per-doc array pivot over ``dim`` entries. The
    shuffle carries ``(doc_id, component, weight)`` integers — bounded
    by min(tokens, docs x dim) rows after the map-side combine, never
    text. Empty documents rejoin as zero vectors; NULL-text documents
    are excluded (the map-path contract).
    """
    from cassandra_diff_spark.functions.text import md5_hash64

    base = df.filter(F.col(text_col).isNotNull())
    if dfreq is None:
        dfreq = doc_frequencies(df, id_col, text_col)
    if n_docs is None:
        nrow = base.agg(F.count(F.lit(1)).cast("long").alias("__N"))
    else:
        nrow = base.sparkSession.range(1).select(
            F.lit(int(n_docs)).cast("long").alias("__N")
        )
    d = int(dim)
    tok = (
        base.filter(F.length(F.trim(F.col(text_col))) != 0)
        .select(
            F.col(id_col).alias("doc_id"),
            F.explode(words(F.col(text_col))).alias("__t"),
        )
        .select(
            "doc_id",
            md5_hash64(F.col("__t")).alias("__h"),
            F.col("__t"),
        )
    )
    fb = dfreq.select(
        F.col("token").alias("__t"), F.col("df").cast("long").alias("__df")
    )
    idf_u = F.round(
        F.log(
            (F.col("__N") + F.lit(1)).cast("double")
            / (F.coalesce(F.col("__df"), F.lit(0)) + F.lit(1)).cast("double")
        )
        * LM_SCALE
    ).cast("long")
    signed = F.when(
        F.pmod(F.col("__h"), F.lit(2 * d)) < F.lit(d), idf_u
    ).otherwise(-idf_u)
    comps = (
        tok.join(F.broadcast(fb), "__t", "left")
        .crossJoin(F.broadcast(nrow))
        .select(
            "doc_id",
            F.pmod(F.col("__h"), F.lit(d)).cast("int").alias("__c"),
            signed.alias("__w"),
        )
        .groupBy("doc_id", "__c")
        .agg(F.sum("__w").alias("__s"), F.count(F.lit(1)).alias("__k"))
        .groupBy("doc_id")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct(F.col("__c"), F.col("__s")))
            ).alias("__m"),
            F.sum("__k").cast("long").alias("__nt"),
        )
        .select(
            "doc_id",
            F.transform(
                F.sequence(F.lit(0), F.lit(d - 1)),
                lambda i: F.coalesce(
                    F.element_at(F.col("__m"), i.cast("int")),
                    F.lit(0).cast("long"),
                ),
            ).alias("__emb"),
            "__nt",
        )
    )
    return (
        base.select(F.col(id_col).alias("doc_id"))
        .join(comps, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(
                F.col("__emb"),
                F.array_repeat(F.lit(0).cast("long"), d),
            ).alias("emb"),
            F.coalesce(F.col("__nt"), F.lit(0).cast("long")).alias("n_tokens"),
        )
    )
