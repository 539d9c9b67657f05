"""1M-vector scale probe of the ANN / near-dup paths (VERDICT r2 #6).

The sf0.1 gates prove CORRECTNESS; this probe is the EVIDENCE for the
100 TB story: at 10^6 vectors, do the bucketed paths still (a) find the
true close neighbors (recall) while (b) touching only a sub-percent
candidate fraction of the corpus / all-pairs?

Design:
  * corpus: n deterministic synthetic vectors (hash-derived, JVM-side
    generation — no RNG state, no Python in the generator).
  * queries: perturbed COPIES of corpus vectors (cos ~ 0.9998) — planted
    ground truth whose nearest neighbor is known by construction, the
    regime ANN indexes exist for (close neighbors; far-neighbor ranking
    on random data is information-free for any LSH).
  * hyperplane LSH at SCALE parameters (4x16-bit bands, radius-1
    multi-probe: ~0.03% of buckets probed per band) vs the 8x8-bit
    default, which at 1M probes ~70% of the corpus — the probe is what
    exposed that, see the banding notes in operators/similarity.py.
  * IVF with centroid_mod ~ sqrt(n).
  * embedding near-dup pairs at 4x16-bit banding on a slice + planted
    duplicates: planted-pair recall + candidate-pair fraction.

Run directly (`python scale_probe.py [n]`) or via bench.py, which embeds
the result dict in the per-round BENCH json.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DIM = 64
N_QUERIES = 100
PLANT_OFFSET = 10_000_000
#: scale-tuned LSH banding: 64 planes, 4 bands x 16 bits, radius-1 probes
SCALE_BANDS = 4
SCALE_RADIUS = 1


def synth_vectors(spark: SparkSession, n: int, dim: int = DIM) -> DataFrame:
    """n deterministic vectors, components in [-1, 1) derived from
    xxhash64(id, dim) — pure Catalyst generation, reproducible anywhere."""
    vec = F.array(
        *[
            (F.pmod(F.xxhash64(F.col("id"), F.lit(d)), F.lit(2001)) - 1000).cast(
                "float"
            )
            / 1000.0
            for d in range(dim)
        ]
    )
    return spark.range(n).select(F.col("id").alias("vec_id"), vec.alias("embedding"))


def perturb(df: DataFrame, amplitude: float = 0.01) -> DataFrame:
    """Planted near-duplicates: add hash-derived noise of the given
    amplitude per component (cos ~ 1 - amplitude^2/0.67) and shift ids."""
    noisy = F.transform(
        F.col("embedding"),
        lambda x, i: (
            x
            + (
                F.pmod(F.xxhash64(F.col("vec_id"), i, F.lit(777)), F.lit(2001)) - 1000
            ).cast("float")
            / 1000.0
            * amplitude
        ).cast("float"),
    )
    return df.select(
        (F.col("vec_id") + PLANT_OFFSET).alias("vec_id"), noisy.alias("embedding")
    )


def _lsh_candidate_count(
    index: DataFrame, queries: DataFrame, n_bands: int, radius: int
) -> int:
    """Distinct (query, corpus) candidate pairs the scale-banded LSH
    join produces — corpus keys come from the ALREADY-BUILT index frame
    (the measurement must not re-pay the signature pass it is measuring);
    only the tiny query side computes keys fresh."""
    from cassandra_diff_spark.operators.similarity import hyperplane_band_keys
    from cassandra_diff_spark.functions.vectors import quantize

    band_bits = 64 // n_bands
    masks = [m for m in range(1 << band_bits) if bin(m).count("1") <= radius]
    c = index.select("c_id", F.posexplode("c_keys").alias("band", "band_key"))
    q = queries.select(
        F.col("vec_id").alias("q_id"),
        hyperplane_band_keys(quantize(F.col("embedding")), DIM, 64, n_bands).alias(
            "keys"
        ),
    ).select("q_id", F.posexplode("keys").alias("band", "qkey"))
    probes = F.array(*[F.col("qkey").bitwiseXOR(F.lit(m)) for m in masks])
    q = q.select("q_id", "band", F.explode(probes).alias("band_key"))
    return (
        c.join(F.broadcast(q), ["band", "band_key"])
        .select("q_id", "c_id")
        .distinct()
        .count()
    )



def _vm_rss_mb() -> float:
    """Current VmRSS of THIS process in MB (/proc; Linux-only, which is
    the only platform the probe runs on). -1 when unreadable."""
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS:"):
                    return int(line.split()[1]) / 1024.0
    except OSError:
        pass
    return -1.0


def _section_end(spark: SparkSession) -> None:
    """Cache hygiene BETWEEN probe sections (the bench.py r4 lesson,
    applied to the probe): each section may persist index/corpus-sized
    frames; without a release the late sections (PQ, IVF-PQ, covariance)
    run under maximal executor memory pressure and their timings read
    2-5x high (measured: ivf_pq encode/query 30/45 s in-probe vs 8/8 s
    isolated). Sections that reuse an artifact re-read it from parquet,
    so dropping caches never changes results."""
    from cassandra_diff_spark.operators import release_caches

    release_caches()
    spark.catalog.clearCache()


def run_probe(spark: SparkSession, n: int = 1_000_000) -> dict:
    from cassandra_diff_spark.operators import release_caches, similarity
    from cassandra_diff_spark.operators.dedup import embedding_near_pairs

    out: dict = {"n": n, "dim": DIM, "n_queries": N_QUERIES}
    work = os.path.join("/tmp", f"scale_probe_{n}")

    # warm the Arrow python workers (daemon fork + numpy/pandas import,
    # ~10s across 32 workers) BEFORE any timed section: the probe
    # measures operator cost, and on a real long-running cluster the
    # workers are warm; without this the first index build absorbs the
    # one-time spin-up and the trend line jumps 2-6x run to run
    spark.range(0, 64, 1, 64).mapInPandas(
        lambda it: it, "id long"
    ).count()

    t0 = time.time()
    synth_vectors(spark, n).write.mode("overwrite").parquet(f"{work}/corpus.parquet")
    corpus = spark.read.parquet(f"{work}/corpus.parquet")
    queries = perturb(corpus.filter(F.col("vec_id") < N_QUERIES))
    queries.write.mode("overwrite").parquet(f"{work}/queries.parquet")
    queries = spark.read.parquet(f"{work}/queries.parquet")
    out["gen_sec"] = round(time.time() - t0, 2)

    # ground truth by construction: query PLANT_OFFSET+i was perturbed
    # from corpus vector i, cos ~0.9998 — its true nearest neighbor
    def recall_at_1(df: DataFrame) -> float:
        hits = df.filter(
            (F.col("rank") == 1)
            & (F.col("neighbor_id") == F.col("query_id") - PLANT_OFFSET)
        ).count()
        return hits / N_QUERIES

    t0 = time.time()
    brute = similarity.brute_force_topk_pandas(
        corpus, queries, "vec_id", "embedding", k=10
    )
    out["brute_recall_at_1"] = recall_at_1(brute)
    out["brute_sec"] = round(time.time() - t0, 2)
    _section_end(spark)

    # build-once/query-many split: the signature pass is a pure function
    # of the corpus — persist it (parquet round-trip, as a serving layer
    # would) and measure the per-query-batch cost separately.
    # Each build is timed TWICE in the same session: the first run pays
    # one-time costs (worker numpy/BLAS init, first-touch page faults of
    # the kernel scratch) plus whatever sibling load the box carries; the
    # warm re-run is the steady-state per-corpus-pass cost — the number
    # to trend (r5 lesson: contention masqueraded as an IVF regression
    # until the builds were re-measured warm in isolation).
    t0 = time.time()
    similarity.hyperplane_lsh_index(
        corpus, "vec_id", "embedding", n_bands=SCALE_BANDS
    ).write.mode("overwrite").parquet(f"{work}/lsh_index.parquet")
    lsh_idx = spark.read.parquet(f"{work}/lsh_index.parquet")
    out["lsh_index_sec"] = round(time.time() - t0, 2)
    t0 = time.time()
    similarity.hyperplane_lsh_index(
        corpus, "vec_id", "embedding", n_bands=SCALE_BANDS
    ).write.mode("overwrite").parquet(f"{work}/lsh_index.parquet")
    out["lsh_index_warm_sec"] = round(time.time() - t0, 2)
    # the overwrite replaced the files the earlier read pinned
    lsh_idx = spark.read.parquet(f"{work}/lsh_index.parquet")
    t0 = time.time()
    lsh = similarity.hyperplane_lsh_topk(
        corpus, queries, "vec_id", "embedding", k=10,
        n_bands=SCALE_BANDS, probe_radius=SCALE_RADIUS, index=lsh_idx,
    )
    out["lsh_recall_at_1"] = recall_at_1(lsh)
    out["lsh_query_sec"] = round(time.time() - t0, 2)
    out["lsh_sec"] = round(out["lsh_index_sec"] + out["lsh_query_sec"], 2)
    t0 = time.time()
    n_cand = _lsh_candidate_count(lsh_idx, queries, SCALE_BANDS, SCALE_RADIUS)
    out["lsh_candidate_fraction"] = round(n_cand / (n * N_QUERIES), 6)
    out["lsh_candidates_sec"] = round(time.time() - t0, 2)

    t0 = time.time()
    mod = max(2, int(n**0.5))  # ~sqrt(n) centroids, the canonical IVF nlist
    similarity.ivf_index(
        corpus, "vec_id", "embedding", centroid_mod=mod
    ).write.mode("overwrite").parquet(f"{work}/ivf_index.parquet")
    ivf_idx = spark.read.parquet(f"{work}/ivf_index.parquet")
    out["ivf_index_sec"] = round(time.time() - t0, 2)
    t0 = time.time()
    similarity.ivf_index(
        corpus, "vec_id", "embedding", centroid_mod=mod
    ).write.mode("overwrite").parquet(f"{work}/ivf_index.parquet")
    ivf_idx = spark.read.parquet(f"{work}/ivf_index.parquet")
    out["ivf_index_warm_sec"] = round(time.time() - t0, 2)
    t0 = time.time()
    ivf = similarity.ivf_topk(
        corpus, queries, "vec_id", "embedding", k=10, centroid_mod=mod,
        n_probe=8, index=ivf_idx,
    )
    out["ivf_recall_at_1"] = recall_at_1(ivf)
    out["ivf_query_sec"] = round(time.time() - t0, 2)
    out["ivf_sec"] = round(out["ivf_index_sec"] + out["ivf_query_sec"], 2)
    _section_end(spark)
    # a query probes 8 of ~n/mod lists -> candidate fraction ~ 8*mod/n
    out["ivf_candidate_fraction"] = round(8 * mod / n, 6)

    # near-dup pairs on a slice + planted duplicates, scale banding
    t0 = time.time()
    slice_n = min(n, 300_000)
    base = corpus.filter(F.col("vec_id") < slice_n)
    planted = perturb(base.filter(F.col("vec_id") < 3_000))
    both = base.unionByName(planted)
    pairs = embedding_near_pairs(
        both, "vec_id", "embedding", min_cos=0.999, n_bands=SCALE_BANDS
    )
    found = pairs.filter(
        F.col("id_2") - F.col("id_1") == PLANT_OFFSET
    ).count()
    out["near_pairs_recall"] = found / 3_000
    out["near_pairs_sec"] = round(time.time() - t0, 2)
    out["near_pairs_slice_n"] = slice_n + 3_000
    # candidate-pair fraction of all-pairs on the slice: bucket occupancy
    # o ~ n/65536 -> sum over bands of n*o/2 collisions. Keys via the
    # fused index kernel (bit-identical to the expression path, ~10x
    # less measurement overhead)
    t0 = time.time()
    kb = similarity.hyperplane_lsh_index(
        both, "vec_id", "embedding", n_bands=SCALE_BANDS
    ).select("c_id", F.posexplode("c_keys").alias("band", "band_key"))
    n_pair_cand = (
        kb.groupBy("band", "band_key")
        .agg(F.count("*").alias("c"))
        .agg(F.sum(F.col("c") * (F.col("c") - 1) / 2))
        .first()[0]
    )
    m = slice_n + 3_000
    out["near_pairs_candidate_fraction"] = round(
        float(n_pair_cand) / (m * (m - 1) / 2), 8
    )
    out["near_pairs_candidates_sec"] = round(time.time() - t0, 2)

    # ---- cluster-balanced sampling at corpus scale (r9): the claim is
    # "dense cells flatten to ~target survivors, no data-sized
    # shuffle". Hash-synthetic vectors fill the 256 hyperplane cells
    # near-uniformly (~n/256 each), so with target 2000 every cell is
    # saturated: max kept per cell should hug the target while the
    # pre-sampling max population sits ~2x above it.
    t0 = time.time()
    from cassandra_diff_spark.operators.curate import cluster_balanced_sample

    samp = cluster_balanced_sample(
        corpus, "vec_id", "embedding", dim=DIM, target_per_cell=2000
    )
    per_cell = samp.groupBy("cell").agg(
        F.count(F.lit(1)).alias("kept"), F.first("cell_n").alias("cell_n")
    )
    srow = per_cell.agg(
        F.count(F.lit(1)).alias("cells"),
        F.max("cell_n").alias("max_cell_n"),
        F.max("kept").alias("max_kept"),
        F.sum("kept").alias("total_kept"),
    ).first()
    out["cluster_sample_sec"] = round(time.time() - t0, 2)
    out["cluster_sample_cells"] = int(srow["cells"])
    out["cluster_sample_max_cell_n"] = int(srow["max_cell_n"])
    out["cluster_sample_max_kept"] = int(srow["max_kept"])
    out["cluster_sample_total_kept"] = int(srow["total_kept"])
    _section_end(spark)

    # ---- prefix-filter exact Jaccard join at corpus scale: the r8
    # operator's claim is "subquadratic by THEOREM" — candidates only
    # from each side's rarest (1-t) token fraction, losslessly. The
    # probe prices that: synthetic 16-token docs over a 50k vocab,
    # 3k planted near-dups (2 of 16 tokens replaced, Jaccard ~14/18),
    # threshold 3/4. Lossless => every planted pair whose TRUE Jaccard
    # clears the threshold must be found (recall exactly 1.0), while
    # the candidate fraction stays orders below all-pairs.
    from cassandra_diff_spark.operators.dedup import (
        prefix_jaccard_candidates,
        prefix_jaccard_pairs,
    )

    t0 = time.time()
    pj_n = min(n // 10, 100_000)
    vocab = 50_000

    def _doc_text(repl: bool):
        def tok(j):
            base_t = F.pmod(F.xxhash64(F.col("doc_id0"), F.lit(j)), F.lit(vocab))
            if repl and j < 2:  # planted edit: replace the first 2 tokens
                base_t = F.pmod(
                    F.xxhash64(F.col("doc_id0"), F.lit(j), F.lit(999)),
                    F.lit(vocab),
                )
            return F.concat(F.lit("t"), base_t.cast("string"))

        return F.concat_ws(" ", *[tok(j) for j in range(16)])

    base_docs = spark.range(pj_n).select(
        F.col("id").alias("doc_id0"),
        F.col("id").alias("doc_id"),
        _doc_text(False).alias("text"),
    )
    planted_docs = spark.range(3_000).select(
        F.col("id").alias("doc_id0"),
        (F.col("id") + PLANT_OFFSET).alias("doc_id"),
        _doc_text(True).alias("text"),
    )
    pj_corpus = base_docs.unionByName(planted_docs).select("doc_id", "text").cache()
    # eligible planted pairs: exact token-set Jaccard >= 3/4 (token
    # hash collisions inside a doc can legitimately push a pair under)
    toks_of = F.array_distinct(F.split(F.col("text"), " "))
    tb = base_docs.filter(F.col("doc_id") < 3_000).select(
        "doc_id", toks_of.alias("a")
    )
    tp = planted_docs.select(
        (F.col("doc_id") - PLANT_OFFSET).alias("doc_id"), toks_of.alias("b")
    )
    inter_c = F.size(F.array_intersect("a", "b"))
    union_c = F.size("a") + F.size("b") - inter_c
    eligible = tb.join(tp, "doc_id").filter(inter_c * 4 >= 3 * union_c).count()
    pairs = prefix_jaccard_pairs(
        pj_corpus, "doc_id", "text", threshold_num=3, threshold_den=4
    )
    found = pairs.filter(F.col("id_2") - F.col("id_1") == PLANT_OFFSET).count()
    out["prefix_jaccard_recall"] = round(found / max(eligible, 1), 6)
    out["prefix_jaccard_eligible"] = eligible
    out["prefix_jaccard_sec"] = round(time.time() - t0, 2)
    t0 = time.time()
    _docs_frame, cand = prefix_jaccard_candidates(
        pj_corpus, "doc_id", "text", threshold_num=3, threshold_den=4
    )
    m_docs = pj_n + 3_000
    out["prefix_jaccard_candidate_fraction"] = round(
        cand.count() / (m_docs * (m_docs - 1) / 2), 8
    )
    out["prefix_jaccard_candidates_sec"] = round(time.time() - t0, 2)
    pj_corpus.unpersist()
    _section_end(spark)

    # as-of join under adversarial skew: one key owns 30% of both sides.
    # The plain union-window serializes that key's whole timeline through
    # one task; the chunked variant splits it across day chunks. Equality
    # is checked EXACTLY via an order-independent checksum of every
    # (left id, matched ts, matched value) triple — one number per plan.
    t0 = time.time()
    nl = n  # left rows; right = n/4
    hot = (F.col("id") * 2654435761 % 10) < 3  # deterministic ~30%
    key = F.when(hot, F.lit(0)).otherwise(F.col("id") % 1000)
    ts = F.timestamp_micros(
        F.pmod(F.xxhash64(F.col("id"), F.lit(1)), F.lit(86_400_000_000 * 30))
    )
    left = spark.range(nl).select(
        key.alias("k"), ts.alias("ts"), F.col("id").alias("lid")
    )
    right = spark.range(nl // 4).select(
        key.alias("k"),
        ts.alias("ts"),
        F.col("id").alias("rid"),
        (F.col("id") % 1_000_003).cast("double").alias("v"),
    )
    left.write.mode("overwrite").parquet(f"{work}/asof_left.parquet")
    right.write.mode("overwrite").parquet(f"{work}/asof_right.parquet")
    left = spark.read.parquet(f"{work}/asof_left.parquet")
    right = spark.read.parquet(f"{work}/asof_right.parquet")
    out["asof_gen_sec"] = round(time.time() - t0, 2)
    out["asof_n_left"] = nl

    from cassandra_diff_spark.operators.temporal import (
        asof_join,
        asof_join_chunked,
    )

    def checksum(df) -> int:
        return df.agg(
            F.sum(
                F.xxhash64(F.col("lid"), F.col("r_ts"), F.col("r_v")).cast(
                    "decimal(38,0)"
                )
            )
        ).first()[0]

    kw = dict(right_cols=["v"], right_tiebreak="rid")
    t0 = time.time()
    plain_sum = checksum(asof_join(left, right, ["k"], **kw))
    out["asof_plain_sec"] = round(time.time() - t0, 2)
    t0 = time.time()
    chunked_sum = checksum(
        asof_join_chunked(
            left, right, ["k"], chunk_us=86_400_000_000, **kw
        )
    )
    out["asof_chunked_sec"] = round(time.time() - t0, 2)
    out["asof_plans_agree"] = bool(plain_sum == chunked_sum)
    _section_end(spark)

    # --------------------------------------------- product quantization
    # 8-byte codes for 64-dim vectors (32x smaller than float32): train
    # on a capped hash-mod sample, encode the full corpus map-only, then
    # ADC-scan + exact-rerank the planted queries. The probe records
    # encode throughput and whether rerank recovers recall@1 = 1.0.
    from cassandra_diff_spark.operators.similarity import (
        pq_encode,
        pq_topk,
        pq_train,
    )

    t0 = time.time()
    books = pq_train(
        corpus, "vec_id", "embedding", dim=DIM, m=8, n_codes=256,
        sample_mod=max(1, n // 100_000),
    )
    out["pq_train_sec"] = round(time.time() - t0, 2)
    # warm retrain: same inputs, JIT/page-cache/Spark-stage effects
    # amortized — the r6 index-warm lesson applied to training, so a
    # contended first run can never masquerade as algorithmic cost
    # (r7: driver probe said 19.5 s, isolated said 31.0 s, neither
    # separable without this). Determinism doubles as a free check.
    t0 = time.time()
    books_warm = pq_train(
        corpus, "vec_id", "embedding", dim=DIM, m=8, n_codes=256,
        sample_mod=max(1, n // 100_000),
    )
    out["pq_train_warm_sec"] = round(time.time() - t0, 2)
    out["pq_train_deterministic"] = bool(
        books.shape == books_warm.shape and (books == books_warm).all()
    )
    t0 = time.time()
    pq_encode(corpus, "vec_id", "embedding", books, dim=DIM).write.mode(
        "overwrite"
    ).parquet(f"{work}/pq_codes.parquet")
    codes = spark.read.parquet(f"{work}/pq_codes.parquet")
    out["pq_encode_sec"] = round(time.time() - t0, 2)
    t0 = time.time()
    pq = pq_topk(
        codes, queries, "vec_id", "embedding", books,
        k=1, shortlist=64, corpus=corpus,
    )
    out["pq_recall_at_1"] = recall_at_1(
        pq.withColumnRenamed("rank", "rank")
    )
    out["pq_query_sec"] = round(time.time() - t0, 2)
    _section_end(spark)

    # IVF-PQ: same codes, but the query scans only its n_probe coarse
    # lists — the scan fraction and the byte shrink multiply. Build and
    # query timed SEPARATELY (the index persists; a serving deployment
    # pays the encode once, every query batch pays only the probe)
    from cassandra_diff_spark.operators.similarity import (
        ivf_pq_encode,
        ivf_pq_topk,
    )

    cmod = max(2, int(n ** 0.5))
    t0 = time.time()
    ivf_pq_encode(
        corpus, "vec_id", "embedding", books, dim=DIM, centroid_mod=cmod
    ).write.mode("overwrite").parquet(f"{work}/ivfpq_codes.parquet")
    ivfpq_codes = spark.read.parquet(f"{work}/ivfpq_codes.parquet")
    out["ivf_pq_encode_sec"] = round(time.time() - t0, 2)
    t0 = time.time()
    ivfpq = ivf_pq_topk(
        corpus, queries, "vec_id", "embedding", books,
        dim=DIM, k=1, centroid_mod=cmod,
        n_probe=8, shortlist=64, codes=ivfpq_codes,
    )
    out["ivf_pq_recall_at_1"] = recall_at_1(ivfpq)
    out["ivf_pq_query_sec"] = round(time.time() - t0, 2)
    _section_end(spark)

    # ------------------------------------------------ fuzzy linkage probe
    # n synthetic structured records ("rec" + 9 digits + "-" + 8 hash hex
    # chars), 10k planted single-char typos split between the digit and
    # hex regions so each blocking strategy (13-prefix / 8-suffix) is
    # REQUIRED for half the recall. Blocks are ~unique per record, so the
    # within-bucket candidate set stays linear in n.
    n_typos = 10_000
    name = F.concat(
        F.lit("rec"),
        F.lpad(F.col("id").cast("string"), 9, "0"),
        F.lit("-"),
        F.substring(F.hex(F.xxhash64("id")), 1, 8),
    )
    t0 = time.time()
    recs = spark.range(n).select(F.col("id").alias("rid"), name.alias("name"))
    pos = F.when(
        F.col("rid") % 2 == 0, (F.col("rid") % 9 + 4)
    ).otherwise(F.col("rid") % 7 + 14).cast("int")
    typos = recs.filter(F.col("rid") < n_typos).withColumn(
        "pos", pos
    ).select(
        (F.col("rid") + PLANT_OFFSET).alias("rid"),
        F.concat(
            F.expr("substr(name, 1, pos - 1)"),
            F.lit("x"),
            F.expr("substr(name, pos + 1)"),
        ).alias("name"),
    )
    aug = recs.unionByName(typos)
    aug.write.mode("overwrite").parquet(f"{work}/linkage.parquet")
    aug = spark.read.parquet(f"{work}/linkage.parquet")
    out["linkage_gen_sec"] = round(time.time() - t0, 2)

    from cassandra_diff_spark.operators.linkage import fuzzy_dup_pairs

    t0 = time.time()
    pairs = fuzzy_dup_pairs(
        aug,
        "rid",
        "name",
        block_keys=[
            F.expr("substr(name, 1, 13)"),
            F.expr("right(name, 8)"),
        ],
        max_edit=1,
        max_block=50,
    )
    found = pairs.filter(
        (F.col("id_b") - F.col("id_a") == PLANT_OFFSET)
        & (F.col("id_a") < n_typos)
    ).count()
    out["linkage_pairs_sec"] = round(time.time() - t0, 2)
    out["linkage_recall"] = found / n_typos
    out["linkage_n_pairs"] = pairs.count()
    _section_end(spark)

    # ---- covariance moments at n vectors: the Gramian kernel's cost is
    # one M^T M matmul per Arrow batch; shuffle = partitions x d^2 rows
    from cassandra_diff_spark.operators.embeddings import embedding_covariance

    t0 = time.time()
    cov_rows = embedding_covariance(corpus, "embedding", dim=DIM).count()
    out["covariance_sec"] = round(time.time() - t0, 2)
    out["covariance_cells"] = cov_rows  # d(d+1)/2
    _section_end(spark)

    # ---- exact heavy hitters at 10n rows / ~9n distinct keys: the
    # Misra-Gries pass must bound the shuffle at k x partitions instead
    # of the key cardinality, and the confirm pass must return EXACTLY
    # the full-groupBy answer
    from cassandra_diff_spark.operators.sketch import heavy_hitters

    n_events = 10 * n
    hot = F.when(
        F.col("id") % 100 < 5, F.concat(F.lit("hot"), (F.col("id") % 3).cast("string"))
    ).otherwise(F.col("id").cast("string"))
    ev = spark.range(n_events).select(hot.alias("k"))
    ev.write.mode("overwrite").parquet(f"{work}/hh.parquet")
    ev = spark.read.parquet(f"{work}/hh.parquet")
    t0 = time.time()
    hh = {r["k"]: r["cnt"] for r in heavy_hitters(ev, "k", 0.01).collect()}
    out["heavy_hitters_sec"] = round(time.time() - t0, 2)
    t0 = time.time()
    truth = {
        r["k"]: r["c"]
        for r in ev.groupBy("k")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= math.ceil(0.01 * n_events))
        .collect()
    }
    out["heavy_hitters_groupby_sec"] = round(time.time() - t0, 2)
    _section_end(spark)
    out["heavy_hitters_exact"] = hh == truth
    out["heavy_hitters_found"] = len(hh)

    # ---- per-group top-k at 10n rows in ONE group: the naive window
    # formulation serializes the whole group through a single task; the
    # histogram-threshold path sorts only ~k + one bin
    from cassandra_diff_spark.operators.stats import top_k_by_group

    vals = spark.range(n_events).select(
        F.col("id"),
        F.lit("g").alias("grp"),
        (F.pmod(F.xxhash64("id"), F.lit(1_000_000_000)).cast("double") / 1e3).alias(
            "v"
        ),
    )
    vals.write.mode("overwrite").parquet(f"{work}/topk.parquet")
    vals = spark.read.parquet(f"{work}/topk.parquet")
    t0 = time.time()
    ours = top_k_by_group(
        vals, ["grp"], "v", 100, id_col="id", lo=0.0, hi=1_000_000.0, n_bins=4096
    ).collect()
    out["topk_hist_sec"] = round(time.time() - t0, 2)
    t0 = time.time()
    from pyspark.sql import Window

    w = Window.partitionBy("grp").orderBy(F.col("v").desc(), F.col("id").asc())
    naive = (
        vals.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= 100)
        .drop("__rn")
        .collect()
    )
    out["topk_window_sec"] = round(time.time() - t0, 2)
    out["topk_exact"] = sorted((r["id"], r["v"]) for r in ours) == sorted(
        (r["id"], r["v"]) for r in naive
    )

    _section_end(spark)

    # ---- Spearman rank maps at distinct ~ n (VERDICT r9 #1): 1M rows,
    # every x distinct — exactly the regime where the pre-r10 ranking
    # collapsed to ONE sorted task. The r10 bucketed path (literal
    # split boundaries from a hash sample, bucket-partitioned prefix
    # window, broadcast offsets) must (a) rank it in parallel and (b)
    # stay EXACT: y is a strictly monotone transform of x, so rho must
    # be exactly 1.0 — integer doubled ranks make that bit-testable.
    sp_n = int(os.environ.get("SPARK_GRAFT_SPEARMAN_N", str(n)))
    if sp_n > 0:
        from cassandra_diff_spark.operators.validate import (
            spearman_correlations,
        )

        t0 = time.time()
        xs = (
            # irrational-ish step: all 1M x values distinct; y = x^3
            # monotone; z coarse (97 levels) to exercise the
            # single-bucket branch in the same call
            spark.range(sp_n)
            .select(
                (F.col("id") * F.lit(1.000000712)).alias("x"),
                (F.col("id") * F.lit(1.000000712)).alias("y0"),
                F.pmod(F.col("id"), F.lit(97)).cast("double").alias("z"),
            )
            .select("x", (F.col("y0") * F.col("y0") * F.col("y0")).alias("y"), "z")
        )
        sp = {
            (r["col_i"], r["col_j"]): r
            for r in spearman_correlations(xs, ["x", "y", "z"]).collect()
        }
        out["spearman_1m_sec"] = round(time.time() - t0, 2)
        out["spearman_1m_n"] = sp[("x", "y")]["n"]
        out["spearman_1m_rho_xy_exact_one"] = sp[("x", "y")]["rho"] == 1.0
        _section_end(spark)

    # ---- classifier_train gradient sparsity at d=2^21 (VERDICT r10
    # #2): the r10 dense form collected n_groups x d doubles per
    # iteration (~270 MB at d=2^20) regardless of how few features the
    # corpus actually has. The r11 sparse form collects one row per
    # NON-ZERO gradient bucket — bounded by the corpus' distinct hashed
    # features. Evidence: train at d=2^21 on a corpus whose distinct
    # feature count is known, and record model rows vs distinct
    # features vs d (rows <= feats << d is the sparsity claim; per-
    # iteration collected rows are bounded by the same feature count).
    cls_d = int(os.environ.get("SPARK_GRAFT_CLS_PROBE_D", str(2 ** 21)))
    if cls_d:
        from cassandra_diff_spark.functions.text import md5_hash64
        from cassandra_diff_spark.operators.curate import classifier_train

        t0 = time.time()
        n_cls_docs = 4000
        wordize = lambda c: F.concat(F.lit("w"), c.cast("string"))  # noqa: E731
        body = F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(1), F.lit(30)),
                lambda j: wordize(
                    F.pmod(F.xxhash64(F.col("id"), j), F.lit(50_000))
                ),
            ),
        )
        y = F.pmod(F.col("id"), F.lit(2))
        sent = F.when(y == 1, F.lit(" qpos qpos")).otherwise(F.lit(" qneg qneg"))
        cdocs = spark.range(n_cls_docs).select(
            F.col("id").alias("doc_id"),
            y.alias("y"),
            F.concat(body, sent).alias("text"),
        )
        cdocs = cdocs.persist()
        try:
            from cassandra_diff_spark.functions.text import words

            ws = F.filter(words(F.col("text")), lambda w: w != "")
            big = F.zip_with(
                F.slice(ws, 1, F.greatest(F.size(ws) - 1, F.lit(0))),
                F.slice(ws, 2, F.greatest(F.size(ws) - 1, F.lit(0)).cast("int")),
                lambda a, b: F.concat(a, F.lit("\x1f"), b),
            )
            feats = cdocs.select(
                F.explode(F.concat(ws, big)).alias("f")
            ).select(F.pmod(md5_hash64(F.col("f")), F.lit(cls_d)).alias("b"))
            n_feats = feats.distinct().count()
            model = classifier_train(
                cdocs, "doc_id", "text", "y",
                n_buckets=cls_d, iters=2, lr_milli=2_000,
            )
            n_model = model.count()
        finally:
            cdocs.unpersist()
        out["classifier_d21_sec"] = round(time.time() - t0, 2)
        out["classifier_d21_d"] = cls_d
        out["classifier_d21_distinct_feats"] = n_feats
        out["classifier_d21_model_rows"] = n_model
        out["classifier_d21_collect_bounded_by_feats"] = (
            n_model <= n_feats and n_feats < cls_d // 4
        )
        _section_end(spark)

    # ---- incremental-BPE crossover at realistic merge counts (VERDICT
    # r8 #1): r8 adjudicated the 128-merge/50k-type comparison as
    # job-overhead-bound (59 vs 55 s — a wash). This section runs the
    # regime the trainer exists for: >=1024 merges over >=500k word
    # types (env-tunable), through the r9 HYBRID — at this word count
    # the table fits the driver cap, so the full merge schedule runs as
    # dict/index updates (the engine's real decision; ~0.06 s/merge
    # measured, incl. the one corpus-sized seed pass), while the
    # OVER-CAP distributed delta loop is measured separately on a
    # 128-merge prefix with driver_word_cap=0 (its per-merge wall time
    # in local mode is job-launch-bound; what scales is its shuffle
    # volume, which the affected-word trend bounds). The batch path's
    # per-merge cost is a FULL pair-type recount — constant by
    # construction — so it is measured over two prefixes (16 and 64
    # merges) and extrapolated from the marginal cost, clearly labeled
    # as such; running batch to 1024 outright would be ~15 min of bench
    # for a number the marginal cost already determines. The
    # affected-word-fraction trend is sampled every 64 merges (the
    # work-proportionality evidence: per-merge delta work collapses
    # once merges leave the Zipf head, while batch recount cost never
    # drops).
    # r10: 4096 merges (r9 proved 1024 at ~0.07 s/merge; the 4x probe
    # turns the 32k-merge projection into evidence by showing the
    # per-merge cost stays flat as the pair-type table grows)
    bpe_merges = int(os.environ.get("SPARK_GRAFT_BPE_MERGES", "4096"))
    bpe_types = int(os.environ.get("SPARK_GRAFT_BPE_TYPES", "560000"))
    if bpe_merges > 0 and bpe_types > 0:
        from cassandra_diff_spark.operators.vocab import (
            bpe_pair_counts,
            bpe_train,
            bpe_train_incremental,
            bpe_word_counts,
        )

        t0 = time.time()
        # syllable-structured words: 64 two-char syllables, 4-6 per
        # word, drawn from a word-id so every id maps to a fixed word;
        # ids mix a guaranteed-coverage uniform block (one of each
        # type) with a cubed-uniform Zipf-ish head that carries the
        # mass — the shape that makes early merges touch many words
        # and late merges a sliver, like real text
        syls = [a + b for a in "bcdfghjklmnpqrstvwz" for b in "aeiou"][:64]
        syl_arr = F.array(*[F.lit(s) for s in syls])
        u = F.pmod(F.xxhash64("id"), F.lit(1_000_000)).cast("double") / 1e6
        zipf_wid = F.floor(u * u * u * F.lit(bpe_types)).cast("long")
        wid = F.when(F.col("id") < bpe_types, F.col("id")).otherwise(zipf_wid)
        nsyl = (F.pmod(F.xxhash64(wid, F.lit(1)), F.lit(3)) + 4).cast("int")
        word = F.concat_ws(
            "",
            F.transform(
                F.sequence(F.lit(1), nsyl),
                lambda j: F.element_at(
                    syl_arr,
                    (F.pmod(F.xxhash64(wid, j), F.lit(64)) + 1).cast("int"),
                ),
            ),
        )
        corp = spark.range(bpe_types * 4).select(word.alias("text"))
        corp.write.mode("overwrite").parquet(f"{work}/bpe_corpus.parquet")
        corp = spark.read.parquet(f"{work}/bpe_corpus.parquet")
        wc = bpe_word_counts(corp, "text")
        out["bpe_word_types"] = wc.count()
        out["bpe_seed_pair_types"] = bpe_pair_counts(wc).count()
        out["bpe_gen_sec"] = round(time.time() - t0, 2)

        # MEASURED driver-resident footprint (VERDICT r11 #3): build
        # the exact structures _bpe_train_local holds live — the Arrow-
        # staged (cnt, syms) word list, the full inverted pair -> word-
        # set index, and the global pair-count dict. Measured BEFORE
        # the incremental train below (which builds and frees the same
        # structures — after it, a rebuild fills the already-resident
        # arenas and the RSS delta reads ~0) and TWO ways: a deep
        # getsizeof walk (the structures' true Python-object bytes,
        # allocator-reuse-independent; cross-checked against a one-off
        # tracemalloc trace — 724 vs 742 B/word — at ~50 s less per
        # round) corroborated by the gc'd VmRSS delta (what the OS
        # actually charges the driver, arena slack included). The
        # extrapolation to the driver_word_cap=1M default replaces the
        # docstring's ~1-2 GB estimate with a number.
        import gc
        import sys as _sys

        from cassandra_diff_spark.operators.vocab import (
            _bpe_pair_counts_local,
        )

        gc.collect()
        rss0 = _vm_rss_mb()
        head_tbl = (
            bpe_word_counts(corp, "text").select("cnt", "syms").toArrow()
        )
        words_ = list(
            zip(
                head_tbl.column("cnt").to_pylist(),
                head_tbl.column("syms").to_pylist(),
            )
        )
        del head_tbl
        res_index: dict = {}
        res_pc: dict = {}
        for widx, (cnt_, s_) in enumerate(words_):
            for p, c in _bpe_pair_counts_local(s_).items():
                res_pc[p] = res_pc.get(p, 0) + c * cnt_
                res_index.setdefault(p, set()).add(widx)
        gc.collect()
        rss1 = _vm_rss_mb()
        n_words = len(words_)
        # deep size: containers + per-word tuple/int/str + index key
        # tuples/strs + set tables + one int object per distinct word
        # index (the same widx object lands in several sets; its slots
        # are inside getsizeof(set), the object is counted once)
        mem = (
            _sys.getsizeof(words_)
            + _sys.getsizeof(res_index)
            + _sys.getsizeof(res_pc)
            + 28 * n_words
        )
        for t in words_:
            mem += (
                _sys.getsizeof(t)
                + _sys.getsizeof(t[0])
                + _sys.getsizeof(t[1])
            )
        for p, s in res_index.items():
            mem += (
                _sys.getsizeof(p)
                + _sys.getsizeof(p[0])
                + _sys.getsizeof(p[1])
                + _sys.getsizeof(s)
            )
        for v in res_pc.values():
            mem += _sys.getsizeof(v)
        del words_, res_index, res_pc
        gc.collect()
        if n_words:
            out["bpe_driver_resident_mb"] = round(mem / 1048576, 1)
            if rss0 > 0 and rss1 > rss0:
                out["bpe_driver_resident_rss_mb"] = round(rss1 - rss0, 1)
            out["bpe_driver_resident_bytes_per_word"] = round(
                mem / n_words
            )
            out["bpe_driver_cap_rss_mb"] = round(
                mem / n_words * 1_000_000 / 1048576, 1
            )
        _section_end(spark)

        # the engine's REAL path at this word count: hybrid dispatch
        # routes a 560k-type table driver-side, so all bpe_merges run
        # as dict/index updates — measured 1024 merges in ~64 s where
        # the distributed loop pays ~0.6-1.0 s of job launch per merge
        t0 = time.time()
        bpe_stats: list = []
        inc = bpe_train_incremental(
            corp, "text", bpe_merges,
            checkpoint_every=16, stats=bpe_stats, stats_every=64,
        )
        t_end = time.time()
        out["bpe_incremental_sec"] = round(t_end - t0, 2)
        out["bpe_incremental_merges"] = len(inc)
        out["bpe_incr_per_merge_sec"] = round(
            (t_end - t0) / max(len(inc), 1), 4
        )
        # per-merge TIME trend from the in-run stamps (stats 4th elem):
        # first vs last quarter of the schedule — flat == the 32k-merge
        # projection extrapolates, growing == the driver dict scan or
        # delta job is rank-sensitive after all
        stamps = [st for st in bpe_stats if len(st) > 3]
        if len(stamps) >= 4 and len(inc) > 0:
            q = len(inc) // 4
            # baseline = the rank-1 stamp, NOT t0: bpe_train_incremental
            # runs data-sized seeding (word-count job, driver collect,
            # pair/index build) before merge 1, and folding that into the
            # first-quarter numerator would mask exactly the growing
            # per-merge trend this metric exists to detect
            base_st = stamps[0]
            first = min(stamps, key=lambda st: abs(st[0] - q))
            last = min(stamps, key=lambda st: abs(st[0] - 3 * q))
            if first[0] > base_st[0] and len(inc) > last[0]:
                out["bpe_incr_per_merge_first_q"] = round(
                    (first[3] - base_st[3]) / (first[0] - base_st[0]), 4
                )
                out["bpe_incr_per_merge_last_q"] = round(
                    (t_end - last[3]) / (len(inc) - last[0]), 4
                )
                out["bpe_setup_sec"] = round(base_st[3] - t0, 2)
        if bpe_stats:
            wt = max(out["bpe_word_types"], 1)
            out["bpe_affected_frac_first"] = round(bpe_stats[0][1] / wt, 6)
            out["bpe_affected_frac_mid"] = round(
                bpe_stats[len(bpe_stats) // 2][1] / wt, 6
            )
            out["bpe_affected_frac_last"] = round(bpe_stats[-1][1] / wt, 6)
        _section_end(spark)

        # real-vocabulary ENCODE at the trained merge count (r11): the
        # expression path cannot build a 4096-deep nested-replace tree
        # (MAX_EXPR_MERGES fail-fast); the greedy-kernel UDF twin
        # (merge-count-independent per word, per-task word cache)
        # tokenizes the whole corpus — the apply half of the tokenizer
        # story next to the train half above
        if inc:
            from cassandra_diff_spark.operators.vocab import (
                bpe_encode_documents_udf,
            )

            t0 = time.time()
            corp_id = corp.select(
                F.monotonically_increasing_id().alias("doc_id"), "text"
            )
            row = (
                bpe_encode_documents_udf(corp_id, "doc_id", "text", inc)
                .agg(
                    F.count(F.lit(1)).alias("d"),
                    F.sum("n_tokens").alias("t"),
                )
                .first()
            )
            out["bpe_encode_udf_sec"] = round(time.time() - t0, 2)
            out["bpe_encode_udf_docs"] = int(row["d"])
            out["bpe_encode_udf_tokens"] = int(row["t"])
            out["bpe_encode_udf_merges"] = len(inc)
            _section_end(spark)

        # the OVER-CAP path (a real 100 TB corpus can exceed any driver
        # word cap): the r11 BATCHED distributed loop, driver_word_cap=0.
        # One run, two regimes derived from the in-run stamps: this
        # synthetic corpus has 134 uniformly-hot seed pairs (each
        # touching 7-20% of word types), so the first ~134 merges are
        # ALL Zipf-head — their cost is affected-word VOLUME (collect +
        # per-word delta diffs), not job floor; bpe_dist_per_merge_sec
        # keeps the r10-comparable first-128 window. Past the head the
        # batch machinery amortizes the job floor to ~nothing —
        # bpe_dist_tail_per_merge_sec is the regime a real 32k-merge
        # schedule spends >99% of its ranks in.
        dist_merges = int(os.environ.get("SPARK_GRAFT_BPE_DIST_MERGES", "384"))
        dist = []
        if dist_merges > 0:
            dstats: list = []
            t0 = time.time()
            dist = bpe_train_incremental(
                corp, "text", dist_merges,
                checkpoint_every=16, driver_word_cap=0,
                stats=dstats, stats_every=32,
            )
            t_end = time.time()
            out["bpe_distributed_sec"] = round(t_end - t0, 2)
            out["bpe_dist_merges"] = len(dist)
            stamps = [s for s in dstats if len(s) > 3]
            w128 = [s for s in stamps if s[0] <= 128]
            if len(dist) >= 128 and len(w128) >= 2:
                out["bpe_dist_per_merge_sec"] = round(
                    (w128[-1][3] - t0) / w128[-1][0], 4
                )
            else:
                out["bpe_dist_per_merge_sec"] = round(
                    (t_end - t0) / max(len(dist), 1), 4
                )
            if len(w128) >= 2 and w128[-1][0] > w128[0][0]:
                # head MARGINAL off the rank-1 stamp (VERDICT r11 #5
                # done metric): the window average above folds the
                # corpus-sized seeding into merge 1's share; the
                # marginal is the per-merge cost of the head REGIME
                out["bpe_dist_head_per_merge_sec"] = round(
                    (w128[-1][3] - w128[0][3])
                    / (w128[-1][0] - w128[0][0]),
                    4,
                )
            half = [s for s in stamps if s[0] >= len(dist) // 2]
            if len(half) >= 2 and len(dist) > half[0][0]:
                out["bpe_dist_tail_per_merge_sec"] = round(
                    (t_end - half[0][3]) / (len(dist) - half[0][0]), 4
                )
            _section_end(spark)

        # PRODUCTION-vocabulary scale (VERDICT r11 #7): 32k merges end
        # to end — train through the hybrid path, encode the full
        # corpus through the ONE bpe_encode_documents entry point
        # (auto-dispatches to the greedy-kernel UDF past
        # MAX_EXPR_MERGES), round-trip parity asserted on a sample.
        # This is the vocabulary size the tokenizer docstrings cite as
        # the motivating case; until r12 it existed only as an
        # extrapolation.
        big_merges = int(os.environ.get("SPARK_GRAFT_BPE_32K", "32768"))
        if big_merges > 0:
            from cassandra_diff_spark.operators.vocab import (
                bpe_decode_documents,
                bpe_encode_documents,
            )

            t0 = time.time()
            big = bpe_train_incremental(
                corp, "text", big_merges, checkpoint_every=16
            )
            out["bpe_32k_train_sec"] = round(time.time() - t0, 2)
            out["bpe_32k_train_merges"] = len(big)
            _section_end(spark)

            t0 = time.time()
            corp_id = corp.select(
                F.monotonically_increasing_id().alias("doc_id"), "text"
            )
            row = (
                bpe_encode_documents(corp_id, "doc_id", "text", big)
                .agg(
                    F.count(F.lit(1)).alias("d"),
                    F.sum("n_tokens").alias("t"),
                )
                .first()
            )
            out["bpe_32k_encode_sec"] = round(time.time() - t0, 2)
            out["bpe_32k_encode_docs"] = int(row["d"])
            out["bpe_32k_encode_tokens"] = int(row["t"])

            # decode(encode(x)) == whitespace-normalized x on a sample
            sample = corp_id.limit(1000)
            enc = bpe_encode_documents(sample, "doc_id", "text", big)
            dec = bpe_decode_documents(enc, "id", "tokens").select(
                "id", F.col("text").alias("rt")
            )
            j = dec.join(
                sample.select(F.col("doc_id").alias("id"), "text"), "id"
            )
            norm = F.array_join(F.split(F.trim("text"), r"\s+"), " ")
            out["bpe_32k_roundtrip_ok"] = bool(
                j.filter(F.col("rt") != norm).count() == 0
                and j.count() == 1000
            )
            del big
            _section_end(spark)

        # CACHE-HOSTILE encode (VERDICT r11 #2 evidence): a corpus of
        # UNIQUE high-entropy "words" (hex blobs — the base64/minified-
        # JS shape) gives the per-task word cache a ~0% hit rate, so an
        # unbounded cache would grow with partition word cardinality;
        # the size/char caps clear it wholesale instead. The python
        # workers are long-lived (spark.python.worker.reuse), so
        # sampling VmHWM over the SAME worker pool before and after the
        # hostile encode bounds the encode's peak-RSS contribution:
        # 8 partitions x ~800k distinct words/task crosses the 262k-
        # entry cap several times per task, and the pool's peak must
        # not move by more than one cache generation.
        hostile_docs = int(
            os.environ.get("SPARK_GRAFT_BPE_HOSTILE", "100000")
        )
        if hostile_docs > 0 and inc:
            from cassandra_diff_spark.operators.vocab import (
                bpe_encode_documents_udf,
            )

            hostile = (
                spark.range(hostile_docs)
                .repartition(8)
                .select(
                    F.col("id").alias("doc_id"),
                    F.concat_ws(
                        " ",
                        *[
                            F.lower(F.hex(F.xxhash64("id", F.lit(j))))
                            for j in range(64)
                        ],
                    ).alias("text"),
                )
            )

            def _hwm(_batches):
                import pandas as pd  # noqa: PLC0415

                kb = 0
                try:
                    with open("/proc/self/status") as f:
                        for line in f:
                            if line.startswith("VmHWM:"):
                                kb = int(line.split()[1])
                except OSError:
                    pass
                for _ in _batches:
                    pass
                yield pd.DataFrame({"hwm_kb": [kb]})

            def _pool_hwm_mb() -> float:
                return round(
                    spark.range(0, 64, 1, 64)
                    .mapInPandas(_hwm, "hwm_kb long")
                    .agg(F.max("hwm_kb"))
                    .first()[0]
                    / 1024.0,
                    1,
                )

            hwm0 = _pool_hwm_mb()
            t0 = time.time()
            row = (
                bpe_encode_documents_udf(hostile, "doc_id", "text", inc)
                .agg(F.sum("n_tokens").alias("t"))
                .first()
            )
            out["bpe_hostile_encode_sec"] = round(time.time() - t0, 2)
            out["bpe_hostile_words"] = hostile_docs * 64
            hwm1 = _pool_hwm_mb()
            out["bpe_hostile_worker_hwm_before_mb"] = hwm0
            out["bpe_hostile_worker_hwm_after_mb"] = hwm1
            out["bpe_hostile_worker_hwm_delta_mb"] = round(
                hwm1 - hwm0, 1
            )
            _section_end(spark)

        # UNIGRAM twin at scale (r12 beyond-reference surface): hard-EM
        # train at a 16k target over the same 559k-word-type corpus,
        # then the map-only Viterbi encode of the full corpus — the
        # per-family evidence that the OTHER production tokenizer keeps
        # the same cost class (word-type-bounded train, corpus-map-only
        # encode) as BPE.
        uni_vocab = int(os.environ.get("SPARK_GRAFT_UNIGRAM", "16384"))
        if uni_vocab > 0:
            from cassandra_diff_spark.operators.unigram import (
                unigram_decode_documents,
                unigram_encode_documents_udf,
                unigram_train,
            )

            t0 = time.time()
            upieces = unigram_train(corp, "text", uni_vocab)
            out["unigram_train_sec"] = round(time.time() - t0, 2)
            out["unigram_pieces"] = len(upieces)
            _section_end(spark)

            t0 = time.time()
            corp_id = corp.select(
                F.monotonically_increasing_id().alias("doc_id"), "text"
            )
            row = (
                unigram_encode_documents_udf(
                    corp_id, "doc_id", "text", upieces
                )
                .agg(
                    F.count(F.lit(1)).alias("d"),
                    F.sum("n_tokens").alias("t"),
                )
                .first()
            )
            out["unigram_encode_sec"] = round(time.time() - t0, 2)
            out["unigram_encode_docs"] = int(row["d"])
            out["unigram_encode_tokens"] = int(row["t"])

            sample = corp_id.limit(1000)
            enc = unigram_encode_documents_udf(
                sample, "doc_id", "text", upieces
            )
            dec = unigram_decode_documents(enc, "id", "tokens").select(
                "id", F.col("text").alias("rt")
            )
            j = dec.join(
                sample.select(F.col("doc_id").alias("id"), "text"), "id"
            )
            norm = F.array_join(F.split(F.trim("text"), r"\s+"), " ")
            out["unigram_roundtrip_ok"] = bool(
                j.filter(F.col("rt") != norm).count() == 0
                and j.count() == 1000
            )
            del upieces
            _section_end(spark)

        t0 = time.time()
        bat16 = bpe_train(corp, "text", 16, checkpoint_every=16)
        t16 = time.time() - t0
        t0 = time.time()
        bat64 = bpe_train(corp, "text", 64, checkpoint_every=16)
        t64 = time.time() - t0
        out["bpe_batch_16_sec"] = round(t16, 2)
        out["bpe_batch_64_sec"] = round(t64, 2)
        marginal = (t64 - t16) / 48
        out["bpe_batch_per_merge_marginal_sec"] = round(marginal, 4)
        # labeled extrapolation: batch recounts EVERY pair type each
        # merge, so its marginal cost cannot decrease with rank
        out["bpe_batch_extrapolated_sec"] = round(marginal * bpe_merges, 1)
        out["bpe_crossover_ratio"] = round(
            out["bpe_incremental_sec"]
            / max(out["bpe_batch_extrapolated_sec"], 1e-9),
            3,
        )
        # correctness cross-check rides free: same merges, same order,
        # across all THREE paths (batch recount, driver-local hybrid,
        # distributed delta loop)
        out["bpe_paths_agree"] = (
            [m[:4] for m in bat64] == [m[:4] for m in inc[:64]]
            and (
                not dist
                or [m[:4] for m in dist] == [m[:4] for m in inc[: len(dist)]]
            )
        )
        _section_end(spark)

    release_caches()
    return out


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from cassandra_diff_spark.session import get_spark

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    spark = get_spark("scale-probe")
    print(json.dumps(run_probe(spark, n)))
