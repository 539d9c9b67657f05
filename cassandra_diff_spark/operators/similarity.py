"""Similarity search over embedding columns (`array<float>`).

  * brute_force_topk — exact cosine top-k: the correctness baseline.
    Quantized-integer arithmetic keeps ranking deterministic and
    oracle-checkable; the query side is broadcast (queries << corpus).
  * hyperplane_lsh_topk — the scale path: random-hyperplane signature
    buckets shrink the candidate set from |corpus| to bucket-mates
    (multi-probe over signature bands), then exact rerank. Hyperplane
    weights are derived from the md5 hash of (plane, dim) — deterministic,
    no RNG state to ship to executors.

At 100 TB the corpus side stays partitioned; only the k-row-per-query
top-k window and the tiny query set move. An IVF variant would replace the
hash buckets with learned centroids — same join shape.
"""

from __future__ import annotations

from functools import reduce

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cassandra_diff_spark.functions.text import md5_hash64
from cassandra_diff_spark.functions.vectors import (
    QUANT,
    cosine_from_int,
    int_dot,
    quantize,
    sq_norm,
)

# 64 planes in 8 bands of 8 bits: 256 buckets per band (was 16 planes /
# 4-bit keys — 16 buckets per band is nearly global at corpus scale: the
# old multi-probe plan touched ~n*20/16 > n candidate rows per query).
# Wider keys cost per-band recall; 8 bands + radius-2 multi-probe on the
# TINY query side buys it back while probing ~14% of the corpus
# (8 bands x 37 probes / 2048 bucket-fractions).
N_PLANES = 64
PLANE_BANDS = 8
PLANE_BAND_BITS = N_PLANES // PLANE_BANDS
PROBE_RADIUS = 2

#: XOR masks within Hamming distance PROBE_RADIUS of a band key, in
#: popcount-then-value order (0 first = the exact bucket).
PROBE_MASKS: list[int] = sorted(
    (
        m
        for m in range(1 << PLANE_BAND_BITS)
        if bin(m).count("1") <= PROBE_RADIUS
    ),
    key=lambda m: (bin(m).count("1"), m),
)


def _prep(df: DataFrame, id_col: str, vec_col: str, prefix: str) -> DataFrame:
    return df.select(
        F.col(id_col).alias(f"{prefix}id"),
        quantize(F.col(vec_col)).alias(f"{prefix}q"),
    ).withColumn(f"{prefix}n", sq_norm(F.col(f"{prefix}q")))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k of each query vector against the corpus.

    (query_id, neighbor_id, rank) with rank 1..k by cosine desc,
    neighbor_id asc tiebreak. Self-matches (same id) excluded.
    """
    c = _prep(corpus, id_col, vec_col, "c_")
    q = _prep(queries, id_col, vec_col, "q_")
    j = c.crossJoin(F.broadcast(q)).filter(F.col("c_id") != F.col("q_id"))
    scored = j.withColumn("dot", int_dot(F.col("q_q"), F.col("c_q"))).withColumn(
        "cos", cosine_from_int(F.col("dot"), F.col("q_n"), F.col("c_n"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("c_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(
            F.col("q_id").alias("query_id"),
            F.col("c_id").alias("neighbor_id"),
            "rank",
        )
    )


def hyperplane_band_keys(
    vec_q, dim: int, n_planes: int = N_PLANES, n_bands: int = PLANE_BANDS
):
    """Deterministic random-hyperplane band keys of a quantized vector:
    plane p weight for dim d = (md5_hash64(concat(p,'_',d)) % 2001) - 1000;
    bit = 1 iff the integer projection is positive. Returns an
    ``array<long>`` of ``n_bands`` keys; band b packs planes
    b*BITS .. b*BITS+BITS-1 (BITS = n_planes // n_bands), plane
    b*BITS+r contributing bit 2^r. Defaults match the SQL oracle twin
    (:func:`hyperplane_band_key_sql`, which is generated for the
    default 8x8 layout); non-default layouts reuse the same plane
    weights, so band b at BITS=16 packs exactly the planes of oracle
    bands 2b and 2b+1.

    Implemented as an Arrow-batched pandas_udf: all 64 projections of a
    whole batch are ONE float64 matmul. The float64 cast is EXACT, not
    approximate: quantized values < 2^21 and |weights| <= 1000 bound
    every projection below 2^37 << 2^53, so each product and partial sum
    is an integer float64 represents exactly — the sign bits are
    bit-identical to the SQL twin's integer arithmetic. numpy has no
    BLAS kernel for int64 (@ falls back to naive loops, measured ~30x
    slower at a 1M-row corpus); the float64 path is the difference
    between the sketch being cheaper or MORE expensive than brute-force
    scoring. The expression-DSL alternative — 64 dots per row over a
    4096-element literal matrix — re-materializes the literal per
    element_at and measured ~25x slower still. At real corpus scale,
    persist the keyed frame once instead of recomputing it per band
    join."""
    from pyspark.sql.functions import pandas_udf

    if n_planes % n_bands:
        raise ValueError(f"n_bands={n_bands} must divide n_planes={n_planes}")
    band_bits = n_planes // n_bands
    w = np.array(
        [[_plane_weight(p, d) for d in range(dim)] for p in range(n_planes)],
        dtype=np.float64,
    )
    powers = (1 << np.arange(band_bits, dtype=np.int64))

    @pandas_udf("array<long>")
    def keys_udf(qs: pd.Series) -> pd.Series:
        q = np.array(list(qs), dtype=np.float64)  # batch x dim
        bits = (q @ w.T > 0).astype(np.int64)  # batch x n_planes
        keys = bits.reshape(len(q), n_bands, band_bits) @ powers
        return pd.Series(list(keys))

    # asNondeterministic (guide §4.4): the function is a pure per-row
    # matmul, but downstream equi-joins/groupBys on a key derived from
    # it make the optimizer infer isnotnull(element_at(keys, i)) and
    # push that predicate BELOW the projection — duplicating the
    # ArrowEvalPython node, so every corpus row paid the 64-projection
    # matmul twice (seen in the cell-sampling gate plan). The marking
    # forbids the duplication; callers apply their input filters before
    # this column, so no wanted pushdown is lost.
    return keys_udf.asNondeterministic()(vec_q)


def hyperplane_band_key_sql(vec_expr: str, dim: int, band: int) -> str:
    """DuckDB twin of one band key of :func:`hyperplane_band_keys`: same
    literal weights, same positive-projection bits, one unrolled sum."""
    terms = []
    for r in range(PLANE_BAND_BITS):
        p = band * PLANE_BAND_BITS + r
        wl = "[" + ", ".join(str(_plane_weight(p, d)) for d in range(dim)) + "]"
        proj = f"list_sum([({vec_expr})[i] * ({wl})[i] for i in range(1, {dim} + 1)])"
        terms.append(f"(CASE WHEN {proj} > 0 THEN {1 << r} ELSE 0 END)")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


_weight_cache: dict[tuple[int, int], int] = {}


def _plane_weight(p: int, d: int) -> int:
    """Deterministic pseudo-random weight in [-1000, 1000] from md5 —
    computed driver-side once (closure constant), not per row."""
    key = (p, d)
    if key not in _weight_cache:
        import hashlib

        h = int(hashlib.md5(f"{p}_{d}".encode()).hexdigest()[:15], 16)
        _weight_cache[key] = (h % 2001) - 1000
    return _weight_cache[key]


def _make_vec_matrix_fn(dim: int):
    """Factory for the fused builders' Arrow->quantized-matrix kernel.
    Returned as a CLOSURE (not a module-level function) so cloudpickle
    ships it by value to executors — the fused paths then work no matter
    what the worker's sys.path looks like (a driver running from outside
    the repo cannot rely on executors importing this package).

    The kernel: (batch x dim) int64 quantized matrix straight from an
    Arrow list column — flat-buffer reshape, no per-row Python objects.
    Quantization is bit-exact with Spark's ``round(x * 1000)``: Spark
    rounds HALF_UP (ties away from zero) while ``np.rint`` rounds
    half-even, so exact .5 fractions are fixed up explicitly. Exactness
    argument: for |v| < 2^52 every k+0.5 is representable, so the binary
    value and its shortest-decimal form (what Spark's BigDecimal.valueOf
    rounds) are always on the same side of the tie boundary — non-tie
    cases agree with nearest-integer, and ties are detected exactly as
    frac == 0.5. Raises on null or ragged vectors (an index over them is
    undefined; filter first) instead of silently misaligning the
    reshape."""
    quant = float(QUANT)

    def vec_matrix(emb_array) -> "np.ndarray":
        if emb_array.null_count:
            raise ValueError(
                "null embedding vectors cannot be indexed - filter them "
                "out before building the index"
            )
        flat = emb_array.flatten()
        if len(flat) != len(emb_array) * dim:
            raise ValueError(
                f"ragged embedding column: expected uniform dim={dim}, "
                f"got {len(flat)} values for {len(emb_array)} rows"
            )
        x = flat.to_numpy(zero_copy_only=False).reshape(len(emb_array), dim)
        v = x.astype(np.float64) * quant
        q = np.rint(v)
        ties = np.abs(v - np.floor(v)) == 0.5
        if ties.any():
            q[ties] = np.trunc(v[ties]) + np.copysign(1.0, v[ties])
        return q.astype(np.int64)

    return vec_matrix


def hyperplane_lsh_index(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int = 64,
    n_planes: int = N_PLANES,
    n_bands: int = PLANE_BANDS,
    fused: bool = True,
) -> DataFrame:
    """The persistable LSH index of a corpus: (c_id, c_q, c_n, c_keys) —
    quantized vector, squared norm, and the band-key array.

    Build once, query many: at corpus scale the signature pass is the
    dominant cost of a single `hyperplane_lsh_topk` call, but it is a
    pure function of the corpus — write this frame to parquet (or
    persist it) and pass it back via ``index=`` to amortize it across
    every subsequent query batch. The layout params (dim/n_planes/
    n_bands) are baked into the keys; queries against the index must use
    the same values.

    ``fused`` (default): quantize + norm + band keys computed in ONE
    ``mapInArrow`` numpy pass over the raw vectors — flat Arrow buffers
    in, flat buffers out, no per-element Catalyst lambdas and no
    per-row object conversion (the throughput bottleneck of the classic
    path at 10^6+ rows). Bit-identical to the expression path
    (``fused=False``): the numpy quantize reproduces Spark's HALF_UP
    round exactly (see :func:`_quantize_np`; parity is pytest-asserted),
    so either path serves the same oracle-checked results.
    """
    if not fused:
        return _prep(corpus, id_col, vec_col, "c_").withColumn(
            "c_keys", hyperplane_band_keys(F.col("c_q"), dim, n_planes, n_bands)
        )
    if n_planes % n_bands:
        raise ValueError(f"n_bands={n_bands} must divide n_planes={n_planes}")
    band_bits = n_planes // n_bands
    w = np.array(
        [[_plane_weight(p, d) for d in range(dim)] for p in range(n_planes)],
        dtype=np.float64,
    )
    powers = 1 << np.arange(band_bits, dtype=np.int64)
    id_type = dict(corpus.dtypes)[id_col]
    vec_matrix = _make_vec_matrix_fn(dim)

    def batches(it):
        import pyarrow as pa

        for batch in it:
            qi = vec_matrix(batch.column(vec_col))
            norm = np.einsum("ij,ij->i", qi, qi)
            # float64 matmul is exact for these magnitudes (< 2^37 per
            # projection partial sum << 2^53); int64 @ has no BLAS kernel
            bits = (qi.astype(np.float64) @ w.T > 0).astype(np.int64)
            keys = bits.reshape(len(qi), n_bands, band_bits) @ powers
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column(id_col),
                    pa.FixedSizeListArray.from_arrays(
                        pa.array(qi.reshape(-1), type=pa.int64()), dim
                    ).cast(pa.list_(pa.int64())),
                    pa.array(norm, type=pa.int64()),
                    pa.FixedSizeListArray.from_arrays(
                        pa.array(keys.reshape(-1), type=pa.int64()), n_bands
                    ).cast(pa.list_(pa.int64())),
                ],
                ["c_id", "c_q", "c_n", "c_keys"],
            )

    return corpus.select(id_col, vec_col).mapInArrow(
        batches, f"c_id {id_type}, c_q array<long>, c_n long, c_keys array<long>"
    )


def hyperplane_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    dim: int = 64,
    multi_probe: bool = True,
    n_planes: int = N_PLANES,
    n_bands: int = PLANE_BANDS,
    probe_radius: int = PROBE_RADIUS,
    index: DataFrame | None = None,
) -> DataFrame:
    """Approximate top-k: candidates are corpus vectors sharing at least
    one signature band (PLANE_BANDS bands of PLANE_BAND_BITS planes) with
    the query, reranked by exact cosine. Joins on 8-bit band keys — each
    probed bucket holds ~|corpus|/256, and the probe set covers
    PLANE_BANDS * |PROBE_MASKS| / (PLANE_BANDS * 256) ~ 14% of the
    corpus, vs the full corpus for brute force.

    ``multi_probe``: the query side also probes every band key within
    Hamming distance PROBE_RADIUS (classic multi-probe LSH): |PROBE_MASKS|
    buckets per band on the TINY query side only — this is what buys the
    recall back after widening the band keys from 4 to 8 bits.

    Scale shape: the band joins carry ONLY (q_id, c_id) into the
    dedup — the full vectors are re-attached afterwards (queries by
    broadcast, corpus by one id-equi-join), so the distinct shuffles id
    pairs, never vectors.

    ``n_planes``/``n_bands``/``probe_radius`` size the probed fraction:
    the defaults (8x8-bit bands, radius 2 -> 37 probes of 256 buckets
    per band) probe a large corpus fraction — right for 10^4-10^5 rows
    where recall matters more than pruning. At 10^6+ use wider bands and
    a smaller radius (e.g. ``n_bands=4, probe_radius=1``: 17 probes of
    65536 buckets per band ~ 0.03% per band) so the candidate set stays
    a sub-percent corpus fraction — scale_probe.py measures exactly this
    trade at 10^6 vectors.

    ``index``: a prebuilt :func:`hyperplane_lsh_index` frame (same
    layout params). When given, the corpus signature pass is skipped
    entirely — the caller owns the index's persistence (parquet or
    .persist()), so repeated query batches pay only the candidate join
    + rerank.
    """
    from cassandra_diff_spark.operators import tracked_cache

    band_bits = n_planes // n_bands
    masks = sorted(
        (m for m in range(1 << band_bits) if bin(m).count("1") <= probe_radius),
        key=lambda m: (bin(m).count("1"), m),
    )
    # cached: the corpus branch feeds BOTH the band join and the vector
    # rejoin; without materialization each branch re-runs quantize+keys
    # (tracked — long-lived sessions release via operators.release_caches).
    # A caller-supplied index is used as-is: its persistence is the
    # caller's choice, and re-caching a parquet-backed index would only
    # duplicate storage.
    c = (
        index
        if index is not None
        else tracked_cache(
            hyperplane_lsh_index(corpus, id_col, vec_col, dim, n_planes, n_bands)
        )
    )
    q = _prep(queries, id_col, vec_col, "q_").withColumn(
        "q_keys", hyperplane_band_keys(F.col("q_q"), dim, n_planes, n_bands)
    )
    # ONE corpus pass: posexplode the key array to (band, band_key) rows
    # and join once on the composite key — not PLANE_BANDS separate
    # branch joins each rescanning (and re-projecting) the corpus
    c_b = c.select("c_id", F.posexplode(F.col("c_keys")).alias("band", "band_key"))
    q_b = q.select("q_id", F.posexplode(F.col("q_keys")).alias("band", "qkey"))
    if multi_probe:
        probes = F.array(
            *[F.col("qkey").bitwiseXOR(F.lit(m)) for m in masks]
        )
        q_b = q_b.select("q_id", "band", F.explode(probes).alias("band_key"))
    else:
        q_b = q_b.select("q_id", "band", F.col("qkey").alias("band_key"))
    cand_ids = (
        c_b.join(F.broadcast(q_b), ["band", "band_key"])
        .filter(F.col("c_id") != F.col("q_id"))
        .select("q_id", "c_id")
        .distinct()
    )
    cand = cand_ids.join(c.select("c_id", "c_q", "c_n"), "c_id").join(
        F.broadcast(q.select("q_id", "q_q", "q_n")), "q_id"
    )
    scored = cand.withColumn("dot", int_dot(F.col("q_q"), F.col("c_q"))).withColumn(
        "cos", cosine_from_int(F.col("dot"), F.col("q_n"), F.col("c_n"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("c_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(
            F.col("q_id").alias("query_id"),
            F.col("c_id").alias("neighbor_id"),
            "rank",
        )
    )


def _sample_centroids(c: DataFrame, centroid_mod: int, max_centroids: int):
    """Driver-side centroid matrix from the deterministic hash-mod
    sample of a prepped corpus frame (c_id, c_q, c_n): (cent_mat,
    cent_n) float64 arrays in c_id-sorted order. The LIMIT bounds the
    fetch at max_centroids+1 rows no matter how dense the sample is —
    the guard fires BEFORE the driver holds more than the cap."""
    cents = (
        c.filter(md5_hash64(F.col("c_id").cast("string")) % centroid_mod == 0)
        .select("c_id", "c_q", "c_n")
        .limit(max_centroids + 1)
        .collect()
    )
    if not cents:
        raise ValueError(
            f"centroid_mod={centroid_mod} sampled no centroids; lower it"
        )
    if len(cents) > max_centroids:
        raise ValueError(
            f"centroid_mod={centroid_mod} sampled more than "
            f"max_centroids={max_centroids} centroids; raise centroid_mod "
            f"(pick ~ sqrt(|corpus|)) or max_centroids if the driver can "
            f"hold the matrix"
        )
    # stable centroid order for the (d2 asc, id asc) tiebreak; sorting
    # driver-side on the Python values keeps ANY orderable id type
    # (int, string, ...) working — lists are joined on the ORDINAL index,
    # so cent_id never has to round-trip through numpy
    cents.sort(key=lambda r: r.c_id)
    # float64 matmul is EXACT here (not approximate): quantized values
    # < 2^21 bound every product at 2^42 and every 64-dim sum at 2^48,
    # below float64's 2^53 integer-exact range — while int64 @ has no
    # BLAS kernel in numpy (measured ~30x slower at a 1M-row corpus)
    cent_mat = np.array([r.c_q for r in cents], dtype=np.float64)
    cent_n = np.array([r.c_n for r in cents], dtype=np.float64)
    return cent_mat, cent_n


#: hard cap on driver-collected query sets: the ANN query paths hold the
#: query matrix (and, for PQ, its LUTs) on the driver by contract — a
#: bounded probe set, not a second corpus. 100k 64-dim queries is ~50 MB
#: of LUTs; a million-query frame belongs in a join-shaped pipeline
#: (e.g. dedup near-pairs), so the cap fails fast instead of OOMing.
MAX_DRIVER_QUERIES = 100_000


def _collect_queries(queries: DataFrame, id_col: str, vec_col: str):
    """Driver-side (ids, quantized matrix, norms) of a BOUNDED query
    set; raises if it exceeds :data:`MAX_DRIVER_QUERIES` (collects at
    most cap+1 rows either way)."""
    q_rows = (
        _prep(queries, id_col, vec_col, "q_")
        .select("q_id", "q_q", "q_n")
        .limit(MAX_DRIVER_QUERIES + 1)
        .collect()
    )
    if len(q_rows) > MAX_DRIVER_QUERIES:
        raise ValueError(
            f"query set exceeds MAX_DRIVER_QUERIES={MAX_DRIVER_QUERIES}; "
            f"the *_topk query paths hold queries driver-side by contract "
            f"— for corpus-scale probe sets use the banded near-pair "
            f"operators (operators/dedup.py) instead"
        )
    q_ids = np.array([r.q_id for r in q_rows], dtype=np.int64)
    q_mat = np.array([r.q_q for r in q_rows], dtype=np.float64)  # exact ints
    q_norm = np.sqrt(np.array([r.q_n for r in q_rows], dtype=np.float64))
    return q_ids, q_mat, q_norm


#: rows per assignment matmul chunk: bounds the rows x n_centroids
#: scratch at ~16 MB for nlist=1000 and keeps it REUSED — a full-batch
#: (10^4 x nlist) scratch is ~80 MB of FRESH allocation per batch per
#: worker, and the first-touch page faults of 32 workers x that scratch
#: dominated the cold 1M-row build (measured 16 s -> 5.8 s cold,
#: identical 1.4 s warm; scale_probe now records both).
_ASSIGN_CHUNK = 2048


def _make_assign_fn(cent_mat: np.ndarray, cent_n: np.ndarray, top: int):
    """Factory for the nearest-``top``-centroid kernel: ordinals per row
    of a float64 (integer-exact) matrix, chunked through a caller-
    preallocated scratch. Returned as a CLOSURE so cloudpickle ships it
    by value (same rationale as :func:`_make_vec_matrix_fn`).

    Ranks by (|c|^2 - 2<x,c>): the per-row |x|^2 constant drops out of
    every comparison (each quantity is an integer float64 represents
    exactly), skipping two rows x n_centroids broadcast intermediates.
    Ties break toward the SMALLEST centroid ordinal (argmin-first /
    stable argsort), matching the SQL oracle's row_number tiebreak;
    chunking cannot change any per-row result."""
    cent_T = np.ascontiguousarray(cent_mat.T)
    chunk_rows = _ASSIGN_CHUNK

    def assign(x: np.ndarray, buf: np.ndarray) -> np.ndarray:
        n = len(x)
        out = np.empty((n, top), dtype=np.int64)
        for i in range(0, n, chunk_rows):
            ch = x[i : i + chunk_rows]
            s = buf[: len(ch)]
            np.matmul(ch, cent_T, out=s)
            s *= -2.0
            s += cent_n[None, :]
            if top == 1:
                out[i : i + chunk_rows, 0] = np.argmin(s, axis=1)
            else:
                out[i : i + chunk_rows] = np.argsort(
                    s, axis=1, kind="stable"
                )[:, :top]
        return out

    def scratch(n_rows: int) -> np.ndarray:
        return np.empty(
            (min(chunk_rows, max(n_rows, 1)), len(cent_n)), dtype=np.float64
        )

    return assign, scratch


def _nearest_centroid_udf(cent_mat: np.ndarray, cent_n: np.ndarray, top: int):
    """Arrow-batched assignment kernel: ordinal indices of the ``top``
    nearest centroids per vector, chunked matmuls per batch."""
    from pyspark.sql.functions import pandas_udf

    assign, scratch = _make_assign_fn(cent_mat, cent_n, top)

    @pandas_udf("array<long>")
    def nearest(qs: pd.Series) -> pd.Series:
        x = np.array(list(qs), dtype=np.float64)  # batch x dim
        idx = assign(x, scratch(len(x)))
        return pd.Series(list(idx))

    # same §4.4 marking as hyperplane_band_keys: the IVF list join on
    # cent_id = element_at(nearest(...), 1) pushes an inferred
    # isnotnull below the projection and evaluates the assignment
    # matmul twice per corpus row (two ArrowEvalPython nodes in the
    # kmeans gate plan)
    return nearest.asNondeterministic()


def ivf_index(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    centroid_mod: int = 32,
    max_centroids: int = 65536,
    dim: int = 64,
    fused: bool = True,
) -> DataFrame:
    """The persistable IVF index of a corpus: (c_id, c_q, c_n, cent_id)
    — each vector quantized, normed, and assigned to its inverted list.

    Build once, query many: corpus list assignment is one full Arrow
    matmul pass — the dominant cost of a single `ivf_topk` call, and a
    pure function of (corpus, centroid_mod). Write this frame to parquet
    partitioned/sorted however suits the serving layer and pass it back
    via ``index=``; query batches then recover the (tiny) centroid
    matrix from the index frame itself with a hash-filtered scan instead
    of re-assigning the corpus.

    ``fused`` (default): quantize + norm + centroid assignment in ONE
    ``mapInArrow`` numpy pass over the raw vectors (same throughput
    rationale and bit-parity argument as the fused
    :func:`hyperplane_lsh_index`; the centroid sampling pre-pass still
    quantizes expression-side, touching only ~1/centroid_mod rows).
    """
    c = _prep(corpus, id_col, vec_col, "c_")
    cent_mat, cent_n = _sample_centroids(c, centroid_mod, max_centroids)
    if not fused:
        return c.withColumn(
            "cent_id",
            F.element_at(_nearest_centroid_udf(cent_mat, cent_n, 1)(F.col("c_q")), 1),
        )
    id_type = dict(corpus.dtypes)[id_col]
    vec_matrix = _make_vec_matrix_fn(dim)
    assign, scratch = _make_assign_fn(cent_mat, cent_n, 1)
    first_batch_rows = 10_000  # arrow default batch size, scratch cap

    def batches(it):
        import pyarrow as pa

        # ONE reused scratch per worker (see _ASSIGN_CHUNK: fresh
        # full-batch scratches page-fault the cold build to ~3x)
        buf = scratch(first_batch_rows)
        for batch in it:
            qi = vec_matrix(batch.column(vec_col))
            norm = np.einsum("ij,ij->i", qi, qi)
            x = qi.astype(np.float64)
            cent = assign(x, buf)[:, 0]
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column(id_col),
                    pa.FixedSizeListArray.from_arrays(
                        pa.array(qi.reshape(-1), type=pa.int64()), dim
                    ).cast(pa.list_(pa.int64())),
                    pa.array(norm, type=pa.int64()),
                    pa.array(cent.astype(np.int64), type=pa.int64()),
                ],
                ["c_id", "c_q", "c_n", "cent_id"],
            )

    return corpus.select(id_col, vec_col).mapInArrow(
        batches, f"c_id {id_type}, c_q array<long>, c_n long, cent_id long"
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    centroid_mod: int = 32,
    n_probe: int = 4,
    max_centroids: int = 65536,
    index: DataFrame | None = None,
) -> DataFrame:
    """IVF-style ANN: the corpus is partitioned into inverted lists by
    nearest centroid; a query scans only its ``n_probe`` nearest lists.

    Centroids are a deterministic hash-mod sample of the corpus itself —
    vectors whose md5-hashed id is ``0 (mod centroid_mod)``, i.e. ~1 in
    ``centroid_mod`` corpus vectors — a stand-in for k-means training,
    which would slot into the same join shape (Spark ML KMeans.fit on
    this same sample is the drop-in upgrade). The predicate is a plain
    filter: NO corpus count, NO global-window ranking — nothing funnels
    the corpus through one task, and the whole operator stays
    SQL-reproducible (md5 arithmetic) for the DuckDB oracle.

    Scale: centroid assignment is ONE int64 matmul per Arrow batch
    against the driver-collected centroid matrix (IVF centroid sets are
    small by design — that is the index's whole premise) — NOT a
    crossJoin+window, which would materialize |corpus| x |centroids|
    intermediate rows (measured: 1M x 1k = 1B-row plan, unrunnable).
    Only list-mates are scored — |corpus| / n_lists * n_probe candidates
    per query. Pick ``centroid_mod`` ~ sqrt(|corpus|) so lists and the
    centroid set balance; ``max_centroids`` hard-caps the driver-side
    collect — the sample is fetched through a LIMIT, so an under-sized
    ``centroid_mod`` on a billion-row corpus raises with guidance
    instead of OOMing the driver.

    ``index``: a prebuilt :func:`ivf_index` frame (same centroid_mod).
    When given, the corpus assignment pass is skipped; the centroid
    matrix is re-derived from the index frame's own hash-mod sample (a
    filtered column scan of the persisted index, not a corpus re-pass).
    """
    q = _prep(queries, id_col, vec_col, "q_")
    if index is not None:
        c_assigned = index
        cent_mat, cent_n = _sample_centroids(index, centroid_mod, max_centroids)
    else:
        c = _prep(corpus, id_col, vec_col, "c_")
        # deterministic hash-mod "training" sample (no count, no global
        # window); collected because every executor needs the full matrix
        cent_mat, cent_n = _sample_centroids(c, centroid_mod, max_centroids)
        c_assigned = c.withColumn(
            "cent_id",
            F.element_at(_nearest_centroid_udf(cent_mat, cent_n, 1)(F.col("c_q")), 1),
        )  # each corpus vector in ONE list
    q_assigned = q.withColumn(
        "cent_id", F.explode(_nearest_centroid_udf(cent_mat, cent_n, n_probe)(F.col("q_q")))
    )  # queries probe several lists

    return _ivf_rerank(c_assigned, q_assigned, k)


def _ivf_rerank(c_assigned: DataFrame, q_assigned: DataFrame, k: int) -> DataFrame:
    """Shared IVF tail: join list-mates (tiny query side broadcast),
    score by exact integer cosine, per-query top-k window. No distinct
    needed: each corpus vector lives in exactly one list and a query
    probes n_probe DISTINCT lists, so (q, c) pairs are unique."""
    cand = c_assigned.join(
        F.broadcast(q_assigned), "cent_id"
    ).filter(F.col("c_id") != F.col("q_id"))
    scored = cand.withColumn("dot", int_dot(F.col("q_q"), F.col("c_q"))).withColumn(
        "cos", cosine_from_int(F.col("dot"), F.col("q_n"), F.col("c_n"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("c_id").asc())
    return (
        scored.select("q_id", "c_id", "cos")
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(
            F.col("q_id").alias("query_id"),
            F.col("c_id").alias("neighbor_id"),
            "rank",
        )
    )


def ivf_topk_kmeans(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    n_lists: int = 16,
    n_probe: int = 4,
    sample_mod: int = 4,
    seed: int = 42,
    max_iter: int = 10,
) -> DataFrame:
    """IVF ANN with Spark ML KMeans-trained centroids — the learned
    upgrade of ``ivf_topk``'s hash-mod sample, same join shape.

    Training runs distributed (KMeans.fit on a deterministic hash-mod
    sample of the quantized corpus — no full-corpus pass, no driver
    materialization beyond the k centroid vectors); assignment is the
    same one-matmul-per-Arrow-batch kernel, in float64 against the
    learned centers. Scoring stays exact integer cosine, so only the
    LIST PLACEMENT is learned — recall improves because KMeans balances
    list occupancy where a hash-mod sample can leave lists empty.

    Iterative training is not SQL-expressible, so this path is
    pytest-gated (recall vs brute force) and registered rows-only;
    ``ivf_topk`` remains the oracle-matched default.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    c = _prep(corpus, id_col, vec_col, "c_")
    q = _prep(queries, id_col, vec_col, "q_")

    train = c.filter(
        md5_hash64(F.col("c_id").cast("string")) % sample_mod == 0
    ).select(array_to_vector(F.col("c_q").cast("array<double>")).alias("features"))
    model = KMeans(k=n_lists, seed=seed, maxIter=max_iter).fit(train)
    cent_mat = np.asarray(model.clusterCenters(), dtype=np.float64)
    cent_n = np.einsum("ij,ij->i", cent_mat, cent_mat)
    n_cents = cent_mat.shape[0]

    top = min(n_probe, n_cents)
    c_assigned = c.withColumn(
        "cent_id", F.element_at(_nearest_centroid_udf(cent_mat, cent_n, 1)(F.col("c_q")), 1)
    )
    q_assigned = q.withColumn(
        "cent_id", F.explode(_nearest_centroid_udf(cent_mat, cent_n, top)(F.col("q_q")))
    )
    return _ivf_rerank(c_assigned, q_assigned, k)


def brute_force_topk_pandas(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
) -> DataFrame:
    """Arrow/NumPy variant of :func:`brute_force_topk`: the query matrix is
    broadcast to every partition and each Arrow batch of corpus vectors is
    scored with one BLAS matmul (``mapInPandas``).

    Same quantized-integer arithmetic, so results are identical to the
    expression-based version; wins when dim x batch is large enough that
    one matmul beats per-row higher-order functions. Pattern: per-batch
    partial top-k, then a tiny global top-k reduction.
    """
    import numpy as np
    import pandas as pd

    spark = corpus.sparkSession
    q_ids, q_mat, q_norm = _collect_queries(queries, id_col, vec_col)
    bq_ids = spark.sparkContext.broadcast(q_ids)
    bq_mat = spark.sparkContext.broadcast(q_mat)
    bq_norm = spark.sparkContext.broadcast(q_norm)

    c = _prep(corpus, id_col, vec_col, "c_").select("c_id", "c_q", "c_n")

    def score(batches):
        ids, mat, qn = bq_ids.value, bq_mat.value, bq_norm.value
        for pdf in batches:
            c_ids = pdf["c_id"].to_numpy(dtype=np.int64)
            c_mat = np.array(list(pdf["c_q"]), dtype=np.float64)
            c_norm = np.sqrt(pdf["c_n"].to_numpy(dtype=np.float64))
            # cosine matrix: |queries| x |batch| in one BLAS call
            cos = (mat @ c_mat.T) / (qn[:, None] * c_norm[None, :])
            out = []
            for qi in range(len(ids)):
                row = cos[qi]
                mask = c_ids != ids[qi]
                cand = np.where(mask)[0]
                if not len(cand):
                    continue
                top = cand[np.lexsort((c_ids[cand], -row[cand]))][:k]
                out.append(
                    pd.DataFrame(
                        {
                            "query_id": ids[qi],
                            "neighbor_id": c_ids[top],
                            "cos": row[top],
                        }
                    )
                )
            if out:
                yield pd.concat(out)

    partial = c.mapInPandas(score, "query_id long, neighbor_id long, cos double")
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        partial.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


# --------------------------------------------------- product quantization

def _make_quantized_matrix_fn(dim: int):
    """Arrow list<long> -> (batch x dim) float64 matrix for columns that
    are ALREADY quantized (``_prep``'s ``c_q``): reshape only, NO
    re-scaling — running :func:`_make_vec_matrix_fn` on a quantized
    column multiplies by QUANT a second time, which silently changes
    every centroid/codebook assignment (the bug the IVF-PQ recall probe
    caught: corpus lists from 1000x-scaled vectors, query probes from
    true-scale ones — planted pairs split across lists). Closure for
    cloudpickle, same null/ragged contract as the raw-vector kernel."""

    def mat(emb_array) -> "np.ndarray":
        if emb_array.null_count:
            raise ValueError(
                "null embedding vectors cannot be indexed - filter them "
                "out before building the index"
            )
        flat = emb_array.flatten()
        if len(flat) != len(emb_array) * dim:
            raise ValueError(
                f"ragged embedding column: expected uniform dim={dim}, "
                f"got {len(flat)} values for {len(emb_array)} rows"
            )
        return (
            flat.to_numpy(zero_copy_only=False)
            .reshape(len(emb_array), dim)
            .astype(np.float64)
        )

    return mat


def _make_pq_code_fn(codebooks: np.ndarray):
    """Factory for the PQ byte-code kernel: nearest-codebook ordinals
    per subspace plus the reconstructed squared norm, chunked through
    ONE caller-preallocated ``(chunk x n_codes)`` scratch reused across
    subspaces AND batches. The previous per-subspace
    ``bnorm - 2 * (sub @ books.T)`` allocated a fresh ``(batch x
    n_codes)`` temporary per subspace per batch (~160 MB/batch/worker at
    m=8, batch 10k) — the same first-touch page-fault traffic the coarse
    IVF assign kernel eliminated; porting the chunked-scratch pattern is
    what it exists for. Chunking cannot change any per-row result
    (every compared quantity is an exact-integer float64); ties break
    toward the smallest code ordinal (argmin-first), as before."""
    books = codebooks
    m, n_codes, dsub = books.shape
    bookT = [np.ascontiguousarray(books[s].T) for s in range(m)]
    bnorm = (books * books).sum(2)  # (m, n_codes)
    chunk_rows = _ASSIGN_CHUNK

    def encode(xs: np.ndarray, buf: np.ndarray):
        n = len(xs)
        codes = np.empty((n, m), dtype=np.int32)
        rn = np.zeros(n, dtype=np.float64)
        for i in range(0, n, chunk_rows):
            ch = xs[i : i + chunk_rows]
            s_ = buf[: len(ch)]
            for s in range(m):
                np.matmul(ch[:, s * dsub : (s + 1) * dsub], bookT[s], out=s_)
                s_ *= -2.0
                s_ += bnorm[s][None, :]
                idx = np.argmin(s_, axis=1)
                codes[i : i + chunk_rows, s] = idx
                rn[i : i + chunk_rows] += bnorm[s][idx]
        return codes, rn

    def scratch(n_rows: int) -> np.ndarray:
        return np.empty(
            (min(chunk_rows, max(n_rows, 1)), n_codes), dtype=np.float64
        )

    def to_list_array(codes: np.ndarray):
        """(n x m) int32 code matrix -> Arrow list<int32> column, built
        from flat values + arithmetic offsets — no per-row Python list
        (the ``pa.array(list(codes))`` path boxed every row into a numpy
        object and re-inferred its type). A closure like its siblings so
        cloudpickle ships it by value."""
        import pyarrow as pa

        n = len(codes)
        return pa.ListArray.from_arrays(
            pa.array(np.arange(0, (n + 1) * m, m, dtype=np.int32)),
            pa.array(codes.ravel()),
        )

    return encode, scratch, to_list_array


def pq_train(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    dim: int,
    m: int = 8,
    n_codes: int = 256,
    sample_mod: int = 4,
    max_sample: int = 200_000,
    max_iter: int = 10,
) -> np.ndarray:
    """Train product-quantization codebooks: the vector space splits
    into ``m`` subspaces of ``dim/m`` components; each learns
    ``n_codes`` centroids by a two-phase mini-batch Lloyd schedule
    (``max_iter`` passes over a deterministic quarter of the sample,
    then 3 full-sample refinement passes, early-stopping once
    assignments fix) over a deterministic hash-mod sample (id-ordered
    initialization — byte-identical retrains; assignment distances run
    float32, centroid updates stay float64). Returns a ``(m, n_codes,
    dim/m)`` float64 codebook array — a few hundred KB the driver holds
    and broadcasts.

    Sampling is LIMIT-capped at ``max_sample`` rows: training never
    pulls more than the cap to the driver regardless of corpus size
    (raise ``sample_mod`` for bigger corpora — ~100k training rows is
    the standard PQ recipe).

    Why PQ at 100 TB: an encoded vector is ``m`` bytes instead of
    ``4 * dim`` — 32x smaller at dim=64/m=8 — so the serving scan
    becomes memory-bandwidth-bound over codes, and a corpus that
    needed a cluster to hold float vectors fits a handful of machines.
    """
    if dim % m:
        raise ValueError(f"m={m} must divide dim={dim}")
    dsub = dim // m
    # Arrow collect: row-object collect() + per-row Python list boxing
    # was ~11 s of an ~18 s train at the 100k-row cap; the flat-buffer
    # reshape is the _make_vec_matrix_fn path and the id sort replays
    # the old stable row sort (ids are unique), so init order — and
    # therefore every codebook byte — is unchanged
    tbl = (
        _prep(corpus, id_col, vec_col, "c_")
        .filter(md5_hash64(F.col("c_id").cast("string")) % sample_mod == 0)
        .select("c_id", "c_q")
        .limit(int(max_sample))
        .toArrow()
    )
    n_rows = tbl.num_rows
    if n_rows < n_codes:
        raise ValueError(
            f"sample of {n_rows} rows cannot train {n_codes} codes; "
            f"lower sample_mod or n_codes"
        )
    q_col = tbl.column("c_q").combine_chunks()
    if q_col.null_count:
        raise ValueError(
            "null embedding vectors cannot be sampled for PQ training - "
            "filter them out first"
        )
    flat = q_col.flatten().to_numpy(zero_copy_only=False)
    if len(flat) != n_rows * dim:
        raise ValueError(
            f"ragged embedding column: expected uniform dim={dim}, "
            f"got {len(flat)} values for {n_rows} rows"
        )
    # a null ELEMENT inside a vector (top-level null_count is 0) comes out
    # of Arrow as NaN and would silently poison every codebook distance —
    # the old row-collect path raised on the same input, so keep it loud
    if flat.dtype.kind == "f" and np.isnan(flat).any():
        raise ValueError(
            "null elements inside embedding vectors cannot be sampled for "
            "PQ training - filter them out first"
        )
    ids = tbl.column("c_id").to_numpy()
    order = np.argsort(ids, kind="stable")
    x = flat.reshape(n_rows, dim).astype(np.float64)[order]  # exact ints
    books = np.empty((m, n_codes, dsub), dtype=np.float64)

    def train_subspace(s: int) -> None:
        sub = x[:, s * dsub : (s + 1) * dsub]
        # deterministic init: the first n_codes DISTINCT sub-vectors in
        # id order (duplicate-heavy samples would otherwise seed
        # coincident centroids that can never separate)
        _, first_idx = np.unique(sub, axis=0, return_index=True)
        first_idx.sort()
        if len(first_idx) < n_codes:
            raise ValueError(
                f"subspace {s} has only {len(first_idx)} distinct "
                f"sub-vectors; lower n_codes"
            )
        cent = sub[first_idx[:n_codes]].copy()
        # assignment runs in float32: the distance matmul is memory-
        # bandwidth-bound, so halving element width nearly halves the
        # dominant cost; centroid UPDATES stay float64 (bincount sums
        # over the float64 columns), so codebook values never
        # accumulate single-precision error. Deterministic: same
        # floats in, same argmin out, every retrain.
        sub32 = sub.astype(np.float32)
        chunk = 8 * _ASSIGN_CHUNK
        buf = np.empty((min(chunk, len(sub)), n_codes), dtype=np.float32)

        def lloyd(rows64, rows32, iters, cent):
            assign = np.empty(len(rows32), dtype=np.int64)
            prev = None
            for _ in range(int(iters)):
                cent32 = cent.astype(np.float32)
                cnorm = (cent32 * cent32).sum(1)
                cent_T = np.ascontiguousarray(cent32.T)
                for i in range(0, len(rows32), chunk):
                    ch = rows32[i : i + chunk]
                    s_ = buf[: len(ch)]
                    np.matmul(ch, cent_T, out=s_)
                    s_ *= np.float32(-2.0)
                    s_ += cnorm[None, :]
                    assign[i : i + chunk] = np.argmin(s_, axis=1)
                # converged assignments can only reproduce themselves:
                # stop paying for the remaining iterations
                if prev is not None and np.array_equal(assign, prev):
                    break
                prev = assign.copy()
                counts = np.bincount(assign, minlength=n_codes)
                sums = np.empty((n_codes, dsub), dtype=np.float64)
                for d in range(dsub):
                    sums[:, d] = np.bincount(
                        assign, weights=rows64[:, d], minlength=n_codes
                    )
                nz = counts > 0
                cent[nz] = sums[nz] / counts[nz, None]
                # empty cluster: keep the previous centroid (deterministic)
            return cent

        # two-phase mini-batch schedule (the k-means|| spirit without
        # the randomness): bulk convergence happens on a deterministic
        # quarter of the sample (every 4th row in id order — same rows
        # every retrain), then a short full-sample refinement polishes
        # the boundaries. Cost ~ iters/4 + refine full passes instead
        # of iters full passes; recall and determinism are probe-gated.
        if len(sub) >= 4 * n_codes * 4:
            coarse64 = np.ascontiguousarray(sub[::4])
            coarse32 = np.ascontiguousarray(sub32[::4])
            cent = lloyd(coarse64, coarse32, max_iter, cent)
            cent = lloyd(sub, sub32, 3, cent)
        else:
            cent = lloyd(sub, sub32, max_iter, cent)
        books[s] = cent

    # subspaces are fully independent (disjoint column slices, disjoint
    # output planes), and the hot ops (matmul/unique/bincount) release
    # the GIL — a thread per subspace uses the driver's idle cores with
    # byte-identical results to the sequential loop
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=min(m, 8)) as pool:
        list(pool.map(train_subspace, range(m)))
    return books


def pq_encode(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    codebooks: np.ndarray,
    *,
    dim: int,
) -> DataFrame:
    """Encode every vector as ``m`` codebook ordinals: ``(id, codes
    array<int>, recon_n double)`` where ``recon_n`` is the squared norm
    of the RECONSTRUCTED vector (the per-subspace centroid norms summed)
    — precomputed here so query-time cosine needs only lookup-table
    adds. One map-only Arrow pass; the codebook broadcasts by value."""
    m, n_codes, dsub = codebooks.shape
    if m * dsub != dim:
        raise ValueError(f"codebooks {codebooks.shape} do not cover dim={dim}")
    vec_matrix = _make_quantized_matrix_fn(dim)
    pq_codes, pq_scratch, codes_arr = _make_pq_code_fn(codebooks)

    def encode(batches):
        import pyarrow as pa

        # ONE reused scratch per worker (see _make_pq_code_fn)
        buf = pq_scratch(10_000)
        for batch in batches:
            tbl = pa.table(batch)
            xs = vec_matrix(tbl.column("__q").combine_chunks())
            codes, rn = pq_codes(xs, buf)
            yield pa.record_batch(
                {
                    "id": tbl.column("id").combine_chunks(),
                    "codes": codes_arr(codes),
                    "recon_n": pa.array(rn),
                }
            )

    src = _prep(corpus, id_col, vec_col, "c_").select(
        F.col("c_id").alias("id"), F.col("c_q").alias("__q")
    )
    return src.mapInArrow(
        encode, "id long, codes array<int>, recon_n double"
    )


def pq_topk(
    codes: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    codebooks: np.ndarray,
    *,
    k: int = 5,
    shortlist: int = 0,
    corpus: DataFrame = None,
) -> DataFrame:
    """ANN over PQ codes by asymmetric distance (ADC): each query builds
    an ``(m, n_codes)`` lookup table of exact partial dot products
    against the codebooks, and every corpus row scores as ``m`` table
    adds over its byte codes — the scan never touches a float vector.
    Ranking is approximate cosine: LUT dot / (|q| * sqrt(recon_n)).

    With ``shortlist > k`` and the original ``corpus`` frame, the ADC
    top-``shortlist`` per query is re-scored EXACTLY (integer cosine on
    the true vectors — only shortlist x |queries| vectors are read) and
    the final top-``k`` returned: the standard PQ serving pipeline,
    recovering brute-force recall at code-scan cost.

    Output: (query_id, neighbor_id, rank).
    """
    import pandas as pd

    m, n_codes, dsub = codebooks.shape
    spark = codes.sparkSession
    q_ids, q_mat, q_norm = _collect_queries(queries, id_col, vec_col)
    # (n_queries, m, n_codes) exact partial dots
    luts = np.stack(
        [
            q_mat[:, s * dsub : (s + 1) * dsub] @ codebooks[s].T
            for s in range(m)
        ],
        axis=1,
    )
    b_luts = spark.sparkContext.broadcast(luts)
    b_qids = spark.sparkContext.broadcast(q_ids)
    b_qn = spark.sparkContext.broadcast(q_norm)
    n_short = max(int(shortlist), int(k))

    def scan(batches):
        luts_, qids, qn = b_luts.value, b_qids.value, b_qn.value
        for pdf in batches:
            c_ids = pdf["id"].to_numpy(dtype=np.int64)
            cmat = np.array(list(pdf["codes"]), dtype=np.int64)  # (n, m)
            rn = np.sqrt(np.maximum(pdf["recon_n"].to_numpy(), 1e-12))
            out = []
            for qi in range(len(qids)):
                lut = luts_[qi]  # (m, n_codes)
                dots = lut[np.arange(m)[:, None], cmat.T].sum(0)
                cos = dots / (qn[qi] * rn)
                mask = c_ids != qids[qi]
                cand = np.where(mask)[0]
                if not len(cand):
                    continue
                top = cand[np.lexsort((c_ids[cand], -cos[cand]))][:n_short]
                out.append(
                    pd.DataFrame(
                        {
                            "query_id": qids[qi],
                            "neighbor_id": c_ids[top],
                            "adc_cos": cos[top],
                        }
                    )
                )
            if out:
                yield pd.concat(out)

    partial = codes.mapInPandas(
        scan, "query_id long, neighbor_id long, adc_cos double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_cos").desc(), F.col("neighbor_id").asc()
    )
    short = (
        partial.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n_short)
        .drop("__rn")
    )
    if shortlist and corpus is not None:
        c = _prep(corpus, id_col, vec_col, "c_")
        q = _prep(queries, id_col, vec_col, "q_")
        exact = (
            short.join(c, short["neighbor_id"] == c["c_id"])
            .join(q, short["query_id"] == q["q_id"])
            .select(
                "query_id",
                "neighbor_id",
                cosine_from_int(
                    int_dot(F.col("c_q"), F.col("q_q")),
                    F.col("c_n"),
                    F.col("q_n"),
                ).alias("cos"),
            )
        )
        w2 = Window.partitionBy("query_id").orderBy(
            F.col("cos").desc(), F.col("neighbor_id").asc()
        )
        return (
            exact.withColumn("rank", F.row_number().over(w2).cast("long"))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank")
        )
    w3 = Window.partitionBy("query_id").orderBy(
        F.col("adc_cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        short.withColumn("rank", F.row_number().over(w3).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def ivf_pq_encode(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    codebooks: np.ndarray,
    *,
    dim: int,
    centroid_mod: int = 32,
    max_centroids: int = 65536,
) -> DataFrame:
    """The persistable IVF-PQ index: ``(id, cent_id, codes, recon_n)``
    — coarse list id + PQ byte codes + reconstructed norm, ONE Arrow
    pass over the corpus. Build once, write to parquet, and pass back
    to :func:`ivf_pq_topk` via ``codes=``: the encode is the dominant
    per-call cost and a pure function of (corpus, codebooks,
    centroid_mod), so it amortizes across every query batch exactly
    like the LSH/IVF persisted indexes."""
    m, n_codes, dsub = codebooks.shape
    c = _prep(corpus, id_col, vec_col, "c_")
    cent_mat, cent_n = _sample_centroids(c, centroid_mod, max_centroids)
    vec_matrix = _make_quantized_matrix_fn(dim)
    assign, scratch = _make_assign_fn(cent_mat, cent_n, 1)
    pq_codes, pq_scratch, codes_arr = _make_pq_code_fn(codebooks)

    def encode(batches):
        import pyarrow as pa

        # ONE reused scratch pair per worker — coarse assign + PQ codes
        # (fresh per-batch/per-subspace temporaries page-fault the cold
        # build; see _make_assign_fn / _make_pq_code_fn)
        cbuf = scratch(10_000)
        buf = pq_scratch(10_000)
        for batch in batches:
            tbl = pa.table(batch)
            xs = vec_matrix(tbl.column("__q").combine_chunks())
            cent_ids = assign(xs, cbuf)[:, 0]
            codes, rn = pq_codes(xs, buf)
            yield pa.record_batch(
                {
                    "id": tbl.column("id").combine_chunks(),
                    "cent_id": pa.array(cent_ids),
                    "codes": codes_arr(codes),
                    "recon_n": pa.array(rn),
                }
            )

    return c.select(
        F.col("c_id").alias("id"), F.col("c_q").alias("__q")
    ).mapInArrow(encode, "id long, cent_id long, codes array<int>, recon_n double")


def ivf_pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    codebooks: np.ndarray,
    *,
    dim: int,
    k: int = 5,
    centroid_mod: int = 32,
    n_probe: int = 4,
    max_centroids: int = 65536,
    shortlist: int = 64,
    codes: DataFrame = None,
) -> DataFrame:
    """IVF-PQ — the production ANN layout (FAISS's default at scale):
    the corpus partitions into inverted lists by nearest coarse
    centroid AND stores only PQ byte codes; a query (a) picks its
    ``n_probe`` nearest lists, (b) ADC-scans ONLY those lists' codes
    (lookup-table adds over ``|corpus| * n_probe / n_lists`` rows — the
    scan fraction and the bytes-per-row shrink multiply), and (c) the
    exact integer-cosine rerank of the ``shortlist`` reads true vectors
    for just shortlist x |queries| rows.

    Coarse centroids are the same deterministic hash-mod sample as
    :func:`ivf_topk`; codebooks come from :func:`pq_train`. The probed
    list-id sets ride into the scan kernel per query, so a code row is
    scored only for queries probing its list — no per-query filter
    jobs, one pass over the (already pruned) union of probed lists.
    """
    import pandas as pd

    m, n_codes, dsub = codebooks.shape
    spark = corpus.sparkSession
    c = _prep(corpus, id_col, vec_col, "c_")
    cent_mat, cent_n = _sample_centroids(c, centroid_mod, max_centroids)

    # ``codes``: a persisted :func:`ivf_pq_encode` frame (same codebooks
    # + centroid_mod) — build once, query many: the encode pass is the
    # dominant per-call cost and a pure function of the corpus.
    if codes is not None:
        codes_df = codes
    else:
        codes_df = ivf_pq_encode(
            corpus,
            id_col,
            vec_col,
            codebooks,
            dim=dim,
            centroid_mod=centroid_mod,
            max_centroids=max_centroids,
        )
    books = codebooks

    # query side: driver-held LUTs + probed list sets
    q_ids, q_mat, q_norm = _collect_queries(queries, id_col, vec_col)
    qassign, qscratch = _make_assign_fn(
        cent_mat, cent_n, min(n_probe, len(cent_n))
    )
    probed = qassign(q_mat, qscratch(len(q_mat)))  # (n_queries, n_probe)
    luts = np.stack(
        [q_mat[:, s * dsub : (s + 1) * dsub] @ books[s].T for s in range(m)],
        axis=1,
    )
    b = spark.sparkContext.broadcast((q_ids, q_norm, probed, luts))
    # prune the scan to the UNION of probed lists before it even runs
    all_probed = sorted({int(x) for x in probed.ravel()})
    pruned = codes_df.filter(F.col("cent_id").isin(all_probed))
    n_short = max(int(shortlist), int(k))

    def scan(batches):
        qids, qn, probed_, luts_ = b.value
        for pdf in batches:
            c_ids = pdf["id"].to_numpy(dtype=np.int64)
            cents = pdf["cent_id"].to_numpy(dtype=np.int64)
            cmat = np.array(list(pdf["codes"]), dtype=np.int64)
            rn = np.sqrt(np.maximum(pdf["recon_n"].to_numpy(), 1e-12))
            out = []
            for qi in range(len(qids)):
                in_list = np.isin(cents, probed_[qi])
                in_list &= c_ids != qids[qi]
                cand = np.where(in_list)[0]
                if not len(cand):
                    continue
                lut = luts_[qi]
                dots = lut[np.arange(m)[:, None], cmat[cand].T].sum(0)
                cos = dots / (qn[qi] * rn[cand])
                top = np.lexsort((c_ids[cand], -cos))[:n_short]
                out.append(
                    pd.DataFrame(
                        {
                            "query_id": qids[qi],
                            "neighbor_id": c_ids[cand[top]],
                            "adc_cos": cos[top],
                        }
                    )
                )
            if out:
                yield pd.concat(out)

    partial = pruned.mapInPandas(
        scan, "query_id long, neighbor_id long, adc_cos double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_cos").desc(), F.col("neighbor_id").asc()
    )
    short = (
        partial.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n_short)
        .drop("__rn", "adc_cos")
    )
    q = _prep(queries, id_col, vec_col, "q_")
    exact = (
        short.join(c, short["neighbor_id"] == c["c_id"])
        .join(F.broadcast(q), short["query_id"] == q["q_id"])
        .select(
            "query_id",
            "neighbor_id",
            cosine_from_int(
                int_dot(F.col("c_q"), F.col("q_q")), F.col("c_n"), F.col("q_n")
            ).alias("cos"),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        exact.withColumn("rank", F.row_number().over(w2).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def hard_negatives(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    dup_pairs: DataFrame,
    k: int = 5,
    candidate_k: int = 20,
) -> DataFrame:
    """Hard-negative mining for retrieval/embedding training: per query,
    the nearest corpus vectors that are NOT known duplicates of it —
    the "close but wrong" examples contrastive training needs (a
    near-dup used as a negative teaches the model to split identical
    content; this is the standard guard against that).

    ``dup_pairs`` is any (id_1, id_2) pair frame — MinHash/SimHash/
    embedding near-dup output or resolved clusters — treated as
    undirected. Candidates come from :func:`brute_force_topk` at
    ``candidate_k`` depth (swap in the IVF/LSH variants at scale — any
    (query_id, neighbor_id, rank) frame works via ``candidates=``-style
    composition); known duplicates are removed by an anti-join on both
    orientations, and the survivors re-rank densely to
    ``(query_id, neighbor_id, rank)`` with rank 1..k.

    Scale shape: the expensive step is the ANN retrieval the caller
    already chose; the exclusion is an anti-join of a top-k-sized frame
    against the pair frame on (query, neighbor) — drift-sized, never
    corpus-sized. A query whose candidate list is exhausted by
    duplicates yields fewer than k rows (deepen ``candidate_k``).
    """
    cand = brute_force_topk(corpus, queries, id_col, vec_col, k=candidate_k)
    p = dup_pairs.select("id_1", "id_2")
    both = p.unionByName(
        p.select(F.col("id_2").alias("id_1"), F.col("id_1").alias("id_2"))
    )
    kept = cand.join(
        both,
        (cand["query_id"] == both["id_1"]) & (cand["neighbor_id"] == both["id_2"]),
        "left_anti",
    )
    w = Window.partitionBy("query_id").orderBy(F.col("rank").asc())
    return (
        kept.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )
