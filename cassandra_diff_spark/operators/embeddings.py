"""Embedding-distribution profiling: centroids and drift — the
monitoring layer over an embedding corpus (did this source's vectors
move after the encoder update? is the new crawl's distribution the
old one's?).

Exact-arithmetic discipline (the same rule as the ANN family): vectors
quantize to integer milli-units, so per-dimension SUMS are exact
BIGINTs — order-independent, map-side-combinable, and bit-identical in
any engine; each mean is then ONE double division of exact integers.

Scale shape: :func:`embedding_centroids` is a single aggregation scan
with ``dim`` fused integer-sum expressions over the quantized array —
the token is never exploded into ``n * dim`` shuffle rows (the naive
``posexplode -> groupBy(group, dim)`` shape multiplies the shuffle by
the dimension; at 100 TB that is the whole job). The output is
``|groups| * dim`` rows — kilobytes — and every downstream comparison
(:func:`centroid_shift`) runs on that.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cassandra_diff_spark.functions.vectors import QUANT, quantize


def embedding_centroids(
    df: DataFrame,
    vec_col: str,
    *,
    dim: int,
    by: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Per-group centroid in long form: ``(*by, dim, sum_q, n, mean)``
    where ``sum_q`` is the EXACT integer milli-unit component sum,
    ``n`` the vector count, and ``mean = sum_q / (n * 1000)`` — one
    deterministic double division per component.

    One scan, one map-side-combined shuffle of ``dim`` fused sums; the
    quantized array materializes once per row. Null vectors are
    excluded; rows whose vector is shorter than ``dim`` would sum nulls
    and are rejected loudly instead (``element_at`` past the end).
    """
    by = list(by) if by else []
    sel = df.filter(F.col(vec_col).isNotNull()).filter(
        F.size(F.col(vec_col)) >= int(dim)
    )
    q = sel.select(*by, quantize(F.col(vec_col)).alias("__q"))
    aggs = [F.count(F.lit(1)).alias("n")] + [
        F.sum(F.element_at(F.col("__q"), d + 1)).alias(f"__s{d}")
        for d in range(int(dim))
    ]
    g = q.groupBy(*by).agg(*aggs)
    return g.select(
        *by,
        "n",
        F.posexplode(F.array(*[F.col(f"__s{d}") for d in range(int(dim))]))
        .alias("dim", "sum_q"),
    ).select(
        *by,
        "dim",
        F.col("sum_q").cast("long").alias("sum_q"),
        F.col("n").cast("long").alias("n"),
        (
            F.col("sum_q").cast("double")
            / (F.col("n").cast("double") * F.lit(float(QUANT)))
        ).alias("mean"),
    )


def centroid_shift(
    cur: DataFrame,
    ref: DataFrame,
    *,
    by: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Per-group drift between two centroid frames (both in
    :func:`embedding_centroids` long form): ``(*by, cos_sim, l2_shift,
    n_cur, n_ref)``.

    * ``cos_sim``: cosine between the two MEAN vectors (computed from
      the exact integer sums — scale-invariant, so sums stand in for
      means with no extra rounding until the final doubles);
    * ``l2_shift``: euclidean distance between the mean vectors.

    Runs entirely on the kilobyte centroid frames — no data rescans:
    compare tonight's drop against a persisted reference centroid table
    to alert on encoder or distribution drift.
    """
    by = list(by) if by else []
    a = cur.select(*by, "dim", F.col("mean").alias("__ma"),
                   F.col("n").alias("n_cur"))
    b = ref.select(*by, "dim", F.col("mean").alias("__mb"),
                   F.col("n").alias("n_ref"))
    j = a.join(b, by + ["dim"])
    return j.groupBy(*by).agg(
        (
            F.sum(F.col("__ma") * F.col("__mb"))
            / F.sqrt(
                F.sum(F.col("__ma") * F.col("__ma"))
                * F.sum(F.col("__mb") * F.col("__mb"))
            )
        ).alias("cos_sim"),
        F.sqrt(
            F.sum(
                (F.col("__ma") - F.col("__mb"))
                * (F.col("__ma") - F.col("__mb"))
            )
        ).alias("l2_shift"),
        F.max("n_cur").alias("n_cur"),
        F.max("n_ref").alias("n_ref"),
    )


def fold_centroids(
    a: DataFrame,
    b: DataFrame,
    *,
    by: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Fold two centroid frames (long form) into one — incremental
    centroid maintenance: integer component sums and counts are
    ADDITIVE, so folding a new batch's centroids into the persisted
    table equals rebuilding over the union exactly, without re-reading
    history. Output schema == :func:`embedding_centroids`."""
    by = list(by) if by else []
    cols = by + ["dim", "sum_q", "n"]
    u = a.select(*cols).unionByName(b.select(*cols))
    from cassandra_diff_spark.functions.vectors import QUANT

    return (
        u.groupBy(*by, "dim")
        .agg(F.sum("sum_q").alias("sum_q"), F.sum("n").alias("n"))
        .select(
            *by,
            "dim",
            F.col("sum_q").cast("long").alias("sum_q"),
            F.col("n").cast("long").alias("n"),
            (
                F.col("sum_q").cast("double")
                / (F.col("n").cast("double") * F.lit(float(QUANT)))
            ).alias("mean"),
        )
    )


def _gram_moments(df: DataFrame, vec_col: str, *, dim: int) -> DataFrame:
    """Integer moment frame of a quantized embedding corpus, encoded as
    ``(i, j, s)`` rows: ``i <= j`` carries ``S_ij = sum(q_i * q_j)``,
    ``(i, -1)`` carries the component sum ``S_i``, and ``(-1, -1)``
    carries the row count ``n``.  All sums are exact int64 in milli-unit
    scale, so they are additive across shards and bit-stable.

    Scale shape: a per-partition **Gramian kernel** — a fused
    ``mapInArrow`` numpy pass (flat Arrow buffers in, no per-row object
    conversion — the same zero-copy discipline as the ANN index
    builds); each partition emits ONE ``d x d`` integer partial, so the
    shuffle carries ``partitions x (d(d+1)/2 + d + 1)`` rows, never
    ``n x d^2``. Quantization inside the kernel is bit-exact with the
    Catalyst ``round(x*1000)`` path (HALF_UP fixup — see
    ``similarity._make_vec_matrix_fn``). The per-batch ``M^T M`` runs
    through BLAS float64 when exactness is provable
    (``max|q|^2 x batch_rows < 2^53``: every product and partial sum
    representable), else falls back to exact int64 matmul.
    """
    from cassandra_diff_spark.operators.similarity import _make_vec_matrix_fn

    d = int(dim)
    sel = df.filter(F.col(vec_col).isNotNull()).filter(
        F.size(F.col(vec_col)) >= d
    )
    v = sel.select(F.slice(F.col(vec_col), 1, d).alias("__v"))
    vec_matrix = _make_vec_matrix_fn(d)

    def gram(it):
        import numpy as np
        import pyarrow as pa

        gm = np.zeros((d, d), dtype=np.int64)
        sv = np.zeros(d, dtype=np.int64)
        n = 0
        for batch in it:
            if not batch.num_rows:
                continue
            q = vec_matrix(batch.column("__v"))
            mx = int(np.abs(q).max()) if q.size else 0
            if mx * mx * q.shape[0] < (1 << 53):
                f = q.astype(np.float64)
                gm += (f.T @ f).astype(np.int64)
            else:  # magnitudes too large for provably-exact BLAS
                gm += q.T @ q
            sv += q.sum(axis=0)
            n += q.shape[0]
        if not n:
            return
        ii, jj = np.triu_indices(d)
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(
                    np.concatenate([ii, np.arange(d), [-1]]).astype(np.int32)
                ),
                pa.array(
                    np.concatenate([jj, np.full(d, -1), [-1]]).astype(np.int32)
                ),
                pa.array(np.concatenate([gm[ii, jj], sv, [n]])),
            ],
            ["i", "j", "s"],
        )

    parts = v.mapInArrow(gram, "i int, j int, s long")
    return parts.groupBy("i", "j").agg(F.sum("s").alias("s"))


def embedding_covariance(
    df: DataFrame,
    vec_col: str,
    *,
    dim: int,
    dims: Optional[Sequence[int]] = None,
) -> DataFrame:
    """Exact covariance moments of an embedding corpus — the input PCA,
    whitening, and drift-shape monitoring all start from.

    Population covariance over the quantized vectors, upper triangle only:
    ``(i, j, n, m2_q, cov)`` with ``m2_q = n*S_ij - S_i*S_j`` (an EXACT
    integer in milli-unit^2 scale) and ``cov = m2_q / (n^2 * QUANT^2)`` —
    one double division of exact integers per output cell.

    Scale shape: a per-partition **Gramian kernel** — each ``mapInPandas``
    partition emits its ``d x d`` integer partial (one ``M^T M`` matmul
    per Arrow batch), so the shuffle carries ``partitions x d^2`` rows,
    never ``n x d^2``; the final assembly runs on the kilobyte-scale
    moment frame with broadcast self-joins.  ``dims`` restricts output to
    a sub-block without changing the plan shape.

    Overflow envelope: |q| <= QUANT * max|x|; ``n * S_ij`` stays inside
    int64 for n up to ~1e9 rows of unit-norm vectors — beyond that,
    shard the corpus and fold the per-shard moment frames (they are
    additive in ``S_i``/``S_ij``/``n``).
    """
    moments = _gram_moments(df, vec_col, dim=dim)
    return covariance_from_moments(moments, dims=(dims if dims is not None else range(dim)))


def gram_moments(df: DataFrame, vec_col: str, *, dim: int) -> DataFrame:
    """Public handle on the integer moment frame (``(i, j, s)`` encoded
    triangle + component sums + count) so callers can PERSIST it per
    shard/epoch and fold increments instead of rescanning the corpus:
    :func:`fold_gram_moments` + :func:`covariance_from_moments` rebuild
    the exact covariance from folded frames bit-for-bit."""
    return _gram_moments(df, vec_col, dim=dim)


def fold_gram_moments(frames: Sequence[DataFrame]) -> DataFrame:
    """Fold per-shard moment frames into the corpus moment frame — the
    incremental path :func:`embedding_covariance`'s overflow envelope
    points at ("shard the corpus and fold"): the moments are ADDITIVE
    exact integers (``n``, ``S_i``, ``S_ij`` all sum), so
    fold == rebuild, provably, with no float drift. Union + one
    aggregation over kilobyte-scale frames."""
    if not frames:
        raise ValueError("fold_gram_moments needs at least one moment frame")
    u = frames[0]
    for f in frames[1:]:
        u = u.unionByName(f)
    return u.groupBy("i", "j").agg(F.sum("s").alias("s"))


def covariance_from_moments(
    moments: DataFrame,
    *,
    dims: Optional[Sequence[int]] = None,
) -> DataFrame:
    """Assemble ``(i, j, n, m2_q, cov)`` from a (possibly folded) moment
    frame — the kilobyte-scale final step of :func:`embedding_covariance`,
    split out so persisted/folded moments skip the corpus scan."""
    dims = None if dims is None else sorted(set(int(d) for d in dims))
    from cassandra_diff_spark.operators import tracked_cache

    # the moment frame is consumed FOUR times below (triangle, both
    # broadcast marginal joins, count row); uncached, each consumer
    # replans the full gram pipeline — scan + MapInArrow + aggregation
    # over the corpus, per shard (8 printed scans in the fold gate's
    # plan). The frame is kilobytes (dim^2 rows), so materializing it
    # once is the textbook §2.4 cache: one corpus pass, four cache reads.
    moments = tracked_cache(moments)
    s_ij = moments.filter((F.col("i") >= 0) & (F.col("j") >= 0))
    s_i = moments.filter((F.col("i") >= 0) & (F.col("j") == -1)).select(
        F.col("i").alias("__d"), F.col("s").alias("__sd")
    )
    n_row = moments.filter(F.col("i") == -1).select(F.col("s").alias("__n"))
    keep = (
        s_ij
        if dims is None
        else s_ij.filter(F.col("i").isin(dims) & F.col("j").isin(dims))
    )
    out = (
        keep.join(F.broadcast(s_i), keep["i"] == s_i["__d"])
        .select("i", "j", "s", F.col("__sd").alias("__si"))
        .join(F.broadcast(s_i), F.col("j") == s_i["__d"])
        .select("i", "j", "s", "__si", F.col("__sd").alias("__sj"))
        .crossJoin(F.broadcast(n_row))
        .withColumn("m2_q", F.col("__n") * F.col("s") - F.col("__si") * F.col("__sj"))
    )
    denom = float(QUANT * QUANT)
    return out.select(
        F.col("i").cast("long").alias("i"),
        F.col("j").cast("long").alias("j"),
        F.col("__n").cast("long").alias("n"),
        F.col("m2_q").cast("long").alias("m2_q"),
        (
            F.col("m2_q").cast("double")
            / (F.col("__n").cast("double") * F.col("__n").cast("double") * denom)
        ).alias("cov"),
    )


def pca_project(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    dim: int,
    n_components: int,
) -> DataFrame:
    """Project embeddings onto their top principal components.

    The moment assembly is :func:`_gram_moments` (distributed, exact,
    ONE pass over the corpus); the eigendecomposition runs driver-side
    on the ``d x d`` moment matrix (kilobytes — the ONLY thing
    collected: ``d(d+1)/2 + d + 1`` rows), and the projection is a
    map-only Arrow kernel against the broadcast component matrix — no
    shuffle anywhere in the projection stage.  Centering reuses the
    exact integer component sums from the same moment frame
    (``mu_i = S_i / (n * QUANT)``), so the corpus is scanned exactly
    twice total: once for moments, once for the projection itself.
    Sign convention: each component's largest-|coefficient| entry is
    made positive, so output is deterministic.

    Output: ``(id, proj array<double>)`` — centered, unscaled scores.
    """
    import numpy as np

    d = int(dim)
    rows = _gram_moments(df, vec_col, dim=d).collect()
    s_ij = np.zeros((d, d), dtype=np.int64)
    s_i = np.zeros(d, dtype=np.int64)
    n = 0
    for r in rows:
        if r["i"] < 0:
            n = int(r["s"])
        elif r["j"] < 0:
            s_i[r["i"]] = r["s"]
        else:
            s_ij[r["i"], r["j"]] = s_ij[r["j"], r["i"]] = r["s"]
    if n == 0:
        raise ValueError(f"pca_project: no rows with a non-null {vec_col} of length >= {dim}")
    nf = float(n)
    cov = (nf * s_ij.astype(np.float64) - np.outer(s_i, s_i).astype(np.float64)) / (
        nf * nf * float(QUANT) * float(QUANT)
    )
    mu = s_i.astype(np.float64) / (nf * float(QUANT))
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][: int(n_components)]
    comp = vecs[:, order]  # d x k
    for c in range(comp.shape[1]):
        if comp[np.argmax(np.abs(comp[:, c])), c] < 0:
            comp[:, c] = -comp[:, c]
    comp_b = comp.copy()

    from cassandra_diff_spark.operators.similarity import _make_vec_matrix_fn

    sel = df.filter(F.col(vec_col).isNotNull()).filter(
        F.size(F.col(vec_col)) >= d
    )
    q = sel.select(F.col(id_col), F.slice(F.col(vec_col), 1, d).alias("__v"))
    id_type = sel.schema[id_col].dataType.simpleString()
    vec_matrix = _make_vec_matrix_fn(d)
    n_comp = comp_b.shape[1]
    quant = float(QUANT)

    def project(it):
        import pyarrow as pa

        for batch in it:
            if not batch.num_rows:
                continue
            m = vec_matrix(batch.column("__v")).astype(np.float64) / quant
            proj = (m - mu) @ comp_b
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column(id_col),
                    pa.FixedSizeListArray.from_arrays(
                        pa.array(proj.reshape(-1), type=pa.float64()), n_comp
                    ).cast(pa.list_(pa.float64())),
                ],
                [id_col, "proj"],
            )

    return q.mapInArrow(project, f"{id_col} {id_type}, proj array<double>")


def random_project(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    dim: int,
    out_dim: int,
    seed: int = 0,
) -> DataFrame:
    """Johnson-Lindenstrauss random projection: reduce ``dim``-d
    embeddings to ``out_dim`` components with a data-independent ±1
    matrix (Achlioptas 2003) — the no-training-pass complement to
    :func:`pca_project` (no moment pass, no eigh, nothing to fit or
    drift: tonight's batch and last month's project identically).

    Exactness contract: the sign matrix derives from the cross-engine
    md5 hash (``sign(i,j) = +1 iff md5_hash64(f"{i}:{j}:{seed}") % 2 ==
    0``) and inputs are milli-unit quantized, so every output component
    is an EXACT int64 ``sum_i sign(i,j) * q_i`` — order-free and
    bit-identical in any engine (the SQL oracle rebuilds the same sign
    table from SQL ``md5``).

    Scale shape: the matrix is ``out_dim x dim`` driver-built kilobytes
    shipped by closure; the projection is ONE zero-copy ``mapInArrow``
    matmul per batch — map-only, no shuffle anywhere. Unit scale: an
    input in units of x has outputs in milli-units of x (divide by
    1000; keep the integers for downstream exact ops).
    """
    import hashlib

    import numpy as np

    from cassandra_diff_spark.operators.similarity import _make_vec_matrix_fn

    d, od = int(dim), int(out_dim)
    if od <= 0 or d <= 0:
        raise ValueError(f"need dim > 0 and out_dim > 0, got {dim}, {out_dim}")
    signs = np.empty((od, d), dtype=np.int64)
    for j in range(od):
        for i in range(d):
            h = int(
                hashlib.md5(f"{i}:{j}:{seed}".encode()).hexdigest()[:15], 16
            )
            signs[j, i] = 1 if h % 2 == 0 else -1

    sel = df.filter(F.col(vec_col).isNotNull()).filter(
        F.size(F.col(vec_col)) >= d
    )
    q = sel.select(F.col(id_col), F.slice(F.col(vec_col), 1, d).alias("__v"))
    id_type = sel.schema[id_col].dataType.simpleString()
    vec_matrix = _make_vec_matrix_fn(d)

    def project(it):
        import pyarrow as pa

        for batch in it:
            if not batch.num_rows:
                continue
            m = vec_matrix(batch.column("__v"))
            mx = int(np.abs(m).max()) if m.size else 0
            if mx * d < (1 << 52):  # |partial sum| < 2^53: BLAS is exact
                y = (m.astype(np.float64) @ signs.T.astype(np.float64)).astype(
                    np.int64
                )
            else:
                y = m @ signs.T
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column(id_col),
                    pa.FixedSizeListArray.from_arrays(
                        pa.array(y.reshape(-1), type=pa.int64()), od
                    ).cast(pa.list_(pa.int64())),
                ],
                [id_col, "proj_q"],
            )

    return q.mapInArrow(project, f"{id_col} {id_type}, proj_q array<long>")


def mahalanobis_scores(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    dim: int,
    ridge: float = 1e-6,
) -> DataFrame:
    """Multivariate outlier scores: squared Mahalanobis distance
    ``(x - mu)^T Sigma^-1 (x - mu)`` of every embedding from the corpus
    distribution — the principled "this vector is off-manifold" signal
    (per-component z-scores miss correlated excursions; chi-square_dim
    quantiles give the cut line).

    Same skeleton as :func:`pca_project`: ONE distributed exact moment
    pass (:func:`_gram_moments`), a ``d x d`` driver-side solve on the
    collected kilobyte frame (``ridge`` regularizes a singular
    covariance), then a MAP-ONLY zero-copy Arrow kernel — the whole-
    matrix quadratic form is one matmul per batch, no shuffle anywhere
    in the scoring stage. Like the eigensolver paths, matrix inversion
    has no ANSI-SQL twin: correctness is pytest-held against numpy
    (rows-only driver check).

    Output: ``(id, m2 double)`` — squared distance; NULL/short vectors
    are excluded like every operator in this family.
    """
    import numpy as np

    from cassandra_diff_spark.operators.similarity import _make_vec_matrix_fn

    d = int(dim)
    rows = _gram_moments(df, vec_col, dim=d).collect()
    s_ij = np.zeros((d, d), dtype=np.int64)
    s_i = np.zeros(d, dtype=np.int64)
    n = 0
    for r in rows:
        if r["i"] < 0:
            n = int(r["s"])
        elif r["j"] < 0:
            s_i[r["i"]] = r["s"]
        else:
            s_ij[r["i"], r["j"]] = s_ij[r["j"], r["i"]] = r["s"]
    if n == 0:
        raise ValueError(
            f"mahalanobis_scores: no rows with a non-null {vec_col} of "
            f"length >= {dim}"
        )
    nf = float(n)
    cov = (nf * s_ij.astype(np.float64) - np.outer(s_i, s_i).astype(np.float64)) / (
        nf * nf * float(QUANT) * float(QUANT)
    )
    prec = np.linalg.inv(cov + float(ridge) * np.eye(d))
    mu = s_i.astype(np.float64) / (nf * float(QUANT))

    sel = df.filter(F.col(vec_col).isNotNull()).filter(
        F.size(F.col(vec_col)) >= d
    )
    q = sel.select(F.col(id_col), F.slice(F.col(vec_col), 1, d).alias("__v"))
    id_type = sel.schema[id_col].dataType.simpleString()
    vec_matrix = _make_vec_matrix_fn(d)
    quant = float(QUANT)

    def score(it):
        import pyarrow as pa

        for batch in it:
            if not batch.num_rows:
                continue
            x = vec_matrix(batch.column("__v")).astype(np.float64) / quant - mu
            m2 = np.einsum("ij,jk,ik->i", x, prec, x)
            yield pa.RecordBatch.from_arrays(
                [batch.column(id_col), pa.array(m2, type=pa.float64())],
                [id_col, "m2"],
            )

    return q.mapInArrow(score, f"{id_col} {id_type}, m2 double")
