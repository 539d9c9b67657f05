"""Scalable order statistics: histogram-binned quantiles.

The exact nearest-rank quantiles in the gate (``events_value_quantiles``)
sort every row through a window — correct, and the right tool at
dimension scale, but a global sort of a 100 TB column is exactly the
plan a large corpus cannot afford. The histogram formulation bounds the
error explicitly instead: ONE map-side-combinable ``groupBy(bin)``
aggregation collapses the data to ``n_bins`` rows (per group), and every
quantile then reads off the cumulative histogram driver-free. The answer
is the lower edge of the bin containing the target rank — within one bin
width of the true quantile, by construction. Tighten by raising
``n_bins`` (the shuffle carries at most n_bins rows per group
regardless), or get the EXACT value from :func:`quantiles_refined` — a
second pass that rescans only the one bin per (group, p) that matters.

Deterministic and SQL-reproducible: fixed ``[lo, hi)`` equal-width bins,
rank = ``ceil(p * n)`` (the nearest-rank convention the exact gate also
uses), IEEE-identical edge arithmetic — the DuckDB oracle reproduces
every output bit.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _check_args(probs, lo, hi):
    if not probs:
        raise ValueError("empty probs")
    if not all(0.0 < p <= 1.0 for p in probs):
        raise ValueError(f"probs must be in (0, 1], got {list(probs)}")
    if hi <= lo:
        raise ValueError(f"need lo < hi, got [{lo}, {hi})")


def _bin_expr(value_col: str, lo: float, width: float, n_bins: int):
    v = F.col(value_col).cast("double")
    return F.least(
        F.greatest(
            F.floor((v - F.lit(float(lo))) / F.lit(width)), F.lit(0).cast("long")
        ),
        F.lit(int(n_bins) - 1).cast("long"),
    )


def histogram_counts(df, value_col, by, lo, width, n_bins):
    """(by..., __bin, __c): the per-group bin counts — ONE partial-
    aggregated shuffle, ≤ n_bins rows per group. Order-independent and
    map-side-combinable, so the same expression also runs as a COMPLETE-
    mode streaming aggregation (streaming/diff_stream.py)."""
    v = F.col(value_col).cast("double")
    return (
        df.filter(v.isNotNull())
        .groupBy(*by, _bin_expr(value_col, lo, width, n_bins).alias("__bin"))
        .agg(F.count(F.lit(1)).alias("__c"))
    )


def _with_cum(hist, by):
    """Add __cum/__n running totals to a (by..., __bin, __c) histogram —
    windows over the ≤ n_bins-row frame, kilobyte-scale work."""
    wcum = (
        Window.partitionBy(*by)
        .orderBy(F.col("__bin").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wall = Window.partitionBy(*by)
    return hist.withColumn("__cum", F.sum("__c").over(wcum)).withColumn(
        "__n", F.sum("__c").over(wall)
    )


def _cum_histogram(df, value_col, by, lo, width, n_bins):
    """(by..., __bin, __c, __cum, __n): the per-group cumulative
    histogram — one partial-aggregated shuffle, ≤ n_bins rows/group."""
    return _with_cum(histogram_counts(df, value_col, by, lo, width, n_bins), by)


def quantiles_from_histogram(hist, probs, *, by, lo, width):
    """Quantile extraction over an ALREADY-BUILT (by..., __bin, __c)
    histogram (same output contract as :func:`quantiles_histogram`) —
    the shared tail of the batch and drained-streaming paths."""
    h = _with_cum(hist, list(by))
    p_arr = F.array(*[F.lit(float(p)) for p in probs])
    exploded = h.select(
        *by, "__bin", "__cum", "__n", F.explode(p_arr).alias("p")
    ).filter(F.col("__cum") >= F.ceil(F.col("p") * F.col("__n")))
    return (
        exploded.groupBy(*by, "p")
        .agg(F.min("__bin").alias("__qbin"), F.max("__n").alias("n"))
        .select(
            *by,
            "p",
            (F.lit(float(lo)) + F.col("__qbin") * F.lit(width)).alias("q"),
            F.col("n").cast("long").alias("n"),
        )
    )


def fold_histograms(hists: Sequence[DataFrame], *, by: Sequence[str]) -> DataFrame:
    """Additive fold of ``(by..., __bin, __c)`` histograms — the
    incremental quantile path: persist tonight's
    :func:`histogram_counts` output (≤ n_bins rows per group,
    kilobytes), fold tomorrow's batch histogram in, and extract
    quantiles from the combined frame with
    :func:`quantiles_from_histogram`. Equals the one-shot rebuild
    EXACTLY — bin counts are order-free additive integers — and history
    is never re-binned or re-read (the same persisted-index contract as
    ``fold_centroids`` / ``fold_token_counts``).

    All histograms must share the binning (``lo``/``width``/``n_bins``)
    and the ``by`` grouping; the fold itself is one map-side-combinable
    groupBy over frames whose size is bins x groups, not data.
    """
    if not hists:
        raise ValueError("fold_histograms: need at least one histogram")
    cols = [*by, "__bin", "__c"]
    for h in hists:
        missing = [c for c in cols if c not in h.columns]
        if missing:
            raise ValueError(
                f"fold_histograms: histogram is missing columns {missing}"
            )
    folded = hists[0].select(*cols)
    for h in hists[1:]:
        folded = folded.unionByName(h.select(*cols))
    return folded.groupBy(*by, "__bin").agg(F.sum("__c").alias("__c"))


def quantiles_histogram(
    df: DataFrame,
    value_col: str,
    probs: Sequence[float],
    *,
    lo: float,
    hi: float,
    n_bins: int = 1024,
    by: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Binned quantiles of ``value_col`` at each probability in
    ``probs``, optionally per ``by`` group: output ``(*by, p, q, n)``
    where ``q`` is the lower edge of the bin holding rank
    ``ceil(p * n)`` (error ≤ one bin width ``(hi - lo) / n_bins``).

    Nulls are excluded; values outside ``[lo, hi)`` clamp into the edge
    bins (their quantiles then saturate at the range bounds — pass real
    data bounds, e.g. from :func:`~cassandra_diff_spark.operators.
    validate.profile_table`).

    Cost: one partial-aggregated shuffle of ≤ ``n_bins`` rows per group;
    everything after operates on the kilobyte-scale histogram.
    """
    _check_args(probs, lo, hi)
    by = list(by) if by else []
    width = (float(hi) - float(lo)) / int(n_bins)
    # one row per (group, prob): the FIRST bin whose cumulative count
    # reaches the target rank — a min over the n_bins-scale histogram
    return quantiles_from_histogram(
        histogram_counts(df, value_col, by, lo, width, n_bins),
        probs,
        by=by,
        lo=lo,
        width=width,
    )


def quantiles_refined(
    df: DataFrame,
    value_col: str,
    probs: Sequence[float],
    *,
    lo: float,
    hi: float,
    n_bins: int = 1024,
    by: Optional[Sequence[str]] = None,
) -> DataFrame:
    """EXACT nearest-rank quantiles at histogram-shuffle cost: the
    histogram pass locates, per (group, p), the one bin holding rank
    ``ceil(p * n)`` plus the in-bin residual rank; a second pass scans
    ONLY those bins' rows (a broadcast semi-join on (group, bin) — the
    target set is kilobytes) and picks the residual-rank-th smallest
    value within each. Output ``(*by, p, q, n)`` with ``q`` the exact
    value the full-sort window formulation would return — without ever
    sorting more than the selected bins (~n/n_bins rows per target).

    Equivalence: the rank-th smallest value overall IS the (rank -
    cum_before)-th smallest within its bin, because equal-width binning
    partitions the value axis (equal values share a bin, and clamped
    out-of-range values keep their true order inside the edge bins).
    """
    from cassandra_diff_spark.operators import tracked_cache

    _check_args(probs, lo, hi)
    by = list(by) if by else []
    width = (float(hi) - float(lo)) / int(n_bins)
    # n_bins-scale frame, referenced by the target selection AND the
    # residual-rank join: cache so the data-sized aggregation under it
    # runs once
    h = tracked_cache(_cum_histogram(df, value_col, by, lo, width, n_bins))
    p_arr = F.array(*[F.lit(float(p)) for p in probs])
    targets = (
        h.select(*by, "__bin", "__cum", "__n", F.explode(p_arr).alias("p"))
        .filter(F.col("__cum") >= F.ceil(F.col("p") * F.col("__n")))
        .groupBy(*by, "p")
        .agg(F.min("__bin").alias("__bin"), F.max("__n").alias("n"))
    )
    # residual rank within the chosen bin: rank - (cum before the bin)
    targets = targets.join(h.select(*by, "__bin", "__cum", "__c"), by + ["__bin"]).select(
        *by,
        "__bin",
        "p",
        "n",
        (F.ceil(F.col("p") * F.col("n")) - (F.col("__cum") - F.col("__c"))).alias("__r"),
    )

    v = F.col(value_col).cast("double")
    sel = targets.select(*by, "__bin").distinct()
    rows = (
        df.filter(v.isNotNull())
        .withColumn("__bin", _bin_expr(value_col, lo, width, n_bins))
        .join(F.broadcast(sel), on=by + ["__bin"], how="left_semi")
    )
    wv = Window.partitionBy(*by, "__bin").orderBy(v.asc())
    ranked = rows.withColumn("__rn", F.row_number().over(wv))
    return (
        ranked.join(F.broadcast(targets), on=by + ["__bin"])
        .filter(F.col("__rn") == F.col("__r"))
        .select(*by, "p", v.alias("q"), F.col("n").cast("long").alias("n"))
    )


def outlier_fences(
    df: DataFrame,
    value_col: str,
    *,
    lo: float,
    hi: float,
    n_bins: int = 1024,
    by: Optional[Sequence[str]] = None,
    k_num: int = 3,
    k_den: int = 2,
) -> DataFrame:
    """Tukey-fence outlier summary per group: ``(*by, n, q1, q3,
    fence_lo, fence_hi, n_low, n_high)`` with ``fence = q1/q3 -/+
    (k_num * IQR) / k_den`` (default 3/2 = the classic 1.5×IQR).

    Q1/Q3 are EXACT nearest-rank values from
    :func:`quantiles_refined` — histogram-shuffle cost, no global sort —
    and the fence arithmetic is the same two-double expression in the
    SQL oracle, so results hash-match cross-engine. The fence frame is
    |groups| rows, broadcast back onto the data for the flag counts:
    total cost = the two quantile passes + ONE more counting scan.

    The distribution-drift tripwire of a training pipeline: run per
    (source, day) and alert when ``n_low + n_high`` jumps.
    """
    from pyspark.sql import functions as F

    by = list(by) if by else []
    q = quantiles_refined(
        df, value_col, [0.25, 0.75], lo=lo, hi=hi, n_bins=n_bins, by=by
    )
    fences = (
        q.groupBy(*by)
        .agg(
            F.min(F.when(F.col("p") == 0.25, F.col("q"))).alias("q1"),
            F.min(F.when(F.col("p") == 0.75, F.col("q"))).alias("q3"),
        )
        .select(
            *by,
            "q1",
            "q3",
            (
                F.col("q1")
                - (F.lit(int(k_num)) * (F.col("q3") - F.col("q1")))
                / F.lit(int(k_den))
            ).alias("fence_lo"),
            (
                F.col("q3")
                + (F.lit(int(k_num)) * (F.col("q3") - F.col("q1")))
                / F.lit(int(k_den))
            ).alias("fence_hi"),
        )
    )
    v = F.col(value_col).cast("double")
    base = df.filter(v.isNotNull()).select(*by, v.alias("__v"))
    joined = (
        base.join(F.broadcast(fences), by)
        if by
        else base.crossJoin(F.broadcast(fences))
    )
    return joined.groupBy(*by).agg(
        F.count(F.lit(1)).alias("n"),
        F.min("q1").alias("q1"),
        F.min("q3").alias("q3"),
        F.min("fence_lo").alias("fence_lo"),
        F.min("fence_hi").alias("fence_hi"),
        F.sum((F.col("__v") < F.col("fence_lo")).cast("long")).alias("n_low"),
        F.sum((F.col("__v") > F.col("fence_hi")).cast("long")).alias("n_high"),
    )


def rolling_anomaly(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    order_cols: Sequence[str] = (),
    window: int = 20,
    z_int: int = 3,
    min_periods: int = 5,
    scale: int = 100,
) -> DataFrame:
    """Rolling z-score anomaly flags over an ordered per-key stream.

    For each row, compare ``value`` against the mean/stddev of the
    preceding ``window`` rows of the SAME key (the row itself excluded —
    no self-masking): flag when ``|x - mean| > z * stddev_samp``.

    Exactness contract: values are quantized to ``1/scale`` units and the
    test is evaluated as the equivalent INTEGER inequality

        (x*n - S)^2 * (n - 1)  >  z^2 * (Q*n - S^2) * n

    with ``S``/``Q`` the window sum / sum-of-squares — no float window
    aggregates anywhere, so results are bit-identical across engines,
    partitionings, and retries (a float formulation would inherit the
    engine's window-summation order).  A zero-variance window flags any
    deviation, matching the strict inequality.

    ``order_cols`` breaks timestamp ties (pass the event id); without a
    unique total order the window frame itself would be nondeterministic.

    Scale shape: one hash-partitioned window per key — state bounded by
    ``window``, never key history; no corpus-wide ordering.

    Output: flagged rows only — ``(key, ts, *order_cols, value_c, n_prev,
    mean_c1000)`` with ``mean_c1000 = floor(1000 * S / n)`` for context.
    """
    v = F.round(F.col(value_col) * scale).cast("long")
    w = (
        Window.partitionBy(key_col)
        .orderBy(ts_col, *order_cols)
        .rowsBetween(-window, -1)
    )
    x = F.col("__v")
    n = F.col("__n")
    s = F.col("__s")
    q = F.col("__q")
    lhs = (x * n - s) * (x * n - s) * (n - 1)
    rhs = F.lit(z_int * z_int) * (q * n - s * s) * n
    out = (
        df.withColumn("__v", v)
        .withColumn("__n", F.count("__v").over(w).cast("long"))
        .withColumn("__s", F.sum("__v").over(w))
        .withColumn("__q", F.sum(F.col("__v") * F.col("__v")).over(w))
        .filter((n >= F.lit(max(min_periods, 2))) & (lhs > rhs))
    )
    return out.select(
        key_col,
        ts_col,
        *order_cols,
        F.col("__v").alias("value_c"),
        n.alias("n_prev"),
        F.floor(F.lit(1000) * s / n).cast("long").alias("mean_c1000"),
    )


def top_k_by_group(
    df: DataFrame,
    by: Sequence[str],
    order_col: str,
    k: int,
    *,
    id_col: str,
    lo: float,
    hi: float,
    n_bins: int = 1024,
) -> DataFrame:
    """EXACT top-``k`` rows per group by ``order_col`` (descending, ties
    broken by ``id_col`` ascending) — without sorting any group.

    The naive formulation is one ``row_number`` window = a full sort of
    EVERY group; a single 10-TB group serializes into one task. This is
    the top-k analog of :func:`quantiles_refined`:

    1. per-group histogram of ``order_col`` (ONE map-side-combined
       shuffle, ≤ n_bins rows per group);
    2. per group, find the bin holding the k-th largest value (a
       descending cumulative sum over the kilobyte histogram) — every
       top-k row lies in that bin or above BY CONSTRUCTION, so unlike a
       sampled threshold this needs no certification/escalation: the
       candidate set is provably a superset for ANY ``lo``/``hi``
       (out-of-range values clamp into the edge bins and stay
       candidates);
    3. keep only candidate rows (broadcast threshold + the SAME bin
       expression as pass 1 — bit-identical boundary arithmetic, no
       float-edge mismatch) and window just those.

    Candidates per group ~ k + one bin's population; raise ``n_bins``
    when values concentrate. NULL ``order_col`` rows cannot rank and are
    excluded.
    """
    if k <= 0:
        raise ValueError(f"need k > 0, got {k}")
    _check_args([0.5], lo, hi)
    by = list(by)
    width = (float(hi) - float(lo)) / int(n_bins)
    hist = histogram_counts(df, order_col, by, lo, width, n_bins)
    wdesc = (
        Window.partitionBy(*by)
        .orderBy(F.col("__bin").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wall = Window.partitionBy(*by)
    cut = (
        hist.withColumn("__from_top", F.sum("__c").over(wdesc))
        .withColumn("__n", F.sum("__c").over(wall))
        .filter(F.col("__from_top") >= F.least(F.lit(int(k)), F.col("__n")))
        .groupBy(*by)
        .agg(F.max("__bin").alias("__bstar"))
    )
    cand = (
        df.filter(F.col(order_col).isNotNull())
        .join(F.broadcast(cut), by, "inner")
        .filter(_bin_expr(order_col, lo, width, n_bins) >= F.col("__bstar"))
    )
    w = Window.partitionBy(*by).orderBy(
        F.col(order_col).desc(), F.col(id_col).asc()
    )
    return (
        cand.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= int(k))
        .drop("__bstar", "__rn")
    )


def winsorize(
    df: DataFrame,
    value_col: str,
    p_lo: float,
    p_hi: float,
    *,
    lo: float,
    hi: float,
    n_bins: int = 1024,
    by: Optional[Sequence[str]] = None,
    out_col: Optional[str] = None,
) -> DataFrame:
    """Winsorization: clamp ``value_col`` into the EXACT per-group
    ``[p_lo, p_hi]`` nearest-rank quantile envelope — the standard
    outlier treatment before training on heavy-tailed numerics (cap,
    don't drop: the row's other columns stay usable).

    The cut values come from :func:`quantiles_refined` (exact, at
    histogram-shuffle cost — never a per-group sort); they broadcast
    back as one kilobyte row per group and the clamp itself is a
    map-only ``least/greatest``. Output: the input plus ``out_col``
    (default ``{value_col}_w``); NULL values stay NULL.
    """
    if not (0.0 < p_lo < p_hi <= 1.0):
        raise ValueError(f"need 0 < p_lo < p_hi <= 1, got {p_lo}, {p_hi}")
    by = list(by) if by else []
    out_col = out_col or f"{value_col}_w"
    q = quantiles_refined(
        df, value_col, [p_lo, p_hi], lo=lo, hi=hi, n_bins=n_bins, by=by
    )
    cuts = q.groupBy(*by).agg(
        F.max(F.when(F.col("p") == float(p_lo), F.col("q"))).alias("__qlo"),
        F.max(F.when(F.col("p") == float(p_hi), F.col("q"))).alias("__qhi"),
    )
    joined = (
        df.join(F.broadcast(cuts), by, "left")
        if by
        else df.crossJoin(F.broadcast(cuts))
    )
    clamped = F.when(
        F.col(value_col).isNull(), F.lit(None).cast("double")
    ).otherwise(
        F.least(
            F.greatest(F.col(value_col).cast("double"), F.col("__qlo")),
            F.col("__qhi"),
        )
    )
    return joined.withColumn(out_col, clamped).drop("__qlo", "__qhi")


def cdf_transform(
    df: DataFrame,
    value_col: str,
    *,
    lo: float,
    hi: float,
    n_bins: int = 1024,
    by: Optional[Sequence[str]] = None,
    out_col: Optional[str] = None,
) -> DataFrame:
    """Quantile (CDF) normalization: map each value to its per-group
    empirical CDF position ``cum(bin)/n`` — the rank-based feature
    scaling that makes heavy-tailed columns uniform-ish without
    learning any parameters.

    Resolution is one histogram bin (rows sharing a bin share a score;
    monotone in the value up to bin width — raise ``n_bins`` to
    tighten). The score is ONE double division of exact integers, so
    it is bit-stable across engines. Cost: the histogram shuffle plus a
    broadcast join of the ≤ bins x groups cumulative frame — the data
    itself never re-shuffles. NULL values score NULL.
    """
    _check_args([0.5], lo, hi)
    by = list(by) if by else []
    out_col = out_col or f"{value_col}_cdf"
    width = (float(hi) - float(lo)) / int(n_bins)
    ch = _cum_histogram(df, value_col, by, lo, width, n_bins).select(
        *by, "__bin", "__cum", "__n"
    )
    keyed = df.withColumn("__bin", _bin_expr(value_col, lo, width, n_bins))
    joined = keyed.join(F.broadcast(ch), [*by, "__bin"], "left")
    return joined.withColumn(
        out_col,
        F.when(
            F.col(value_col).isNull(), F.lit(None).cast("double")
        ).otherwise(F.col("__cum").cast("double") / F.col("__n").cast("double")),
    ).drop("__bin", "__cum", "__n")


def robust_scale(
    df: DataFrame,
    value_col: str,
    *,
    lo: float,
    hi: float,
    n_bins: int = 1024,
    by: Optional[Sequence[str]] = None,
    out_col: Optional[str] = None,
) -> DataFrame:
    """Median/IQR standardization: ``(x - p50) / (p75 - p25)`` with
    EXACT per-group nearest-rank quantiles — the outlier-insensitive
    alternative to mean/stddev z-scores (one corrupt mega-value moves a
    mean arbitrarily; it moves a median not at all).

    Quantiles come from :func:`quantiles_refined` (histogram cost, no
    per-group sort) and broadcast back as one row per group; the scale
    itself is map-only arithmetic. A zero-IQR group (over half the mass
    on one value) yields NULL scores — constant features carry no
    signal to standardize. NULL values stay NULL.
    """
    by = list(by) if by else []
    out_col = out_col or f"{value_col}_rs"
    q = quantiles_refined(
        df, value_col, [0.25, 0.5, 0.75], lo=lo, hi=hi, n_bins=n_bins, by=by
    )
    cuts = q.groupBy(*by).agg(
        F.max(F.when(F.col("p") == 0.25, F.col("q"))).alias("__q1"),
        F.max(F.when(F.col("p") == 0.5, F.col("q"))).alias("__q2"),
        F.max(F.when(F.col("p") == 0.75, F.col("q"))).alias("__q3"),
    )
    joined = (
        df.join(F.broadcast(cuts), by, "left")
        if by
        else df.crossJoin(F.broadcast(cuts))
    )
    scaled = F.when(
        F.col(value_col).isNull() | (F.col("__q3") == F.col("__q1")),
        F.lit(None).cast("double"),
    ).otherwise(
        (F.col(value_col).cast("double") - F.col("__q2"))
        / (F.col("__q3") - F.col("__q1"))
    )
    return joined.withColumn(out_col, scaled).drop("__q1", "__q2", "__q3")


def weighted_quantiles_histogram(
    df: DataFrame,
    value_col: str,
    weight_col: str,
    probs: Sequence[float],
    *,
    lo: float,
    hi: float,
    n_bins: int = 1024,
    by: Optional[Sequence[str]] = None,
    weight_scale: int = 1000,
) -> DataFrame:
    """WEIGHTED binned quantiles: the rank axis is cumulative WEIGHT
    (``rank = ceil(p * W)``, ``W`` the group's total weight), so the
    p=0.5 answer is the weighted median — the robust center of a corpus
    where rows count unequally (tokens per document, bytes per file,
    quantity per line item).

    Exactness: weights quantize to ``1/weight_scale`` units and the
    histogram carries exact integer weight sums — order-free,
    map-side-combinable (and streamable complete-mode, like the count
    histogram), bit-reproducible. Same ``≤ n_bins`` rows per group
    shuffle as :func:`quantiles_histogram`; ``q`` is the lower edge of
    the bin where cumulative weight reaches the target (error ≤ one bin
    width). Rows with NULL value/weight or weight <= 0 are excluded
    (a non-positive weight has no mass). Output ``(*by, p, q, n)`` with
    ``n`` the group's total INTEGER weight in 1/weight_scale units.
    """
    _check_args(probs, lo, hi)
    by = list(by) if by else []
    width = (float(hi) - float(lo)) / int(n_bins)
    w_q = F.round(F.col(weight_col).cast("double") * int(weight_scale)).cast(
        "long"
    )
    src = (
        df.filter(F.col(value_col).isNotNull())
        .filter(F.col(weight_col).isNotNull())
        .withColumn("__w", w_q)
        .filter(F.col("__w") > 0)
    )
    hist = src.groupBy(
        *by, _bin_expr(value_col, lo, width, n_bins).alias("__bin")
    ).agg(F.sum("__w").alias("__c"))
    return quantiles_from_histogram(hist, probs, by=by, lo=lo, width=width)


def weighted_quantiles_refined(
    df: DataFrame,
    value_col: str,
    weight_col: str,
    probs: Sequence[float],
    *,
    lo: float,
    hi: float,
    n_bins: int = 1024,
    by: Optional[Sequence[str]] = None,
    weight_scale: int = 1000,
) -> DataFrame:
    """EXACT weighted nearest-rank quantiles at histogram cost — the
    weighted twin of :func:`quantiles_refined`: pass 1's weighted
    cumulative histogram locates the bin where cumulative weight
    reaches ``ceil(p * W)`` plus the in-bin residual weight; pass 2
    rescans ONLY those bins (broadcast semi-join) and returns the first
    value, in value order, whose in-bin running weight crosses the
    residual — exactly what a full weight-ordered sort would return,
    without sorting more than the selected bins.

    All ranks and running sums are exact integers in ``1/weight_scale``
    units (the :func:`weighted_quantiles_histogram` contract); value
    ties are harmless (every row of a tied block crosses at the same
    reported value). Output ``(*by, p, q, n)`` with ``n`` the group's
    total integer weight.
    """
    from cassandra_diff_spark.operators import tracked_cache

    _check_args(probs, lo, hi)
    by = list(by) if by else []
    width = (float(hi) - float(lo)) / int(n_bins)
    w_expr = F.round(F.col(weight_col).cast("double") * int(weight_scale)).cast(
        "long"
    )
    src = (
        df.filter(F.col(value_col).isNotNull())
        .filter(F.col(weight_col).isNotNull())
        .withColumn("__w", w_expr)
        .filter(F.col("__w") > 0)
    )
    hist = src.groupBy(
        *by, _bin_expr(value_col, lo, width, n_bins).alias("__bin")
    ).agg(F.sum("__w").alias("__c"))
    h = tracked_cache(_with_cum(hist, by))
    p_arr = F.array(*[F.lit(float(p)) for p in probs])
    targets = (
        h.select(*by, "__bin", "__cum", "__n", F.explode(p_arr).alias("p"))
        .filter(F.col("__cum") >= F.ceil(F.col("p") * F.col("__n")))
        .groupBy(*by, "p")
        .agg(F.min("__bin").alias("__bin"), F.max("__n").alias("n"))
    )
    targets = targets.join(
        h.select(*by, "__bin", "__cum", "__c"), by + ["__bin"]
    ).select(
        *by,
        "__bin",
        "p",
        "n",
        (
            F.ceil(F.col("p") * F.col("n")) - (F.col("__cum") - F.col("__c"))
        ).alias("__r"),
    )

    v = F.col(value_col).cast("double")
    sel = targets.select(*by, "__bin").distinct()
    rows = src.withColumn(
        "__bin", _bin_expr(value_col, lo, width, n_bins)
    ).join(F.broadcast(sel), on=by + ["__bin"], how="left_semi")
    wv = (
        Window.partitionBy(*by, "__bin")
        .orderBy(v.asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    ranked = rows.withColumn("__cw", F.sum("__w").over(wv))
    return (
        ranked.join(F.broadcast(targets), on=by + ["__bin"])
        .filter(F.col("__cw") >= F.col("__r"))
        .groupBy(*by, "p")
        .agg(F.min(v).alias("q"), F.max(F.col("n")).cast("long").alias("n"))
    )


def column_entropy(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Shannon entropy of each categorical column, in integer
    MICRO-NATS — the profiling signal behind "is this column an id, an
    enum, or junk" triage and feature-selection cuts.

    One row per column: ``column, n_values, n_rows, entropy_micronat``
    where ``entropy_micronat = SUM_v ROUND((c_v/N) * ln(N/c_v) * 1e6)``
    over the column's value groups (NULL is a category). Per-VALUE terms
    are rounded to integers before the sum — the engine's micro-unit
    determinism trick (see operators/search.py BM25 weights): a float
    SUM's value depends on reduction order, an integer SUM's does not,
    so the result is bit-identical across engines and partitionings.

    Scale shape: each row fans out to len(cols) (column, value) pairs —
    ONE wide shuffle for the joint counts of every requested column,
    then a window + final aggregation over the kilobyte-per-column
    distinct-count frame. Values are compared as strings (cast once) so
    heterogeneous column types share the single pass. High-cardinality
    columns (ids) work — the counts frame approaches row count and the
    entropy approaches ln(N) — but a distinct-count profile
    (validate.profile) is the cheaper screen for those.
    """
    cols = list(cols)
    if not cols:
        raise ValueError("column_entropy needs at least one column")
    pairs = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col(c).cast("string").alias("value"),
                    )
                    for c in cols
                ]
            )
        ).alias("p")
    ).select("p.column", "p.value")
    counts = pairs.groupBy("column", "value").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("column")
    n = F.sum("cnt").over(w)
    c_d = F.col("cnt").cast("double")
    n_d = n.cast("double")
    term = F.round((c_d / n_d) * F.log(n_d / c_d) * F.lit(1e6)).cast("long")
    return (
        counts.select("column", "cnt", term.alias("__t"), n.alias("__n"))
        .groupBy("column")
        .agg(
            F.count(F.lit(1)).alias("n_values"),
            F.max("__n").alias("n_rows"),
            F.sum("__t").alias("entropy_micronat"),
        )
    )


def mutual_info(df: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """Mutual information between two categorical columns, in integer
    micro-nats: ``MI = SUM_{a,b} (c_ab/N) * ln(c_ab * N / (c_a * c_b))``
    with the same per-cell integer rounding as :func:`column_entropy`
    (deterministic across engines and reduction orders). The
    categorical complement to the numeric Pearson matrix
    (:func:`numeric_correlations` in validate/stats profiling): "does
    knowing region tell me the priority" — association strength for
    leakage checks and redundant-feature pruning. NULL is a category on
    both axes.

    One row: ``col_a, col_b, n_rows, n_cells, mi_micronat``.

    Scale shape: ONE wide shuffle for the joint (a, b) counts; the
    marginals come from windows OVER THE JOINT FRAME (≤ |A|·|B| rows —
    kilobytes for real categoricals), never a second scan of the data;
    then a global single-row aggregation.
    """
    joint = (
        df.select(
            F.col(col_a).cast("string").alias("__a"),
            F.col(col_b).cast("string").alias("__b"),
        )
        .groupBy("__a", "__b")
        .agg(F.count(F.lit(1)).alias("cab"))
    )
    ca = F.sum("cab").over(Window.partitionBy("__a"))
    cb = F.sum("cab").over(Window.partitionBy("__b"))
    # the global total joins back as a broadcast scalar — an
    # empty-partition window would funnel the joint frame to one task
    total = joint.agg(F.sum("cab").alias("n"))
    cells = joint.select(
        "cab",
        ca.alias("ca"),
        cb.alias("cb"),
    ).crossJoin(F.broadcast(total))
    cab_d = F.col("cab").cast("double")
    ca_d = F.col("ca").cast("double")
    cb_d = F.col("cb").cast("double")
    n_d = F.col("n").cast("double")
    term = F.round(
        (cab_d / n_d) * F.log((cab_d * n_d) / (ca_d * cb_d)) * F.lit(1e6)
    ).cast("long")
    return (
        cells.select(term.alias("__t"), "n")
        .agg(
            F.max("n").alias("n_rows"),
            F.count(F.lit(1)).alias("n_cells"),
            F.sum("__t").alias("mi_micronat"),
        )
        .select(
            F.lit(col_a).alias("col_a"),
            F.lit(col_b).alias("col_b"),
            "n_rows",
            "n_cells",
            "mi_micronat",
        )
    )


def ks_distance(
    df_a,
    df_b,
    value_col: str,
    *,
    lo: float,
    hi: float,
    n_bins: int = 1024,
):
    """Binned two-sample Kolmogorov-Smirnov distance — the numeric
    distribution-drift test ("did purchase amounts shift between
    snapshots / segments"), completing the drift kit next to
    js_divergence (token distributions) and profile_drift (column
    shapes). Resolution is a bin (raise ``n_bins`` to tighten), which
    also makes the statistic EXACT integers: at each bin edge the CDF
    gap is ``|cum_a * n_b - cum_b * n_a|`` and

        ``ks_micro = (1_000_000 * max_gap) div (n_a * n_b)``

    — no float ever, engine-identical (n_a * n_b must stay < 2^63, the
    kappa caveat). NULL values are excluded (no position on the axis).

    One row: ``(n_a, n_b, ks_micro, ks_bin)`` — ``ks_bin`` is the
    SMALLEST bin index achieving the max (deterministic ties), i.e.
    where the distributions diverge most.

    Scale shape: one map-side-combined histogram shuffle per side
    (≤ n_bins rows each), a full-outer join of the two kilobyte
    histograms, a running-max forward fill of the monotone cumulative
    counts over ≤ n_bins rows, and a single-row aggregation.
    """
    width = (float(hi) - float(lo)) / int(n_bins)
    ha = _cum_histogram(df_a, value_col, [], lo, width, n_bins).select(
        "__bin", F.col("__cum").alias("__ca")
    )
    hb = _cum_histogram(df_b, value_col, [], lo, width, n_bins).select(
        "__bin", F.col("__cum").alias("__cb")
    )
    na = df_a.filter(F.col(value_col).isNotNull()).agg(
        F.count(F.lit(1)).alias("n_a")
    )
    nb = df_b.filter(F.col(value_col).isNotNull()).agg(
        F.count(F.lit(1)).alias("n_b")
    )
    j = (
        ha.join(hb, "__bin", "full_outer")
        .crossJoin(F.broadcast(na))
        .crossJoin(F.broadcast(nb))
    )
    # forward fill: cumulative counts are monotone, so the running max
    # of (value-or-0) over bin order IS the last seen cumulative
    w = Window.orderBy(F.col("__bin").asc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    filled = j.select(
        "__bin",
        "n_a",
        "n_b",
        F.max(F.coalesce(F.col("__ca"), F.lit(0))).over(w).alias("__fa"),
        F.max(F.coalesce(F.col("__cb"), F.lit(0))).over(w).alias("__fb"),
    )
    gap = F.abs(F.col("__fa") * F.col("n_b") - F.col("__fb") * F.col("n_a"))
    best = F.max(
        F.struct(gap.alias("g"), (-F.col("__bin")).alias("nb_"))
    )
    return (
        filled.agg(
            F.max("n_a").alias("n_a"),
            F.max("n_b").alias("n_b"),
            best.alias("__best"),
        )
        .select(
            "n_a",
            "n_b",
            F.expr("(1000000 * __best.g) div (n_a * n_b)").alias("ks_micro"),
            (-F.col("__best.nb_")).cast("long").alias("ks_bin"),
        )
    )


def chi2_independence(df, col_a: str, col_b: str):
    """Pearson chi-square statistic between two categorical columns —
    the SIGNIFICANCE companion to :func:`mutual_info` (MI says how
    strong an association is; chi² against its degrees of freedom says
    whether it could be chance at this sample size). NULL is a category
    on both axes, the profiler convention.

    ``chi2 = SUM_cells (o - e)² / e`` with ``e = ca·cb/n``. Every input
    to a cell's term is an exact integer count; the term itself is
    evaluated in doubles with ONE fixed expression shape —
    ``(o·n - ca·cb)² / (ca·cb·n)`` — rounded to micro-units per cell
    and integer-summed (order-free, engine-exact: the kappa/PMI
    discipline). Only OBSERVED cells enter the sum directly; the
    expected mass of zero cells is folded in exactly as
    ``n - SUM_observed(e)`` (their (o-e)²/e reduces to e), so the
    statistic equals the full-grid formula without materializing the
    |A|x|B| grid.

    One row: ``(n_rows, n_cells_observed, dof, chi2_micro)`` with
    ``dof = (|A|-1)(|B|-1)``.

    Scale shape: ONE map-side-combined groupBy at observed-cell
    cardinality; marginals and totals from tiny aggregations over that
    kilobyte frame (the mutual_info posture); data scanned once.
    """
    joint = (
        df.select(
            F.col(col_a).cast("string").alias("__a"),
            F.col(col_b).cast("string").alias("__b"),
        )
        .groupBy("__a", "__b")
        .agg(F.count(F.lit(1)).alias("o"))
    )
    ma = joint.groupBy("__a").agg(F.sum("o").alias("ca"))
    mb = joint.groupBy("__b").agg(F.sum("o").alias("cb"))
    total = joint.agg(
        F.sum("o").alias("n"), F.count(F.lit(1)).alias("n_cells")
    )
    na = ma.agg(F.count(F.lit(1)).alias("ka"))
    nb = mb.agg(F.count(F.lit(1)).alias("kb"))
    cells = (
        joint.join(ma, "__a")
        .join(mb, "__b")
        .crossJoin(F.broadcast(total))
    )
    o_d = F.col("o").cast("double")
    n_d = F.col("n").cast("double")
    ca_d = F.col("ca").cast("double")
    cb_d = F.col("cb").cast("double")
    num = o_d * n_d - ca_d * cb_d
    term = F.round(num * num / (ca_d * cb_d * n_d) * F.lit(1e6)).cast("long")
    # zero-cell mass: sum over observed cells of e = ca*cb/n, folded as
    # round((n - sum_e) * 1e6) — exact-integer inputs, one double step
    agg = cells.agg(
        F.sum(term).alias("__obs"),
        F.sum(ca_d * cb_d).alias("__ccb"),
        F.max("n").alias("n_rows"),
        F.max("n_cells").alias("n_cells_observed"),
    ).select(
        "__obs",
        F.round(
            (
                F.col("n_rows").cast("double")
                - F.col("__ccb") / F.col("n_rows").cast("double")
            )
            * F.lit(1e6)
        )
        .cast("long")
        .alias("__zero"),
        "n_rows",
        "n_cells_observed",
    )
    return (
        agg.crossJoin(F.broadcast(na))
        .crossJoin(F.broadcast(nb))
        .select(
            "n_rows",
            "n_cells_observed",
            ((F.col("ka") - 1) * (F.col("kb") - 1)).cast("long").alias("dof"),
            (F.col("__obs") + F.col("__zero")).alias("chi2_micro"),
        )
    )


def cramers_v(df, col_a: str, col_b: str):
    """Cramér's V — the [0, 1] effect size that makes chi² comparable
    across tables and label cardinalities (chi² grows with n; MI is in
    nats; V answers "is this association big"): ``V = sqrt(chi² / (n ·
    min(|A|-1, |B|-1)))``, reported in exact milli units via one
    double sqrt over the already-exact ``chi2_micro``. Completes the
    categorical-association triad: mutual_info (strength in nats),
    chi2_independence (significance), cramers_v (normalized effect).
    A constant column on either side (min side cardinality 1) yields
    NULL — there is no association to size.

    One row: ``(n_rows, dof, chi2_micro, v_milli)``. Fully declarative
    — the label cardinalities ride in as broadcast one-row frames, no
    driver action. NULL is a category, the profiler convention.
    """
    base = chi2_independence(df, col_a, col_b)
    na = (
        df.select(F.col(col_a).cast("string").alias("x"))
        .distinct()
        .agg(F.count(F.lit(1)).alias("ka"))
    )
    nb = (
        df.select(F.col(col_b).cast("string").alias("x"))
        .distinct()
        .agg(F.count(F.lit(1)).alias("kb"))
    )
    m = F.least(F.col("ka") - 1, F.col("kb") - 1)
    return (
        base.crossJoin(F.broadcast(na))
        .crossJoin(F.broadcast(nb))
        .select(
            "n_rows",
            "dof",
            "chi2_micro",
            F.when(
                m > 0,
                F.round(
                    F.sqrt(
                        F.col("chi2_micro").cast("double")
                        / F.lit(1e6)
                        / (F.col("n_rows").cast("double") * m.cast("double"))
                    )
                    * F.lit(1e3)
                ).cast("long"),
            ).alias("v_milli"),
        )
    )


def js_distance_numeric(
    df_a,
    df_b,
    value_col: str,
    *,
    lo: float,
    hi: float,
    n_bins: int = 1024,
):
    """Jensen-Shannon divergence between two NUMERIC distributions at
    histogram resolution — the mass-weighted drift score next to
    :func:`ks_distance`'s max-gap (KS flags the worst single point; JS
    weighs every bin by how much probability actually moved, and —
    unlike the classic PSI — needs no epsilon hack for one-sided-empty
    bins: the KL convention handles them exactly). Micro-nats,
    0 .. ln 2.

    Pure composition: each side's :func:`histogram_counts` frame
    (≤ n_bins rows) feeds
    :func:`~cassandra_diff_spark.operators.vocab.js_divergence` with
    bins as the "tokens" — one histogram shuffle per side, kilobyte
    work after. Output: ``(n_tokens_union, total_a, total_b,
    js_micronat)`` where total_* are the row counts.
    """
    from cassandra_diff_spark.operators.vocab import js_divergence

    width = (float(hi) - float(lo)) / int(n_bins)
    ha = histogram_counts(df_a, value_col, [], lo, width, n_bins).select(
        F.col("__bin").cast("string").alias("token"), F.col("__c").alias("n")
    )
    hb = histogram_counts(df_b, value_col, [], lo, width, n_bins).select(
        F.col("__bin").cast("string").alias("token"), F.col("__c").alias("n")
    )
    return js_divergence(ha, hb)


def theils_u(df: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """Theil's uncertainty coefficient both ways — the ASYMMETRIC
    member of the categorical association family (MI says "how much do
    these columns share", Cramer's V normalizes it symmetrically; U
    answers the directional question "what fraction of A's entropy
    does knowing B remove" — U(A|B) = MI / H(A), and U(B|A) differs
    whenever the marginals do). The classic use: a 5-value status
    column may be fully determined by a 1000-value code column
    (U(status|code)=1) while the code stays almost unpredictable from
    status (U(code|status)~0) — symmetric measures blur exactly this.

    Exactness: the SAME per-term integer micro-nat discipline as
    :func:`mutual_info` / :func:`column_entropy` (each cell / marginal
    term rounded to ``1e-6`` nats BEFORE the order-free integer sum),
    then each coefficient is ONE exact integer division
    ``(mi * 1000) div h`` — milli-units, bit-identical in any engine.
    NULL is a category on both axes; a constant column (H = 0) yields
    NULL for its coefficient (0/0 has no information-theoretic answer).

    Scale shape: identical to :func:`mutual_info` — ONE data-sized
    shuffle for the joint (a, b) counts; marginal counts AND marginal
    entropies come from windows/groupBys over the ≤ |A|x|B| joint
    frame; everything after is kilobyte one-row frames composed by
    broadcast crossJoins.

    Output: one row ``(col_a, col_b, n_rows, mi_micronat, ha_micronat,
    hb_micronat, u_a_given_b_milli, u_b_given_a_milli)``.

    EAGER by contract: the call runs the Spark job and returns the
    one-row result already materialized (``createDataFrame`` over the
    collected row) so the internal joint-frame cache never outlives the
    call — composing this lazily is not supported; failures surface at
    invocation, like :func:`~cassandra_diff_spark.operators.validate.kendall_tau`.
    """
    joint = (
        df.select(
            F.col(col_a).cast("string").alias("__a"),
            F.col(col_b).cast("string").alias("__b"),
        )
        .groupBy("__a", "__b")
        .agg(F.count(F.lit(1)).alias("cab"))
        .persist()
    )
    # persisted joint frame is dropped in the finally below — the one-row
    # result is materialized eagerly, so nothing leaks into the session
    # (r9 leaked one cached frame per call)
    total = joint.agg(F.sum("cab").cast("long").alias("n"))
    ca = F.sum("cab").over(Window.partitionBy("__a"))
    cb = F.sum("cab").over(Window.partitionBy("__b"))
    cab_d = F.col("cab").cast("double")
    n_d = F.col("n").cast("double")
    mi_term = F.round(
        (cab_d / n_d)
        * F.log(
            (cab_d * n_d)
            / (F.col("ca").cast("double") * F.col("cb").cast("double"))
        )
        * F.lit(1e6)
    ).cast("long")
    mi = (
        joint.select("cab", ca.alias("ca"), cb.alias("cb"))
        .crossJoin(F.broadcast(total))
        .agg(F.sum(mi_term).cast("long").alias("mi_micronat"))
    )

    def _h(group_col: str, alias: str):
        marg = joint.groupBy(group_col).agg(F.sum("cab").alias("c"))
        c_d = F.col("c").cast("double")
        term = F.round((c_d / n_d) * F.log(n_d / c_d) * F.lit(1e6)).cast("long")
        return (
            marg.crossJoin(F.broadcast(total))
            .agg(F.sum(term).cast("long").alias(alias))
        )

    out = (
        total.crossJoin(F.broadcast(mi))
        .crossJoin(F.broadcast(_h("__a", "ha_micronat")))
        .crossJoin(F.broadcast(_h("__b", "hb_micronat")))
        .select(
            F.lit(col_a).alias("col_a"),
            F.lit(col_b).alias("col_b"),
            F.col("n").alias("n_rows"),
            "mi_micronat",
            "ha_micronat",
            "hb_micronat",
            # greatest(mi, 0): per-term rounding can leave a hair-negative
            # integer MI on independent columns, and negative `div`
            # TRUNCATES in Spark but FLOORS in DuckDB — clamping keeps U
            # in its defined [0,1] range AND keeps both engines identical
            F.when(F.col("ha_micronat") <= 0, F.lit(None).cast("long"))
            .otherwise(
                F.expr("(greatest(mi_micronat, 0) * 1000) div ha_micronat")
            )
            .alias("u_a_given_b_milli"),
            F.when(F.col("hb_micronat") <= 0, F.lit(None).cast("long"))
            .otherwise(
                F.expr("(greatest(mi_micronat, 0) * 1000) div hb_micronat")
            )
            .alias("u_b_given_a_milli"),
        )
    )
    try:
        return df.sparkSession.createDataFrame(out.collect(), out.schema)
    finally:
        joint.unpersist()
