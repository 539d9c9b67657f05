"""Pipeline-quality evaluation: the measurement operators that close the
loop on the dedup / retrieval / labeling families — "how good is the
pair set my LSH produced", "what recall does my ANN index hold",
"do my annotators agree". The engine's exactness discipline applies:
every reported metric is an integer milli/micro unit derived from exact
integer counts, so the numbers are bit-identical in any engine and the
DuckDB oracle gates them like any data operator.

Scale shapes: all inputs here are RESULT frames (pair sets, top-k
lists, label columns) — drift/top-k/label-cardinality sized, orders of
magnitude below the corpora that produced them. Joins key on the pair
or (query, neighbor) identity; aggregations are map-side combinable;
nothing rescans source data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canon_pairs(pairs: DataFrame) -> DataFrame:
    """Undirected pair canonicalization: (least, greatest), distinct,
    self-pairs dropped."""
    return (
        pairs.select(
            F.least(F.col("id_1"), F.col("id_2")).alias("id_1"),
            F.greatest(F.col("id_1"), F.col("id_2")).alias("id_2"),
        )
        .filter(F.col("id_1") != F.col("id_2"))
        .distinct()
    )


def pair_metrics(pred: DataFrame, truth: DataFrame) -> DataFrame:
    """Precision / recall / F1 of a predicted duplicate-pair frame
    against a truth pair frame — the harness for tuning LSH bands,
    containment thresholds, or blocking keys on a labeled sample before
    paying for the 100 TB run.

    Both inputs are (id_1, id_2) frames, treated as undirected sets
    (canonicalized, deduplicated, self-pairs dropped). One row out:
    ``(n_pred, n_truth, tp, fp, fn, precision_milli, recall_milli,
    f1_milli)`` with every metric an exact integer milli-fraction
    (``div`` end to end — no float enters). Empty pred or truth yields
    NULL for the affected ratios (``div`` by zero), not an error.

    The whole computation is ONE declarative plan (full-outer join of
    the two canonical pair frames on the pair identity + a single
    global aggregation) — no driver-side counting, lazily composable.
    """
    p = _canon_pairs(pred).withColumn("__p", F.lit(1))
    t = _canon_pairs(truth).withColumn("__t", F.lit(1))
    j = p.join(t, ["id_1", "id_2"], "full_outer")
    # coalesce: two EMPTY inputs join to zero rows and a bare sum would
    # report NULL counts instead of 0 (found by hypothesis)
    agg = j.agg(
        F.coalesce(
            F.sum(
                F.when(
                    F.col("__p").isNotNull() & F.col("__t").isNotNull(), 1
                ).otherwise(0)
            ),
            F.lit(0),
        ).alias("tp"),
        F.coalesce(
            F.sum(
                F.when(
                    F.col("__p").isNotNull() & F.col("__t").isNull(), 1
                ).otherwise(0)
            ),
            F.lit(0),
        ).alias("fp"),
        F.coalesce(
            F.sum(
                F.when(
                    F.col("__p").isNull() & F.col("__t").isNotNull(), 1
                ).otherwise(0)
            ),
            F.lit(0),
        ).alias("fn"),
    )
    return agg.select(
        F.expr("tp + fp").alias("n_pred"),
        F.expr("tp + fn").alias("n_truth"),
        "tp",
        "fp",
        "fn",
        F.expr(
            "CASE WHEN tp + fp = 0 THEN NULL"
            " ELSE (1000 * tp) div (tp + fp) END"
        ).alias("precision_milli"),
        F.expr(
            "CASE WHEN tp + fn = 0 THEN NULL"
            " ELSE (1000 * tp) div (tp + fn) END"
        ).alias("recall_milli"),
        F.expr(
            "CASE WHEN 2 * tp + fp + fn = 0 THEN NULL"
            " ELSE (2000 * tp) div (2 * tp + fp + fn) END"
        ).alias("f1_milli"),
    )


def retrieval_metrics(pred: DataFrame, truth: DataFrame, k: int) -> DataFrame:
    """Recall@k and MRR of a ranked retrieval frame against a relevance
    frame — the harness that keeps an IVF/LSH/PQ index honest after
    every rebuild (the scale probe's recall check as a first-class,
    gate-checkable operator).

    ``pred`` is ``(query_id, neighbor_id, rank)`` (any ANN operator's
    output); ``truth`` is ``(query_id, neighbor_id)`` relevant pairs,
    treated as a SET (duplicates dropped — a pair repeated in the
    relevance frame must not double-count a hit or inflate the
    denominator). Queries with NO truth rows are excluded (their
    recall is undefined); queries that appear in truth but retrieved
    nothing still count (recall 0, reciprocal rank 0).

    One row out, all exact integers:

    * ``n_queries``, ``sum_hits``, ``sum_relevant``
    * ``micro_recall_milli`` = ``1000 * sum_hits div sum_relevant``
      (hit-weighted: big queries dominate)
    * ``macro_recall_milli`` = mean of per-query ``1000*hits div rel``
      (query-weighted: every query votes once)
    * ``mrr_micro`` = mean of per-query ``1_000_000 div first_hit_rank``

    Scale shape: one broadcast-able join of the top-k frame against the
    relevance frame, then a per-query aggregation at query cardinality.
    """
    pk = pred.filter(F.col("rank") <= k)
    truth = truth.select("query_id", "neighbor_id").distinct()
    hit = pk.join(truth, ["query_id", "neighbor_id"]).select(
        "query_id", "rank"
    )
    per_hit = hit.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("hits"),
        F.min("rank").alias("first_rank"),
    )
    rel = truth.groupBy("query_id").agg(F.count(F.lit(1)).alias("rel"))
    per_q = rel.join(per_hit, "query_id", "left").select(
        "query_id",
        "rel",
        F.coalesce(F.col("hits"), F.lit(0)).alias("hits"),
        F.coalesce(
            F.expr("1000000 div first_rank"), F.lit(0)
        ).alias("rr_micro"),
    )
    agg = per_q.agg(
        F.count(F.lit(1)).alias("n_queries"),
        F.sum("hits").alias("sum_hits"),
        F.sum("rel").alias("sum_relevant"),
        F.sum(F.expr("(1000 * hits) div rel")).alias("__macro_sum"),
        F.sum("rr_micro").alias("__rr_sum"),
    )
    return agg.select(
        "n_queries",
        "sum_hits",
        "sum_relevant",
        F.expr(
            "CASE WHEN sum_relevant = 0 THEN NULL"
            " ELSE (1000 * sum_hits) div sum_relevant END"
        ).alias("micro_recall_milli"),
        F.expr(
            "CASE WHEN n_queries = 0 THEN NULL"
            " ELSE __macro_sum div n_queries END"
        ).alias("macro_recall_milli"),
        F.expr(
            "CASE WHEN n_queries = 0 THEN NULL"
            " ELSE __rr_sum div n_queries END"
        ).alias("mrr_micro"),
    )


def cohen_kappa(df: DataFrame, label_a: str, label_b: str) -> DataFrame:
    """Inter-annotator agreement (Cohen's kappa) between two label
    columns — the labeled-data QA gate ("is this annotation batch
    usable, or are the raters guessing"). NULL is a category (two
    raters both abstaining is agreement; one abstaining is not), same
    convention as the entropy/MI profilers.

    kappa = (po - pe) / (1 - pe) with po = agree/n and
    pe = sum_l count_a(l)*count_b(l) / n^2. Both are ratios of exact
    integer counts, so the single float step is the final division:
    ``kappa_micro = round(num/den * 1e6)`` over the exact int64
    numerator ``agree*n - S`` and denominator ``n*n - S``
    (S = sum of marginal products) — deterministic across engines
    (the PMI/MI rounding discipline). den == 0 (pe == 1: both raters
    constant) yields NULL kappa. Safe to n ~ 3e9 rows (n^2 < 2^63).

    One row out: ``(n_items, n_agree, po_milli, pe_micro, kappa_micro)``.

    Scale shape: ONE map-side-combined groupBy on the (a, b) label pair
    (cell cardinality = |A|x|B|); marginals and their product sum come
    from tiny aggregations OVER that kilobyte cell frame — the
    mutual_info posture; the data is scanned once.
    """
    joint = (
        df.select(
            F.col(label_a).cast("string").alias("__a"),
            F.col(label_b).cast("string").alias("__b"),
        )
        .groupBy("__a", "__b")
        .agg(F.count(F.lit(1)).alias("cab"))
    )
    # S = sum_l ca(l)*cb(l): labels used by only ONE rater still
    # contribute (their product is 0 only if the other marginal is 0) —
    # a full-outer join of the two marginal frames covers both sides
    ma = joint.groupBy("__a").agg(F.sum("cab").alias("na"))
    mb = joint.groupBy(F.col("__b").alias("__bk")).agg(F.sum("cab").alias("nb"))
    # null-safe equality: NULL is a category, so the NULL marginals of
    # the two raters must meet (a plain join key would never match them)
    marg = ma.join(mb, ma["__a"].eqNullSafe(mb["__bk"]), "full_outer").select(
        (
            F.coalesce(F.col("na"), F.lit(0))
            * F.coalesce(F.col("nb"), F.lit(0))
        ).alias("prod")
    )
    s_frame = marg.agg(F.sum("prod").alias("S"))
    base = joint.agg(
        F.sum("cab").alias("n"),
        F.sum(
            F.when(F.col("__a").eqNullSafe(F.col("__b")), F.col("cab")).otherwise(0)
        ).alias("agree"),
    )
    out = base.crossJoin(F.broadcast(s_frame)).select(
        F.col("n").alias("n_items"),
        F.col("agree").alias("n_agree"),
        F.expr("(1000 * agree) div n").alias("po_milli"),
        F.round(
            F.col("S").cast("double")
            / (F.col("n").cast("double") * F.col("n").cast("double"))
            * F.lit(1e6)
        )
        .cast("long")
        .alias("pe_micro"),
        F.when(
            (F.col("n") * F.col("n") - F.col("S")) != 0,
            F.round(
                (F.col("agree") * F.col("n") - F.col("S")).cast("double")
                / (F.col("n") * F.col("n") - F.col("S")).cast("double")
                * F.lit(1e6)
            ).cast("long"),
        ).alias("kappa_micro"),
    )
    return out


def majority_label(
    df: DataFrame, item_col: str, label_col: str
) -> DataFrame:
    """Per-item majority-vote label aggregation — turning N noisy votes
    per item into one training label plus a confidence: the label with
    the most votes wins, ties break to the LEXICALLY SMALLEST label
    (deterministic — the diff_kway convention). NULL votes are a real
    category (an item whose raters all abstained gets label NULL).

    Output: ``(item, label, n_votes, n_total, agreement_milli)`` with
    ``agreement_milli = 1000 * n_votes div n_total``.

    Scale shape: groupBy (item, label) collapses agreeing votes
    map-side; the winner is a min_by over at most |labels| rows per
    item — two map-side-combinable aggregations, no window, no sort.
    """
    g = (
        df.select(
            F.col(item_col).alias("item"),
            F.col(label_col).cast("string").alias("__label"),
        )
        .groupBy("item", "__label")
        .agg(F.count(F.lit(1)).alias("__cnt"))
    )
    return majority_from_counts(g)


def majority_from_counts(g: DataFrame) -> DataFrame:
    """Winner resolution over an ALREADY-AGGREGATED
    ``(item, __label, __cnt)`` vote-count frame — the tail
    :func:`majority_label` and the streaming twin (whose complete-mode
    state IS that count frame) share, so drained-stream output equals
    the batch operator by construction."""
    win = F.min_by(
        F.struct(F.col("__label").alias("l"), F.col("__cnt").alias("c")),
        # count DESC, label ASC: minimize (-count, label); NULL labels
        # sort AFTER real strings in min_by's struct order? No — make
        # the order explicit: nulls lose ties via a 0/1 flag first
        F.struct(
            (-F.col("__cnt")).alias("nc"),
            F.col("__label").isNull().cast("int").alias("nl"),
            F.col("__label").alias("l"),
        ),
    )
    out = g.groupBy("item").agg(
        win.alias("__w"),
        F.sum("__cnt").alias("n_total"),
    )
    return out.select(
        "item",
        F.col("__w.l").alias("label"),
        F.col("__w.c").alias("n_votes"),
        "n_total",
        F.expr("(1000 * __w.c) div n_total").alias("agreement_milli"),
    )


def confusion_matrix(df: DataFrame, truth_col: str, pred_col: str) -> DataFrame:
    """(truth, pred, n) cell counts — the raw disagreement map between a
    truth label column and a predicted one (a labeler model vs its
    golden set, two pipeline versions, a rater vs the majority vote).
    NULL is a category on both axes, same convention as
    :func:`cohen_kappa`. ONE map-side-combined groupBy at cell
    cardinality."""
    return (
        df.select(
            F.col(truth_col).cast("string").alias("truth"),
            F.col(pred_col).cast("string").alias("pred"),
        )
        .groupBy("truth", "pred")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def class_metrics(df: DataFrame, truth_col: str, pred_col: str) -> DataFrame:
    """Per-class precision / recall / F1 from a truth/pred label pair —
    the classifier-QA sweep run before trusting model-assigned labels
    at corpus scale. One row per label seen on EITHER axis:
    ``(label, tp, fp, fn, precision_milli, recall_milli, f1_milli)``
    with the exact-integer ``div`` discipline (a label never predicted
    has NULL precision; a label never true has NULL recall).

    Scale shape: everything derives from the :func:`confusion_matrix`
    cell frame (|labels|² rows — kilobytes for real label sets): tp is
    the diagonal, fp/fn are axis sums minus the diagonal, computed with
    two tiny aggregations and ONE null-safe full-outer join of the
    marginal frames. The data is scanned once, by the cell groupBy.
    """
    cells = confusion_matrix(df, truth_col, pred_col)
    return class_metrics_from_cells(cells)


def ndcg_at_k(pred: DataFrame, truth: DataFrame, k: int) -> DataFrame:
    """Per-query NDCG@k for GRADED relevance — the ranking metric when
    some hits matter more than others (exact duplicate > near-dup >
    same-topic in a retrieval training set). ``pred`` is
    ``(query_id, neighbor_id, rank)``; ``truth`` is
    ``(query_id, neighbor_id, gain)`` with positive integer gains
    (non-positive/null gains are excluded — they carry no relevance
    mass) and ONE row per (query, neighbor): a duplicated pair would
    double its gain in both DCG and the ideal — dedupe upstream if the
    relevance frame can repeat.

    Discount discipline: the standard 1/log2(rank+1) scaled by ln 2 —
    i.e. terms are ``round(gain * 1e6 / ln(rank+1))`` micro-units.
    NDCG is a ratio of same-unit sums, so the constant factor cancels
    and the value equals the log2 formulation up to per-term integer
    rounding; ``ln`` is the one transcendental both engines evaluate
    bit-identically (the PMI/entropy discipline), which is what makes
    the metric gate-checkable.

    Output: ``(query_id, dcg_micro, idcg_micro, ndcg_milli)`` with
    ``ndcg_milli = (1000 * dcg_micro) div idcg_micro`` — one row per
    query appearing in truth; a query that retrieved nothing scores 0.

    Scale shape: one join of the top-k frame against the relevance
    frame + one window over the (small) relevance frame for the ideal
    ordering; aggregations at query cardinality.
    """
    from pyspark.sql import Window

    t = truth.filter(F.col("gain") > 0)
    term = F.round(
        F.col("gain").cast("double")
        * F.lit(1e6)
        / F.log(F.col("__r").cast("double") + F.lit(1.0))
    ).cast("long")
    hits = (
        pred.filter(F.col("rank") <= k)
        .join(t, ["query_id", "neighbor_id"])
        .select("query_id", "gain", F.col("rank").alias("__r"))
        .select("query_id", term.alias("__t"))
    )
    dcg = hits.groupBy("query_id").agg(F.sum("__t").alias("dcg_micro"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("gain").desc(), F.col("neighbor_id").asc()
    )
    ideal = (
        t.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") <= k)
        .select("query_id", term.alias("__t"))
        .groupBy("query_id")
        .agg(F.sum("__t").alias("idcg_micro"))
    )
    return ideal.join(dcg, "query_id", "left").select(
        "query_id",
        F.coalesce(F.col("dcg_micro"), F.lit(0)).alias("dcg_micro"),
        "idcg_micro",
        F.expr(
            "CASE WHEN idcg_micro = 0 THEN NULL"
            " ELSE (1000 * coalesce(dcg_micro, 0)) div idcg_micro END"
        ).alias("ndcg_milli"),
    )


def average_precision_at_k(
    pred: DataFrame, truth: DataFrame, k: int
) -> DataFrame:
    """Per-query average precision@k — the order-sensitive retrieval
    score that rewards putting relevant results EARLY (recall@k cannot
    tell rank 1 from rank k). ``AP = (1/min(rel, k)) *
    sum over relevant ranks r of precision@r``.

    Exact-integer form: walking the hits in rank order, the cumulative
    hit count AT a hit's rank is just its 1-based position in the hit
    sequence, so ``precision@r`` is ``row_number / r`` and every term is
    ``(1e6 * row_number) div r`` — integer end to end, engine-exact.
    (Each div floors at micro resolution; the reference float AP agrees
    to ~1e-5 — the determinism trade every milli/micro metric here
    makes.)

    Inputs as :func:`retrieval_metrics` (truth treated as a set); one
    row per query in truth: ``(query_id, n_rel, n_hits, ap_micro)``,
    zero for queries that retrieved nothing relevant.

    Scale shape: join of the top-k frame with the relevance set + one
    window over the HIT rows (≤ k per query), aggregations at query
    cardinality.
    """
    from pyspark.sql import Window

    t = truth.select("query_id", "neighbor_id").distinct()
    hits = (
        pred.filter(F.col("rank") <= k)
        .join(t, ["query_id", "neighbor_id"])
        .select("query_id", "rank")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("rank").asc())
    terms = hits.withColumn("__rn", F.row_number().over(w)).withColumn(
        "__t", F.expr("(1000000 * __rn) div rank")
    )
    per_hit = terms.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_hits"), F.sum("__t").alias("__sum")
    )
    rel = t.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_rel"))
    return rel.join(per_hit, "query_id", "left").select(
        "query_id",
        "n_rel",
        F.coalesce(F.col("n_hits"), F.lit(0)).alias("n_hits"),
        F.expr(
            f"coalesce(__sum, 0) div least(n_rel, {int(k)})"
        ).alias("ap_micro"),
    )


def class_metrics_from_cells(cells: DataFrame) -> DataFrame:
    """Per-class metric resolution over an ALREADY-AGGREGATED
    ``(truth, pred, n)`` cell frame — the tail :func:`class_metrics`
    and the streaming twin (whose complete-mode state IS that cell
    frame) share, so drained-stream output equals the batch operator
    by construction."""
    diag = cells.filter(F.col("truth").eqNullSafe(F.col("pred"))).select(
        F.col("truth").alias("__label"), F.col("n").alias("tp")
    )
    mt = cells.groupBy(F.col("truth").alias("__t")).agg(
        F.sum("n").alias("n_true")
    )
    mp = cells.groupBy(F.col("pred").alias("__p")).agg(
        F.sum("n").alias("n_pred")
    )
    marg = mt.join(mp, mt["__t"].eqNullSafe(mp["__p"]), "full_outer").select(
        F.coalesce(F.col("__t"), F.col("__p")).alias("__label"),
        F.coalesce(F.col("n_true"), F.lit(0)).alias("n_true"),
        F.coalesce(F.col("n_pred"), F.lit(0)).alias("n_pred"),
    )
    j = marg.join(
        diag, marg["__label"].eqNullSafe(diag["__label"]), "left"
    ).select(
        marg["__label"].alias("label"),
        F.coalesce(F.col("tp"), F.lit(0)).alias("tp"),
        (F.col("n_pred") - F.coalesce(F.col("tp"), F.lit(0))).alias("fp"),
        (F.col("n_true") - F.coalesce(F.col("tp"), F.lit(0))).alias("fn"),
    )
    return j.select(
        "label",
        "tp",
        "fp",
        "fn",
        F.expr(
            "CASE WHEN tp + fp = 0 THEN NULL"
            " ELSE (1000 * tp) div (tp + fp) END"
        ).alias("precision_milli"),
        F.expr(
            "CASE WHEN tp + fn = 0 THEN NULL"
            " ELSE (1000 * tp) div (tp + fn) END"
        ).alias("recall_milli"),
        F.expr(
            "CASE WHEN 2 * tp + fp + fn = 0 THEN NULL"
            " ELSE (2000 * tp) div (2 * tp + fp + fn) END"
        ).alias("f1_milli"),
    )


def fleiss_kappa(df: DataFrame, item_col: str, label_col: str) -> DataFrame:
    """Multi-rater agreement (Fleiss 1971) — Cohen's kappa generalized
    from two raters to N: every item receives the SAME number of
    categorical votes (the operator validates this and raises
    otherwise — subset to a constant panel first; majority_label
    handles the ragged case), and kappa measures how far the observed
    within-item agreement exceeds chance from the pooled label
    distribution. NULL votes are a category (the family convention).

    Math on exact integers: per item ``P_i = (Σ_j n_ij² - n)/(n(n-1))``
    — sums of squared counts; ``P̄`` and ``P̄e = Σ_j p_j²`` are ratios
    of exact integer sums, so the single float step is the final
    ``round((num/den) * 1e6)`` over int64 cross-products (the Cohen
    kappa discipline; N_items·n and label totals must keep the
    products < 2^63 — ~3e9 votes, same caveat).

    One row: ``(n_items, n_raters, n_labels, pbar_micro, pe_micro,
    kappa_micro)``; NULL kappa when pe == 1 (all votes one label).

    Scale shape: one groupBy (item, label) for the vote counts, one
    groupBy (item) for the per-item sums, kilobyte label-marginal
    aggregations — the data is scanned once.
    """
    votes = df.select(
        F.col(item_col).alias("item"),
        F.col(label_col).cast("string").alias("__label"),
    )
    cnt = votes.groupBy("item", "__label").agg(F.count(F.lit(1)).alias("c"))
    per_item = cnt.groupBy("item").agg(
        F.sum("c").alias("__n"),
        F.sum(F.col("c") * F.col("c")).alias("__sq"),
    )
    # constant-panel validation: kilobyte action over the distinct
    # per-item vote counts (the one legitimate driver step)
    ns = [r.n for r in per_item.select(F.col("__n").alias("n")).distinct().collect()]
    if len(ns) != 1:
        raise ValueError(
            f"fleiss_kappa needs the same number of votes per item; saw "
            f"panel sizes {sorted(ns)[:10]} — subset to a constant panel "
            f"or use majority_label for ragged votes"
        )
    n = int(ns[0])
    if n < 2:
        raise ValueError(f"fleiss_kappa needs >= 2 votes per item, got {n}")
    # P_i numerators sum exactly: sum_i (sq_i - n); denominator N*n*(n-1)
    items = per_item.agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(F.col("__sq") - F.lit(n)).alias("__pnum"),
    )
    marg = cnt.groupBy("__label").agg(F.sum("c").alias("cj"))
    lab = marg.agg(
        F.count(F.lit(1)).alias("n_labels"),
        F.sum(F.col("cj") * F.col("cj")).alias("__csq"),
        F.sum("cj").alias("__ctot"),
    )
    j = items.crossJoin(F.broadcast(lab))
    # pbar = pnum / (N n (n-1)); pe = csq / ctot²; kappa = (pbar-pe)/(1-pe)
    # exact int64 cross-products: num = pnum·ctot² - csq·N·n·(n-1),
    #                             den = (ctot² - csq)·N·n·(n-1)
    pden = F.col("n_items") * F.lit(n) * F.lit(n - 1)
    ct2 = F.col("__ctot") * F.col("__ctot")
    num = F.col("__pnum") * ct2 - F.col("__csq") * pden
    den = (ct2 - F.col("__csq")) * pden
    return j.select(
        "n_items",
        F.lit(n).cast("long").alias("n_raters"),
        "n_labels",
        F.round(F.col("__pnum").cast("double") / pden.cast("double") * F.lit(1e6))
        .cast("long")
        .alias("pbar_micro"),
        F.round(F.col("__csq").cast("double") / ct2.cast("double") * F.lit(1e6))
        .cast("long")
        .alias("pe_micro"),
        F.when(
            den != 0,
            F.round(num.cast("double") / den.cast("double") * F.lit(1e6)).cast(
                "long"
            ),
        ).alias("kappa_micro"),
    )


def auc_exact(df: DataFrame, score_col: str, label_col: str) -> DataFrame:
    """EXACT ROC-AUC of a score column against a boolean label — the
    threshold-free companion of :func:`calibration_bins` (calibration
    asks "does the score mean what it claims per bin"; AUC asks "does
    the score ORDER positives above negatives at all" — the number a
    quality-classifier bake-off reports). Computed as the Mann-Whitney
    U statistic, which needs no probabilities and no bins:

        AUC = [#(pos > neg pairs) + 0.5 * #(pos == neg pairs)]
              / (n_pos * n_neg)

    carried in DOUBLED integer units (the spearman rank discipline) so
    ties never produce a float: ``U2 = sum over distinct scores v of
    pos_v * (2 * neg_below_v + neg_v)`` — every term an exact integer,
    summed in ``decimal(38,0)`` (HUGEINT twin), and the single output
    ``auc_ppm = U2 * 1e6 div (2 * n_pos * n_neg)`` is one exact integer
    division — bit-identical in any engine. NULL when either class is
    absent (AUC undefined).

    Scale shape: ONE map-side-combined groupBy at distinct-SCORE
    cardinality, then the ``_running_below`` range-partitioned prefix
    core from the spearman rewrite (literal hash-sampled split
    boundaries, bucket-partitioned window, broadcast offsets — no
    unpartitioned WindowExec, no data-sized single task even when the
    score is continuous with distinct ~ n). Rows with NULL score or
    label are excluded. Output: one row
    ``(n, n_pos, n_neg, auc_ppm)``.

    EAGER by contract (the :func:`~cassandra_diff_spark.operators.validate.kendall_tau`
    pattern): the call runs the Spark job and returns the one-row
    result already materialized, so the internal distinct-score cell
    cache never outlives the call — long-lived sessions accumulate
    nothing. Composing this lazily is not supported; failures surface
    at invocation.
    """
    from cassandra_diff_spark.operators.validate import (
        _running_below,
        _split_points,
    )

    base = df.filter(
        F.col(score_col).isNotNull() & F.col(label_col).isNotNull()
    ).select(
        F.col(score_col).alias("__v"),
        F.col(label_col).cast("boolean").cast("int").alias("__l"),
    )
    splits = _split_points(base, ["__v"])["__v"]["splits"]
    cells = base.groupBy("__v").agg(
        F.sum("__l").cast("long").alias("__pos"),
        (F.count(F.lit(1)) - F.sum("__l")).cast("long").alias("__neg"),
    )
    if splits:
        # the prefix core reads cells twice (window + bucket totals);
        # LOCAL persist + eager collect below, so the cache is released
        # before returning instead of waiting on release_caches()
        cells = cells.persist()
    try:
        below = _running_below(cells, "__neg", "__bneg", splits)
        term = F.col("__pos").cast("decimal(38,0)") * (
            2 * F.col("__bneg") + F.col("__neg")
        ).cast("decimal(38,0)")
        agg = below.agg(
            F.sum("__pos").cast("long").alias("n_pos"),
            F.sum("__neg").cast("long").alias("n_neg"),
            F.sum(term).cast("decimal(38,0)").alias("__u2"),
        )
        out = agg.select(
            (F.col("n_pos") + F.col("n_neg")).cast("long").alias("n"),
            "n_pos",
            "n_neg",
            F.when(
                (F.col("n_pos") == 0) | (F.col("n_neg") == 0),
                F.lit(None).cast("long"),
            )
            .otherwise(
                F.expr(
                    "CAST((__u2 * 1000000) div "
                    "(2 * CAST(n_pos AS DECIMAL(38,0)) * n_neg) AS BIGINT)"
                )
            )
            .alias("auc_ppm"),
        )
        return df.sparkSession.createDataFrame(out.collect(), out.schema)
    finally:
        if splits:
            cells.unpersist()


def calibration_bins(
    df: DataFrame,
    score_col: str,
    label_col: str,
    *,
    n_bins: int = 10,
    lo: int,
    hi: int,
) -> DataFrame:
    """Reliability-diagram bins for an integer score against a boolean
    label — the calibration leg of classifier QA (confusion/kappa say
    WHETHER the model is right; calibration says whether its SCORE
    means what it claims: in a well-calibrated model the positive rate
    climbs monotonically with the score bin, and a flat tail screams
    "threshold on this at your peril"). Built for
    ``curate.classifier_score``'s integer micro-logits but any integer
    score works (quality_milli, lm scores).

    Bin assignment is pure integer arithmetic on a FIXED [lo, hi)
    grid — ``least(n_bins-1, (clamp(score, lo, hi) - lo) * n_bins div
    (hi-lo))`` — so the same score lands in the same bin in any
    engine; out-of-range scores clamp to the edge bins. Clamping BEFORE
    the multiply (not after, as a naive formulation would) bounds the
    product by ``(hi - lo) * n_bins`` — validated < 2^63 at entry — for
    scores anywhere in the int64 range, and leaves every ``div`` operand
    non-negative, so the truncate-vs-floor engine divergence of negative
    integer division can never arise. (``score_sum`` is an exact BIGINT
    sum of the RAW scores and can still overflow if many scores sit near
    the int64 extremes — a property of the output contract, not the
    binning.)
    Quantile-based bin edges would depend on the data and the engine's
    quantile algorithm; fixed edges are the reproducible choice and the
    caller knows the score scale.

    One map-side-combined groupBy at ``n_bins`` cardinality — nothing
    else touches the data. Rows with NULL score or NULL label are
    excluded (an unlabeled row calibrates nothing).

    Output per non-empty bin: ``(bin, n, n_pos, score_sum,
    pos_per_mille)`` — all exact integers (``pos_per_mille = n_pos*1000
    div n``); ``score_sum`` lets the caller derive exact mean scores.
    """
    n_bins = int(n_bins)
    lo, hi = int(lo), int(hi)
    if n_bins <= 0:
        raise ValueError(f"n_bins must be positive, got {n_bins}")
    if hi <= lo:
        raise ValueError(f"need hi > lo, got [{lo}, {hi})")
    if (hi - lo) > (2**63 - 1) // n_bins:
        # the clamp bounds s_cl - lo by (hi - lo), so this single check
        # keeps BOTH the subtraction and the multiply inside BIGINT
        raise ValueError(
            f"(hi - lo) * n_bins = {(hi - lo)} * {n_bins} would overflow "
            "BIGINT — shrink the grid range or bin count"
        )
    s = F.col(score_col).cast("long")
    # clamp the score to [lo, hi] BEFORE the multiply: (score-lo)*n_bins
    # would overflow BIGINT for scores near the int64 extremes (the
    # post-multiply clamp caught the sign but not the wrap), and a
    # clamped score lands in the same edge bin the old expression
    # targeted. Built from BOUND columns (__s below), never by splicing
    # score_col into SQL text — a column name needing backticks must not
    # break the expression.
    s_cl = F.greatest(F.lit(lo).cast("long"), F.least(F.lit(hi).cast("long"), F.col("__s")))
    raw = (s_cl - F.lit(lo)) * F.lit(n_bins)
    bin_ = F.least(
        F.lit(n_bins - 1).cast("long"),
        # exact integer floor division; operands are non-negative after
        # the clamp so Spark's truncating div == floor div
        F.expr(f"__raw div {hi - lo}"),
    ).cast("long")
    return (
        df.filter(s.isNotNull() & F.col(label_col).isNotNull())
        .select(
            s.alias("__s"),
            F.col(label_col).cast("boolean").cast("int").alias("__l"),
        )
        .withColumn("__raw", raw)
        .withColumn("bin", bin_)
        .select("bin", "__s", "__l")
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("__l").cast("long").alias("n_pos"),
            F.sum("__s").cast("long").alias("score_sum"),
        )
        .withColumn("pos_per_mille", F.expr("(n_pos * 1000) div n"))
    )
