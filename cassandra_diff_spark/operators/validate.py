"""Declarative data-quality validation: a rule set compiled into ONE
aggregation pass (plus one anti-join per foreign-key rule).

The reference validates schemas structurally (SURVEY.md §2.2 P9) but has
no row-content constraint surface; a training-data pipeline needs one —
the ingest gate that answers "how many rows violate each contract"
before a corpus is admitted. The design constraint at 100 TB is pass
count: N rules must NOT mean N scans. Here every row-local rule
(not_null / accepted_values / in_range / regex / custom predicate)
becomes a conditional-sum column in a single ``agg`` over one scan, and
uniqueness folds into the same aggregation as ``count(*) -
count_distinct(struct(cols))``. Foreign-key rules are the only ones that
need a second relation: each compiles to a LEFT ANTI join against the
(broadcast when dimension-sized) referenced keys — the join Catalyst
already optimizes.

Two consumption shapes:

* :func:`check_rules` — one row per rule: (rule, column, violations,
  total, pass). Kilobytes; the thing a scheduler gates on.
* :func:`violation_samples` — up to ``limit`` EXAMPLE rows per row-local
  rule (union of filtered limits — still pruned scans, no shuffle), for
  the human debugging the gate failure.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    """One declarative constraint. ``kind`` ∈ {not_null, accepted_values,
    in_range, regex_match, predicate, unique, foreign_key}. Row-local
    kinds evaluate in the fused single-pass aggregation; ``unique`` joins
    it via count-distinct; ``foreign_key`` costs one anti-join against
    ``ref`` (broadcast by default — dimension tables; pass
    ``broadcast_ref=False`` for fact-sized references)."""

    kind: str
    name: str
    columns: tuple
    values: tuple = ()
    lo: Optional[float] = None
    hi: Optional[float] = None
    pattern: Optional[str] = None
    predicate: Optional[Column] = field(default=None, compare=False)
    ref: Optional[DataFrame] = field(default=None, compare=False)
    ref_columns: tuple = ()
    broadcast_ref: bool = True


def not_null(*cols: str) -> Rule:
    return Rule("not_null", f"not_null({','.join(cols)})", tuple(cols))


def accepted_values(col: str, values: Sequence) -> Rule:
    return Rule(
        "accepted_values", f"accepted_values({col})", (col,), tuple(values)
    )


def in_range(col: str, lo=None, hi=None) -> Rule:
    return Rule("in_range", f"in_range({col})", (col,), lo=lo, hi=hi)


def regex_match(col: str, pattern: str) -> Rule:
    return Rule("regex_match", f"regex_match({col})", (col,), pattern=pattern)


def predicate(name: str, cond: Column, *cols: str) -> Rule:
    """Custom row-local constraint: ``cond`` must hold (null counts as a
    violation). ``cols`` is documentation-only (reported in the result)."""
    return Rule("predicate", name, tuple(cols), predicate=cond)


def unique(*cols: str) -> Rule:
    return Rule("unique", f"unique({','.join(cols)})", tuple(cols))


def foreign_key(
    cols: Sequence[str],
    ref: DataFrame,
    ref_cols: Sequence[str],
    *,
    broadcast_ref: bool = True,
) -> Rule:
    cols, ref_cols = tuple(cols), tuple(ref_cols)
    if len(cols) != len(ref_cols):
        raise ValueError("foreign_key column lists must align")
    return Rule(
        "foreign_key",
        f"foreign_key({','.join(cols)})",
        cols,
        ref=ref,
        ref_columns=ref_cols,
        broadcast_ref=broadcast_ref,
    )


def _violation_cond(rule: Rule) -> Column:
    """Row-local violation condition (true => the row violates). Null
    handling: not_null flags nulls; the other row-local kinds treat a
    null as NOT a violation (compose with not_null to forbid nulls) —
    the coalesce makes that explicit rather than null-propagated."""
    c = F.col(rule.columns[0]) if rule.columns else None
    if rule.kind == "not_null":
        conds = [F.col(x).isNull() for x in rule.columns]
        out = conds[0]
        for x in conds[1:]:
            out = out | x
        return out
    if rule.kind == "accepted_values":
        return F.coalesce(~c.isin(list(rule.values)), F.lit(False))
    if rule.kind == "in_range":
        conds = []
        if rule.lo is not None:
            conds.append(c < F.lit(rule.lo))
        if rule.hi is not None:
            conds.append(c > F.lit(rule.hi))
        if not conds:
            return F.lit(False)
        out = conds[0]
        for x in conds[1:]:
            out = out | x
        return F.coalesce(out, F.lit(False))
    if rule.kind == "regex_match":
        return F.coalesce(~c.rlike(rule.pattern), F.lit(False))
    if rule.kind == "predicate":
        return F.coalesce(~rule.predicate, F.lit(True))
    raise ValueError(f"rule kind {rule.kind!r} is not row-local")


_ROW_LOCAL = {"not_null", "accepted_values", "in_range", "regex_match", "predicate"}


def check_rules(df: DataFrame, rules: Sequence[Rule]) -> DataFrame:
    """Evaluate every rule; one output row per rule:
    ``(rule, columns, violations, total, pass)``.

    Cost: ONE scan for all row-local + unique rules (fused conditional
    sums and count-distincts in a single aggregation) + one anti-join
    scan pair per foreign-key rule. The result is ≤ len(rules) rows.
    """
    rules = list(rules)
    if not rules:
        raise ValueError("empty rule set")
    names = [r.name for r in rules]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate rule names: {sorted(names)}")

    aggs = [F.count(F.lit(1)).alias("__total")]
    fused = [r for r in rules if r.kind in _ROW_LOCAL or r.kind == "unique"]
    for i, r in enumerate(fused):
        if r.kind == "unique":
            aggs.append(
                (
                    F.count(F.lit(1))
                    - F.count_distinct(F.struct(*[F.col(c) for c in r.columns]))
                ).alias(f"__v{i}")
            )
        else:
            aggs.append(
                F.sum(_violation_cond(r).cast("long")).alias(f"__v{i}")
            )
    one = df.agg(*aggs)
    if any(r.kind == "foreign_key" for r in rules):
        # the 1-row fused agg feeds BOTH the per-rule explode and each
        # foreign-key row's total column; without materialization every
        # FK rule would re-run the full-table scan behind it
        from cassandra_diff_spark.operators import tracked_cache

        one = tracked_cache(one)

    out = None
    if fused:
        out = one.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(r.name).alias("rule"),
                            F.lit(",".join(r.columns)).alias("columns"),
                            F.coalesce(F.col(f"__v{i}"), F.lit(0))
                            .cast("long")
                            .alias("violations"),
                            F.col("__total").cast("long").alias("total"),
                        )
                        for i, r in enumerate(fused)
                    ]
                )
            ).alias("r")
        ).select("r.*")
    total_col = one.select(F.col("__total"))
    for r in rules:
        if r.kind != "foreign_key":
            continue
        ref = r.ref.select(
            *[F.col(rc).alias(c) for c, rc in zip(r.columns, r.ref_columns)]
        ).dropDuplicates(list(r.columns))
        if r.broadcast_ref:
            ref = F.broadcast(ref)
        # null FK values are not violations (optional relationships);
        # the anti-join would keep them, so pre-filter to non-null keys
        nn = df
        for c in r.columns:
            nn = nn.filter(F.col(c).isNotNull())
        viol = nn.join(ref, on=list(r.columns), how="left_anti").agg(
            F.count(F.lit(1)).cast("long").alias("violations")
        )
        row = viol.crossJoin(total_col).select(
            F.lit(r.name).alias("rule"),
            F.lit(",".join(r.columns)).alias("columns"),
            "violations",
            F.col("__total").cast("long").alias("total"),
        )
        out = row if out is None else out.unionByName(row)
    return out.withColumn("pass", F.col("violations") == 0)


def violation_samples(
    df: DataFrame, rules: Sequence[Rule], *, limit: int = 5
) -> DataFrame:
    """Up to ``limit`` example violating rows per rule, each tagged with
    the rule name (first column), for the human debugging a failed gate.

    Cost per rule kind:

    * row-local — a filtered+limited branch: Catalyst pushes the filter
      to the scan and the limit stops early; no shuffle.
    * unique — one aggregation finds up to ``limit`` COLLIDED KEYS
      (kilobytes), then a broadcast semi-join pulls their rows back:
      witnesses arrive in colliding GROUPS (every row of a sampled key,
      the pair a human actually wants to eyeball), so the row count can
      exceed ``limit`` when a sampled key has many duplicates.
    * foreign_key — the orphan rows themselves (the same anti-join
      :func:`check_rules` counts), limited.
    """
    branches = []
    for r in rules:
        if r.kind in _ROW_LOCAL:
            branches.append(
                df.filter(_violation_cond(r))
                .limit(limit)
                .select(F.lit(r.name).alias("rule"), "*")
            )
        elif r.kind == "unique":
            dup_keys = (
                df.groupBy(*[F.col(c) for c in r.columns])
                .agg(F.count(F.lit(1)).alias("__n"))
                .filter(F.col("__n") > 1)
                .select(*r.columns)
                .limit(limit)
            )
            branches.append(
                df.join(F.broadcast(dup_keys), on=list(r.columns), how="left_semi")
                .select(F.lit(r.name).alias("rule"), *df.columns)
            )
        elif r.kind == "foreign_key":
            ref = r.ref.select(
                *[F.col(rc).alias(c) for c, rc in zip(r.columns, r.ref_columns)]
            ).dropDuplicates(list(r.columns))
            if r.broadcast_ref:
                ref = F.broadcast(ref)
            nn = df
            for c in r.columns:
                nn = nn.filter(F.col(c).isNotNull())
            branches.append(
                nn.join(ref, on=list(r.columns), how="left_anti")
                .limit(limit)
                .select(F.lit(r.name).alias("rule"), *df.columns)
            )
    if not branches:
        raise ValueError("no rules to sample")
    out = branches[0]
    for b in branches[1:]:
        out = out.unionByName(b)
    return out


def rules_from_config(rule_cfgs, resolve_ref=None) -> list:
    """Materialize :class:`~cassandra_diff_spark.config.
    ValidationRuleConfig` entries into :class:`Rule`s. ``resolve_ref``:
    fn(table_name) -> DataFrame for foreign_key references (required iff
    any FK rule is present). YAML ``expr`` rules compile through
    ``F.expr`` — any SQL boolean over the row's columns."""
    out = []
    for rc in rule_cfgs:
        if rc.kind == "not_null":
            out.append(not_null(*rc.columns))
        elif rc.kind == "accepted_values":
            out.append(accepted_values(rc.columns[0], list(rc.values)))
        elif rc.kind == "in_range":
            out.append(in_range(rc.columns[0], lo=rc.lo, hi=rc.hi))
        elif rc.kind == "regex_match":
            out.append(regex_match(rc.columns[0], rc.pattern))
        elif rc.kind == "expr":
            out.append(
                predicate(rc.name or f"expr({rc.expr})", F.expr(rc.expr), *rc.columns)
            )
        elif rc.kind == "unique":
            out.append(unique(*rc.columns))
        elif rc.kind == "foreign_key":
            if resolve_ref is None:
                raise ValueError(
                    "foreign_key rule requires a ref resolver (reading "
                    f"{rc.ref_table!r})"
                )
            out.append(
                foreign_key(rc.columns, resolve_ref(rc.ref_table), rc.ref_columns)
            )
        else:
            raise ValueError(f"unknown validation rule kind {rc.kind!r}")
    return out


def profile_table(
    df: DataFrame,
    cols: Optional[Sequence[str]] = None,
    *,
    distinct: Optional[str] = "exact",
) -> DataFrame:
    """Column-statistics profile: one output row per column —
    ``(column, dtype, n, n_null, n_distinct, min_value, max_value,
    mean)`` — the table-shape summary a pipeline snapshots next to every
    corpus version (and the input a human checks before writing
    validation rules).

    min/max are stringified for a uniform schema; ``mean`` fills for
    numeric columns only. One aggregation pass over one scan; the only
    scale caveat is ``distinct``:

    * ``"exact"`` (default): ``count_distinct`` per column — Catalyst
      plans C distinct aggregates as an Expand (C x input rows through
      the shuffle). Right for profiling a sample or a dimension table,
      and for the oracle gate; wrong for 100 TB.
    * ``"approx"``: HyperLogLog++ ``approx_count_distinct`` — single
      pass, no Expand, ~2% error; the 100 TB setting.
    * ``None``: skip distinct counts (null column).
    """
    if distinct not in ("exact", "approx", None):
        raise ValueError(f"distinct must be exact|approx|None, got {distinct!r}")
    types = dict(df.dtypes)
    cols = list(cols) if cols is not None else list(df.columns)
    numeric = {
        c
        for c in cols
        if types[c] in ("tinyint", "smallint", "int", "bigint", "float", "double")
        or types[c].startswith("decimal")
    }
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(cols):
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"__null{i}"))
        if distinct == "exact":
            aggs.append(F.count_distinct(F.col(c)).alias(f"__d{i}"))
        elif distinct == "approx":
            aggs.append(F.approx_count_distinct(F.col(c)).alias(f"__d{i}"))
        aggs.append(F.min(F.col(c)).cast("string").alias(f"__min{i}"))
        aggs.append(F.max(F.col(c)).cast("string").alias(f"__max{i}"))
        if c in numeric:
            aggs.append(F.avg(F.col(c)).cast("double").alias(f"__avg{i}"))
    one = df.agg(*aggs)
    return one.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.lit(types[c]).alias("dtype"),
                        F.col("__n").cast("long").alias("n"),
                        F.col(f"__null{i}").cast("long").alias("n_null"),
                        (
                            F.col(f"__d{i}").cast("long")
                            if distinct is not None
                            else F.lit(None).cast("long")
                        ).alias("n_distinct"),
                        F.col(f"__min{i}").alias("min_value"),
                        F.col(f"__max{i}").alias("max_value"),
                        (
                            F.col(f"__avg{i}")
                            if c in numeric
                            else F.lit(None).cast("double")
                        ).alias("mean"),
                    )
                    for i, c in enumerate(cols)
                ]
            )
        ).alias("r")
    ).select("r.*")


def numeric_correlations(
    df: DataFrame,
    cols: Sequence[str],
    *,
    scale: int = 1000,
) -> DataFrame:
    """Pearson correlation matrix of numeric columns — the
    column-relationship half of table profiling (is price still a
    function of quantity after tonight's load? did a join bug decouple
    two columns that always moved together?).

    Exact-arithmetic discipline: values quantize to ``1/scale`` units
    and every moment (``S_i``, ``S_ij``) accumulates as an EXACT
    ``decimal(38,0)`` integer — order-free, map-side-combinable, and
    reproducible in any engine with 128-bit sums (DuckDB's HUGEINT
    oracle matches bit-for-bit). Each output double is then a fixed
    expression over exact integers:

        cov  = (n*S_ij - S_i*S_j) / (n^2 * scale^2)
        corr = (n*S_ij - S_i*S_j) / sqrt((n*S_ii - S_i^2)(n*S_jj - S_j^2))

    with ``corr`` NULL when either column has zero variance.

    Scale shape: ONE aggregation scan with ``k + k(k+1)/2 + 1`` fused
    sums (map-side combined — the shuffle carries one partial row per
    task, never data); the pair expansion runs on the single aggregated
    row via an in-plan explode, so nothing reaches the driver.
    Rows with a NULL in ANY requested column are excluded (listwise
    deletion — the covariance of a pair is otherwise over an undefined
    row set).

    The reference engine has no statistics surface; this extends
    :func:`profile_table` the way ``embedding_covariance`` extends
    centroids.
    """
    cols = list(cols)
    if len(cols) < 2:
        raise ValueError(f"need at least 2 columns, got {cols}")
    base = df
    for c in cols:
        base = base.filter(F.col(c).isNotNull())
    q = base.select(
        *[
            F.round(F.col(c).cast("double") * int(scale))
            .cast("long")
            .alias(f"__q{i}")
            for i, c in enumerate(cols)
        ]
    )
    dec = "decimal(38,0)"
    aggs = [F.count(F.lit(1)).cast("long").alias("__n")]
    for i in range(len(cols)):
        aggs.append(F.sum(F.col(f"__q{i}").cast(dec)).alias(f"__s{i}"))
    for i in range(len(cols)):
        for j in range(i, len(cols)):
            aggs.append(
                F.sum(
                    F.col(f"__q{i}").cast(dec) * F.col(f"__q{j}").cast(dec)
                ).alias(f"__p{i}_{j}")
            )
    m = q.agg(*aggs)

    nd = F.col("__n").cast(dec)
    pairs = []
    for i in range(len(cols)):
        for j in range(i, len(cols)):
            m2 = (nd * F.col(f"__p{i}_{j}") - F.col(f"__s{i}") * F.col(f"__s{j}")).cast(dec)
            vii = (nd * F.col(f"__p{i}_{i}") - F.col(f"__s{i}") * F.col(f"__s{i}")).cast(dec)
            vjj = (nd * F.col(f"__p{j}_{j}") - F.col(f"__s{j}") * F.col(f"__s{j}")).cast(dec)
            denom = F.col("__n").cast("double") * F.col("__n").cast("double") * float(
                int(scale) * int(scale)
            )
            pairs.append(
                F.struct(
                    F.lit(cols[i]).alias("col_i"),
                    F.lit(cols[j]).alias("col_j"),
                    F.col("__n").alias("n"),
                    (m2.cast("double") / denom).alias("cov"),
                    F.when(
                        (vii == F.lit(0).cast(dec)) | (vjj == F.lit(0).cast(dec)),
                        F.lit(None).cast("double"),
                    )
                    .otherwise(
                        m2.cast("double")
                        / F.sqrt(vii.cast("double") * vjj.cast("double"))
                    )
                    .alias("corr"),
                )
            )
    return m.select(F.explode(F.array(*pairs)).alias("r")).select("r.*")


def profile_drift(cur: DataFrame, ref: DataFrame) -> DataFrame:
    """Column-level drift between two :func:`profile_table` snapshots —
    the profiles triad's comparison step (digests compare rows,
    centroid_shift compares embeddings, this compares column shapes):
    run it on tonight's profile vs the persisted reference and alert on
    schema drift, null-rate spikes, cardinality collapse, or range
    excursions WITHOUT rescanning either table — both inputs are
    kilobyte frames.

    Full-outer on column name (a column present on one side only drifts
    by existence: dtype_changed is true, missing-side facts are NULL).
    Exactness: null rates are integer ppm via ``div`` (no float
    division), distinct deltas are raw integers, min/max comparison is
    null-safe string equality — so the output is engine-exact (the
    `mean` field is deliberately NOT compared: it is a float average
    whose bits are summation-order-dependent).
    """
    def side(df, tag):
        return df.select(
            F.col("column"),
            F.col("dtype").alias(f"{tag}_dtype"),
            F.col("n").alias(f"{tag}_n"),
            F.col("n_null").alias(f"{tag}_null"),
            F.col("n_distinct").alias(f"{tag}_distinct"),
            F.col("min_value").alias(f"{tag}_min"),
            F.col("max_value").alias(f"{tag}_max"),
        )

    j = side(cur, "cur").join(side(ref, "ref"), "column", "full_outer")

    def ppm(tag):
        return F.when(
            F.col(f"{tag}_n").isNull() | (F.col(f"{tag}_n") == 0),
            F.lit(None).cast("long"),
        ).otherwise(F.expr(f"({tag}_null * 1000000) div {tag}_n").cast("long"))

    return j.select(
        "column",
        (~F.col("cur_dtype").eqNullSafe(F.col("ref_dtype"))).alias(
            "dtype_changed"
        ),
        F.col("cur_n").cast("long").alias("n_cur"),
        F.col("ref_n").cast("long").alias("n_ref"),
        ppm("cur").alias("null_ppm_cur"),
        ppm("ref").alias("null_ppm_ref"),
        (ppm("cur") - ppm("ref")).cast("long").alias("null_ppm_delta"),
        F.col("cur_distinct").cast("long").alias("distinct_cur"),
        F.col("ref_distinct").cast("long").alias("distinct_ref"),
        (F.col("cur_distinct") - F.col("ref_distinct"))
        .cast("long")
        .alias("distinct_delta"),
        (~F.col("cur_min").eqNullSafe(F.col("ref_min"))).alias("min_changed"),
        (~F.col("cur_max").eqNullSafe(F.col("ref_max"))).alias("max_changed"),
    )


#: Distinct values per rank bucket before another bucket is added.
_RANK_BUCKET_ROWS = 4_096
#: Max rank buckets — bucket assignment is a linear scan of the literal
#: boundary array per row (JVM codegen, <=256 compares), so the cap bounds
#: the per-row cost; 256 buckets keeps a 1e9-distinct column at ~4M
#: distinct values per sorted task. A two-level (coarse/fine) scan would
#: lift this to 4096 if ever needed.
_RANK_MAX_BUCKETS = 256
#: Sampled values per boundary (collect <= 32 * 256 = 8192 values).
_RANK_SAMPLE_PER_BUCKET = 32


def _rank_buckets(acd: int) -> int:
    return int(min(_RANK_MAX_BUCKETS, max(1, acd // _RANK_BUCKET_ROWS)))


def _split_points_from_sample(values: list, n_buckets: int) -> list:
    """Evenly spaced order statistics of a sorted hash-sample — buckets
    hold roughly equal DISTINCT-value counts (balance robust to
    duplicate skew: a rank map has one row per distinct value).
    Returns ``[]`` when the sample is too thin to split reliably."""
    if n_buckets <= 1 or len(values) < 2 * n_buckets:
        return []
    step = len(values) / n_buckets
    return [values[int(k * step)] for k in range(1, n_buckets)]


def _split_points(base: DataFrame, cols: Sequence[str]) -> dict[str, dict]:
    """Per-column literal split boundaries for range-partitioned prefix
    sums — TWO bounded jobs total for ALL columns: an
    ``approx_count_distinct`` pass sizes the bucketing (HLL++ is
    hash-based and order-free, hence deterministic), then ONE
    ``collect_set`` pass gathers a <=8k-value hash-sample per
    high-cardinality column (the ``when()`` leaves non-sampled rows
    null, which collect_set drops). Returns
    ``{col: {"splits": [...], "acd": int}}``; ``splits`` is ``[]`` for
    small columns. Exactness never depends on the output — boundaries
    only place buckets."""
    cols = list(cols)
    dtypes = dict(base.dtypes)
    acd_row = base.agg(
        *[F.approx_count_distinct(c).alias(c) for c in cols]
    ).first()
    acds = {c: int(acd_row[c]) for c in cols}
    big = [c for c in cols if _rank_buckets(acds[c]) > 1]
    samples: dict[str, list] = {}
    if big:
        aggs = []
        for c in big:
            rate = max(
                1, acds[c] // (_RANK_SAMPLE_PER_BUCKET * _rank_buckets(acds[c]))
            )
            # xxhash64, not md5: the sample only places bucket
            # boundaries (prefix sums are exact for ANY boundaries), so
            # run-determinism suffices — no cross-engine hash needed —
            # and xxhash64 is far cheaper per row than md5+conv
            cond = F.pmod(F.xxhash64(F.col(c)), F.lit(rate)) == 0
            if dtypes[c] in ("float", "double"):
                # NaN sorts greater-than-everything in Spark; keep it out
                # of the Python sort below (NaN rows still bucket — they
                # land in the last bucket, where NaN compares greater).
                cond = cond & ~F.isnan(F.col(c))
            aggs.append(F.collect_set(F.when(cond, F.col(c))).alias(c))
        samp_row = base.agg(*aggs).first()
        for c in big:
            samples[c] = sorted(samp_row[c])
    return {
        c: {
            "splits": _split_points_from_sample(
                samples.get(c, []), _rank_buckets(acds[c])
            ),
            "acd": acds[c],
        }
        for c in cols
    }


def _running_below(
    vals: DataFrame, weight_col: str, below_alias: str, splits: list
) -> DataFrame:
    """``vals`` (a distinct-``__v`` frame) + ``below_alias`` = the exact
    BIGINT total of ``weight_col`` over rows with STRICTLY smaller
    ``__v`` — the shared range-partitioned prefix-sum core of the rank
    map (weight = row count) and exact AUC (weight = negative count):
    an order-preserving bucket from literal ``splits`` boundaries, a
    window PARTITIONED by bucket for in-bucket prefixes, and
    cross-bucket offsets from a triangular broadcast join of the
    <=257-row per-bucket totals. ``splits`` must be sorted ascending;
    ``[]`` degrades to one bucket."""
    from pyspark.sql import Window

    if not splits:
        # single bucket: the column's approx distinct count proved the
        # frame small (< 2 * _RANK_BUCKET_ROWS), so one sorted task is
        # correct AND cheap, and no cross-bucket offsets exist. The
        # zeroed hash (non-foldable) keeps the window PARTITIONED in
        # the plan — Catalyst folds a literal partition key away and
        # the library invariant "no unpartitioned WindowExec" stays
        # assertable over every consuming plan, big or small.
        w0 = (
            Window.partitionBy(F.pmod(F.xxhash64(F.col("__v")), F.lit(1)))
            .orderBy("__v")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        return vals.select(
            "*",
            F.coalesce(F.sum(weight_col).over(w0), F.lit(0))
            .cast("long")
            .alias(below_alias),
        )
    b_arr = F.array(*[F.lit(s) for s in splits])
    bucket = F.aggregate(
        b_arr,
        F.lit(0),
        lambda acc, b: acc
        + F.when(F.col("__v") >= b, F.lit(1)).otherwise(F.lit(0)),
    )
    vals = vals.withColumn("__bk", bucket)
    w = (
        Window.partitionBy("__bk")
        .orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    loc = vals.select(
        "*", F.coalesce(F.sum(weight_col).over(w), F.lit(0)).alias("__lpre")
    )
    # per-bucket totals (<= len(splits)+1 rows) -> cumulative offsets
    # via a triangular broadcast join, NOT a window: the consuming plan
    # then contains no unpartitioned WindowExec at all (plan-asserted).
    # Both this branch and the window read ``vals`` — callers cache it
    # for split columns, so the data aggregates exactly once.
    tot = vals.groupBy("__bk").agg(F.sum(weight_col).alias("__t"))
    lower = tot.select(F.col("__bk").alias("__bk2"), F.col("__t").alias("__t2"))
    offs = (
        tot.join(F.broadcast(lower), F.col("__bk2") < F.col("__bk"), "left")
        .groupBy("__bk")
        .agg(F.coalesce(F.sum("__t2"), F.lit(0)).alias("__off"))
    )
    return (
        loc.join(F.broadcast(offs), "__bk")
        .withColumn(
            below_alias,
            (F.col("__off") + F.col("__lpre")).cast("long"),
        )
        .drop("__bk", "__lpre", "__off")
    )


def _rank_map(vals: DataFrame, rank_alias: str, splits: list) -> DataFrame:
    """``(__v, rank_alias)`` map over a (cached) distinct-value frame
    ``(__v, __cnt)``: doubled average rank ``2*(#rows < v) + count(v)
    + 1`` as an exact BIGINT over the :func:`_running_below` core (see
    :func:`spearman_correlations` scale notes)."""
    below = _running_below(vals, "__cnt", "__below", splits)
    return below.select(
        "__v",
        (2 * F.col("__below") + F.col("__cnt") + 1)
        .cast("long")
        .alias(rank_alias),
    )


def spearman_correlations(
    df: DataFrame,
    cols: Sequence[str],
    *,
    broadcast_rank_map_bytes: int = 48 * 1024 * 1024,
) -> DataFrame:
    """Spearman rank correlation matrix — the monotone-association
    member of the profiling family (:func:`numeric_correlations` is
    linear Pearson; MI/chi2/Cramer's V are categorical): robust to
    outliers and to any monotone rescaling, so it answers "do these
    columns still move together" even when a unit change or a heavy
    tail wrecks the Pearson number.

    Exact to the bit in any engine, because nothing here is
    approximate: ties get textbook AVERAGE ranks, carried as the
    INTEGER ``2*avg_rank = 2*(#rows < v) + count(v) + 1``, and the
    correlation of the doubled ranks (invariant to the doubling) runs
    through :func:`numeric_correlations`' exact ``decimal(38,0)``
    moment machinery at ``scale=1`` — doubled ranks are already
    integers, so quantization is the identity.

    Scale shape: the naive formulation ranks with a GLOBAL window — a
    single-task sort of the whole table. Instead each column builds a
    value->rank MAP at distinct-VALUE cardinality (one map-side-combined
    groupBy per column) and the data joins each map back by value
    (broadcast when small, hash join at worst). The cumulative
    #less-than count inside the map is a RANGE-PARTITIONED prefix sum,
    never a global window: TWO bounded prep jobs total size and sample
    every column at once (an ``approx_count_distinct`` pass — HLL++ is
    hash-based and order-free, hence deterministic — then one
    ``collect_set`` pass gathering a <=8k-value hash-sample per
    high-cardinality column), the sorted sample's order statistics
    become literal split boundaries, every value gets an
    order-preserving bucket from them, a window PARTITIONED by bucket
    computes in-bucket prefixes, and cross-bucket offsets come from a
    triangular broadcast join of the <=257-row per-bucket totals
    (bucketed columns cache their distinct frame so the prefix window
    and the totals branch share one aggregation — the
    ``quantiles_refined`` ``tracked_cache`` discipline). A continuous
    column with distinct ~ n (l_extendedprice: 583k distinct of 600k
    rows at sf0.1, billions at 100 TB) therefore ranks as ~bucket-count
    parallel sorted tasks, not one. Boundaries are literals, so bucket
    assignment is a pure function of the value — every plan branch
    agrees by construction (``spark_partition_id`` after
    ``repartitionByRange`` would NOT: range boundaries re-sample per
    exchange materialization, and two branches could disagree); and
    ranks are EXACT for any boundary placement, so the approximate
    sizing never touches the output. The k rank maps are built over the
    SAME listwise-complete row set, so every pair is computed over one
    consistent population (documented semantics — pairwise deletion
    would rank each pair differently). Long-lived sessions should call
    ``operators.release_caches()`` after materializing the result.

    Output: ``(col_i, col_j, n, rho)`` for i <= j; ``rho`` NULL when a
    column is constant (zero rank variance), diagonal 1.0 otherwise.
    """
    cols = list(cols)
    if len(cols) < 2:
        raise ValueError(f"need at least 2 columns, got {cols}")
    base = df
    for c in cols:
        base = base.filter(F.col(c).isNotNull())
    base = base.select(*cols)
    points = _split_points(base, cols)

    from cassandra_diff_spark.operators import tracked_cache

    ranked = base
    for i, c in enumerate(cols):
        splits = points[c]["splits"]
        vals = base.groupBy(F.col(c).alias("__v")).agg(
            F.count(F.lit(1)).alias("__cnt")
        )
        if splits:
            # the bucketed rank map reads vals twice (prefix window +
            # bucket totals); the cache materializes lazily inside the
            # consuming action and keeps the data aggregation single-pass
            vals = tracked_cache(vals)
        rmap = _rank_map(vals, f"__r{i}", splits)
        # SIZE-ADAPTIVE join strategy (r12, guide §3.1): Catalyst's
        # post-aggregation size estimate for the rank map is garbage, so
        # a continuous column's join-back planned as SortMergeJoin —
        # shuffling the whole data side — even when the map was a few
        # MB. The measured approx_count_distinct bounds the map's true
        # size (one ~24-byte row per distinct value); broadcast below
        # ~2M distinct (~48 MB built by default), shuffle-join above —
        # a billion-distinct column at 100 TB still takes the shuffle
        # path. ``broadcast_rank_map_bytes`` is the deployment knob
        # (0 forces the shuffle path; ranks are exact either way).
        if points[c]["acd"] * 24 <= broadcast_rank_map_bytes:
            rmap = F.broadcast(rmap)
        ranked = ranked.join(rmap, ranked[c] == rmap["__v"], "inner").drop("__v")
    ranked = ranked.select(
        *[F.col(f"__r{i}").alias(cols[i]) for i in range(len(cols))]
    )
    out = numeric_correlations(ranked, cols, scale=1)
    return out.select("col_i", "col_j", "n", F.col("corr").alias("rho"))


def kendall_tau(
    df: DataFrame,
    x_col: str,
    y_col: str,
    *,
    max_cells: int = 4096,
) -> DataFrame:
    """Kendall's tau-b — the third member of the numeric-association
    family (:func:`numeric_correlations` = linear, :func:`spearman_correlations`
    = monotone-by-rank, tau = monotone-by-concordance): the probability
    a random row pair moves the same way in both columns, minus the
    probability it moves oppositely, tie-corrected. Preferred over
    Spearman when the columns are coarse/ordinal (few distinct levels,
    heavy ties) — exactly the regime this implementation is shaped for.

    The naive definition scans all n(n-1)/2 ROW pairs — dead at any
    scale. But tau depends only on the JOINT DISTRIBUTION: with cell
    counts ``n_xy`` over distinct (x, y) values,

        S  = C - D = sum over cell pairs of n_i * n_j * sign_x * sign_y
        n0 = n(n-1)/2,  n1 = sum_x C(n_x, 2),  n2 = sum_y C(n_y, 2)
        tau_b = S / sqrt((n0 - n1) * (n0 - n2))

    so the data is touched by ONE map-side-combined groupBy at cell
    cardinality, and the pairwise term is a self-join of the KILOBYTE
    cell frame (i < j by (x, y) struct order; ties in either column
    contribute sign 0 and drop out of S by construction). All of S,
    n0, n1, n2 are exact BIGINTs (n <= ~3e9 rows keeps n0 < 2^63); the
    denominator product runs in exact ``decimal(38,0)``/HUGEINT (max
    ~2e37 fits) and takes ONE sqrt of its correctly-rounded double cast
    (DuckDB via the VARCHAR route) — separate sqrt factors would lose a
    ULP and score a perfect ordering 0.9999999999999998.

    Cell cardinality is the scale contract: FAIL-FAST capped at
    ``max_cells`` (the MAX_DRIVER_QUERIES discipline — 4096 cells =
    ~8M in-plan pair rows) with the remedy in the error: quantize or
    bin continuous columns first (:func:`...stats.histogram_counts`
    bins, or ``F.round``) — tau over bins is tau over a coarser
    ordinal scale, a documented semantic, not an approximation bug.

    Output: one row ``(n, s, n0, n1, n2, tau_b)``; ``tau_b`` NULL when
    either column is constant (zero denominator). NULLs in either
    column are excluded pairwise (a NULL has no order position).

    EAGER by contract: the call runs the Spark job (cap probe + tau
    assembly) and returns the one-row result already materialized, so
    the internal cell cache never outlives the call. Composing this
    lazily is not supported; failures surface at invocation.
    """
    cells = (
        df.filter(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
        .groupBy(F.col(x_col).alias("x"), F.col(y_col).alias("y"))
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    # persist: the cap probe is a separate job from the final plan, and
    # the final plan references cells from four subtrees (s/tot/tx/ty) —
    # without the cache the data-sized groupBy re-runs up to five times
    # (the bpe_train_incremental persist/finally pattern; the one-row
    # result is materialized below so the cache can be dropped before
    # returning)
    cells = cells.persist()
    try:
        n_cells = cells.limit(int(max_cells) + 1).count()
        if n_cells > int(max_cells):
            raise ValueError(
                f"more than max_cells={max_cells} distinct ({x_col}, {y_col}) "
                "cells — the cell-pair join would no longer be kilobyte-"
                "scale; bin or quantize the columns first (tau over bins is "
                "tau over a coarser ordinal scale — see kendall_tau_binned), "
                "or raise the cap"
            )
        return _kendall_from_cells(cells)
    finally:
        cells.unpersist()


def kendall_tau_binned(
    df: DataFrame,
    x_col: str,
    y_col: str,
    *,
    x_lo: float,
    x_width: float,
    x_bins: int,
    y_lo: float,
    y_width: float,
    y_bins: int,
    max_cells: int = 4096,
) -> DataFrame:
    """Kendall's tau-b over FIXED-GRID bins — the composition
    :func:`kendall_tau`'s fail-fast error points at: continuous columns
    whose joint distinct cells exceed ``max_cells`` (the regime where
    the cell-pair join stops being kilobyte-scale) are first quantized
    onto the ``histogram_counts`` equal-width grid, then tau runs over
    the bin indices. The semantics are documented and honest: tau over
    bins is tau OVER A COARSER ORDINAL SCALE — in-bin orderings
    collapse to ties (which tau-b's denominator corrects for), so the
    statistic measures monotone association at the grid's resolution,
    not an approximation of raw tau with a hidden error bar.

    Binning reuses the exact cross-engine expression of the binned
    quantile/JS gates (``floor((v - lo)/width)`` in IEEE double, clamped
    to the edge bins — sub/div/floor are correctly rounded, so any
    engine bins identically), and the bin-cell cardinality is bounded
    A PRIORI by ``x_bins * y_bins <= max_cells`` — validated up front,
    no probe job needed (unlike raw :func:`kendall_tau`, whose cell
    count is data-dependent). One data-sized map-side-combined groupBy;
    everything after runs on the <= ``max_cells``-row cell frame.

    Output schema matches :func:`kendall_tau`:
    ``(n, s, n0, n1, n2, tau_b)``. EAGER by contract, like
    :func:`kendall_tau`: the one-row result comes back materialized and
    the internal cell cache is dropped before returning.
    """
    from cassandra_diff_spark.operators.stats import _bin_expr

    x_bins, y_bins = int(x_bins), int(y_bins)
    if x_bins <= 0 or y_bins <= 0:
        raise ValueError(f"bin counts must be positive, got {x_bins}, {y_bins}")
    if x_bins * y_bins > int(max_cells):
        raise ValueError(
            f"x_bins * y_bins = {x_bins * y_bins} exceeds max_cells="
            f"{max_cells}: coarsen the grid (the cell-pair join is "
            "quadratic in cells)"
        )
    vx = F.col(x_col).cast("double")
    vy = F.col(y_col).cast("double")
    cells = (
        df.filter(vx.isNotNull() & vy.isNotNull())
        .groupBy(
            _bin_expr(x_col, x_lo, x_width, x_bins).alias("x"),
            _bin_expr(y_col, y_lo, y_width, y_bins).alias("y"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    cells = cells.persist()
    try:
        return _kendall_from_cells(cells)
    finally:
        cells.unpersist()


def _kendall_from_cells(cells: DataFrame) -> DataFrame:
    """tau-b assembly over a (persisted) ``(x, y, c)`` cell frame; the
    one-row result is EAGERLY materialized so the caller can unpersist
    before returning."""
    a = cells.select(
        F.col("x").alias("xa"), F.col("y").alias("ya"), F.col("c").alias("ca")
    )
    b = cells.select(
        F.col("x").alias("xb"), F.col("y").alias("yb"), F.col("c").alias("cb")
    )
    pair_cond = (F.col("xa") < F.col("xb")) | (
        (F.col("xa") == F.col("xb")) & (F.col("ya") < F.col("yb"))
    )
    sgn = (
        F.when(F.col("ya") < F.col("yb"), F.lit(1))
        .when(F.col("ya") > F.col("yb"), F.lit(-1))
        .otherwise(F.lit(0))
    )
    # xa == xb pairs are x-ties: sign_x = 0, contribute nothing to S
    s_frame = (
        a.join(b, pair_cond)
        .select(
            F.when(F.col("xa") == F.col("xb"), F.lit(0).cast("long"))
            .otherwise(F.col("ca") * F.col("cb") * sgn.cast("long"))
            .alias("term")
        )
        .agg(F.coalesce(F.sum("term"), F.lit(0)).cast("long").alias("s"))
    )
    tot = cells.agg(F.sum("c").cast("long").alias("n"))
    tx = (
        cells.groupBy("x")
        .agg(F.sum("c").alias("cx"))
        .agg(
            F.coalesce(F.sum(F.expr("cx * (cx - 1) div 2")), F.lit(0))
            .cast("long")
            .alias("n1")
        )
    )
    ty = (
        cells.groupBy("y")
        .agg(F.sum("c").alias("cy"))
        .agg(
            F.coalesce(F.sum(F.expr("cy * (cy - 1) div 2")), F.lit(0))
            .cast("long")
            .alias("n2")
        )
    )
    out = (
        tot.crossJoin(F.broadcast(s_frame))
        .crossJoin(F.broadcast(tx))
        .crossJoin(F.broadcast(ty))
        .select(
            "n",
            "s",
            F.expr("n * (n - 1) div 2").cast("long").alias("n0"),
            "n1",
            "n2",
        )
    )
    out = out.select(
        "n",
        "s",
        "n0",
        "n1",
        "n2",
        F.when(
            (F.col("n0") == F.col("n1")) | (F.col("n0") == F.col("n2")),
            F.lit(None).cast("double"),
        )
        .otherwise(
            # denominator as ONE sqrt of the exact decimal(38,0) product
            # (max ~2e37 fits; separate sqrt factors lose a ULP and a
            # perfect ordering would score 0.99999999999999998)
            F.col("s").cast("double")
            / F.sqrt(
                (
                    (F.col("n0") - F.col("n1")).cast("decimal(38,0)")
                    * (F.col("n0") - F.col("n2")).cast("decimal(38,0)")
                ).cast("double")
            )
        )
        .alias("tau_b"),
    )
    # eager one-row materialization: tau is a scalar analytic, and the
    # collect is what lets kendall_tau unpersist its cell cache before
    # handing the result back
    return cells.sparkSession.createDataFrame(out.collect(), out.schema)
