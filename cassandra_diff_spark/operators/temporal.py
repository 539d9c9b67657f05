"""Temporal joins: as-of (point-in-time) join, interval containment join,
and last-observation-carried-forward resampling.

The reference engine has no temporal-join surface (its only time
functions are the day fan-out helpers, see SURVEY.md §2.7 F6/F7); these
operators are part of the beyond-reference training-pipeline surface: a
feature store's point-in-time-correct join ("the value of feature X as
of example time T, never after" — the join that prevents label leakage),
event-to-window attribution, and time-series gridding for downstream
models.

Spark has no ASOF JOIN operator (DuckDB/Pandas do), and the naive
translation — an inequality join ``l.key = r.key AND r.ts <= l.ts``
followed by a max-per-left-row aggregation — materializes O(|matches|)
intermediate rows: at 100 TB a single hot key with a year of history
turns each left row into thousands of joined candidates before the
aggregation throws them away. The implementation here is the
union-window formulation: tag both sides, union, ONE hash shuffle on the
key, and a running ``last(value, ignorenulls=True)`` over the
(ts, side-priority, tiebreak) sort inside each key partition. Cost is a
single data-sized Exchange plus a sort — the same shape as any windowed
aggregation, with zero intermediate blow-up (``tests/test_temporal.py``
asserts the one-Exchange plan).

For HOT keys (one key's whole history in one task), :func:`asof_join_
chunked` splits each key's timeline into fixed chunks, runs the window
per (key, chunk) — parallel across chunks — and stitches boundaries with
a per-chunk carry-in computed on a kilobyte-scale frame (keys x touched
chunks). Equivalence with the unchunked operator is property-tested on
adversarial data (duplicate keys/timestamps, empty chunks).

All tie-breaks are total and deterministic (the contract every gate
oracle reproduces): among right rows sharing (key, ts), the GREATEST
``right_tiebreak`` wins, in both directions. The tiebreak keeps its
NATIVE type (string/UUID ids order lexically); a NULL tiebreak value
sorts FIRST, i.e. loses to every non-null peer at the same timestamp.

The matched right row travels as ONE struct (never per-column windows),
so a null value in a matched row's column stays null instead of being
backfilled from an older row — row atomicity is property-tested with
nulls in ``right_cols`` (tests/test_temporal.py).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, StructField, StructType

def _us_of(col: Column) -> Column:
    """Microseconds since epoch; the cast makes TIMESTAMP_NTZ inputs
    (raw parquet reads) work — under the engine's pinned UTC session
    timezone the NTZ->TZ cast is value-identity, and it is a no-op for
    plain timestamps."""
    return F.unix_micros(col.cast("timestamp"))


def _prefixed(cols: Sequence[str], prefix: str) -> list[str]:
    return [f"{prefix}{c}" for c in cols]


def _right_row_parts(
    right: DataFrame,
    right_ts: str,
    right_cols: Sequence[str],
    right_tiebreak: Optional[str],
) -> tuple[Column, Column, StructType]:
    """(tiebreak col, matched-row struct col, struct type) for the union
    frame's right side. The struct carries the matched row ATOMICALLY —
    ``__ts`` + tiebreak + every ``right_cols`` value from the SAME row —
    so extraction can never mix columns of different rows. ``__ts``/
    ``__tb`` are reserved field names (double-underscore, rejected if a
    caller column uses them)."""
    for c in right_cols:
        if c.startswith("__"):
            raise ValueError(f"right_cols entry {c!r} uses the reserved __ prefix")
    tb = F.col(right_tiebreak) if right_tiebreak is not None else F.lit(0)
    rschema = {f.name: f.dataType for f in right.schema.fields}
    row = F.struct(
        F.col(right_ts).alias("__ts"),
        tb.alias("__tb"),
        *[F.col(c).alias(c) for c in right_cols],
    )
    tb_t = rschema[right_tiebreak] if right_tiebreak is not None else IntegerType()
    row_t = StructType(
        [
            StructField("__ts", rschema[right_ts]),
            StructField("__tb", tb_t),
            *[StructField(c, rschema[c]) for c in right_cols],
        ]
    )
    return tb, row, row_t


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    *,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: Sequence[str],
    right_tiebreak: Optional[str] = None,
    direction: str = "backward",
    strict: bool = False,
    tolerance_us: Optional[int] = None,
    prefix: str = "r_",
) -> DataFrame:
    """Point-in-time join: every ``left`` row picks the nearest ``right``
    row at-or-before (``backward``) / at-or-after (``forward``) its own
    timestamp, per key — a LEFT join (unmatched left rows keep nulls).

    Output = all ``left`` columns + ``prefix + right_ts`` (the matched
    right timestamp) + ``prefix + c`` for each ``right_cols`` entry.

    * ``strict``: exclude right rows at exactly the left timestamp
      (``<`` / ``>`` instead of ``<=`` / ``>=``).
    * ``tolerance_us``: match only within this many microseconds
      (staleness bound); an out-of-tolerance match nulls out.
    * ``right_tiebreak``: total-orders right rows sharing (key, ts); the
      greatest value wins. Required for deterministic output when the
      right side may hold duplicate (key, ts) — pass the event/sequence
      id column.

    Scale shape: ONE hash Exchange (union frame, shuffled on ``on``) and
    one sort — no inequality join, no candidate blow-up. A single
    pathologically hot key serializes into one task; use
    :func:`asof_join_chunked` there.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    on = list(on)
    right_cols = list(right_cols)
    lcols = list(left.columns)
    for c in _prefixed([right_ts] + right_cols, prefix):
        if c in lcols:
            raise ValueError(
                f"output column {c!r} collides with a left column; pick a "
                f"different prefix"
            )

    # side priorities: the side that must sort FIRST among equal
    # timestamps gets the smaller value. Non-strict => right rows at the
    # left row's own ts are eligible => right before left; strict =>
    # right after left (the window, which ends at the current row, then
    # never sees them).
    r_pri, l_pri = (1, 0) if strict else (0, 1)

    # __side is an explicit literal — NEVER inferred from tiebreak
    # nullness, so null tiebreak values can't flip a row's side — and the
    # matched right row rides as ONE struct (__rrow), so a null in a
    # matched row's column is returned as that null, never backfilled
    # from an older row.
    tb, rrow, rrow_t = _right_row_parts(right, right_ts, right_cols, right_tiebreak)
    r_sel = [F.col(c) for c in on] + [
        F.col(right_ts).alias("__ts"),
        F.lit(r_pri).alias("__pri"),
        tb.alias("__tb"),
        F.lit(1).alias("__side"),
        rrow.alias("__rrow"),
    ] + [F.lit(None).cast(t).alias(f"__l_{c}") for c, t in left.dtypes if c not in on]
    l_sel = [F.col(c) for c in on] + [
        F.col(left_ts).alias("__ts"),
        F.lit(l_pri).alias("__pri"),
        F.lit(None).cast(rrow_t["__tb"].dataType).alias("__tb"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(rrow_t).alias("__rrow"),
    ] + [F.col(c).alias(f"__l_{c}") for c in lcols if c not in on]
    u = right.select(*r_sel).unionByName(left.select(*l_sel))

    if direction == "backward":
        order = [F.col("__ts").asc(), F.col("__pri").asc(), F.col("__tb").asc()]
    else:
        # desc ts; among equal right ts, GREATEST tiebreak must be the
        # last row the window sees => ascending tiebreak here too
        order = [F.col("__ts").desc(), F.col("__pri").asc(), F.col("__tb").asc()]
    w = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # __rrow is non-null exactly on right rows (a struct of nulls is
    # still a struct), so last-ignorenulls picks the latest right ROW
    out = u.withColumn("__mrow", F.last("__rrow", ignorenulls=True).over(w))

    mts = F.col("__mrow.__ts")
    within: Column = F.lit(True)
    if tolerance_us is not None:
        gap = _us_of(F.col("__ts")) - _us_of(mts)
        if direction == "forward":
            gap = -gap
        within = mts.isNotNull() & (gap <= F.lit(int(tolerance_us)))

    return out.filter(F.col("__side") == 0).select(
        *[F.col(c) for c in on],
        F.col("__ts").alias(left_ts),
        *[F.col(f"__l_{c}").alias(c) for c in lcols if c not in on and c != left_ts],
        F.when(within, mts).alias(f"{prefix}{right_ts}"),
        *[
            F.when(within, F.col(f"__mrow.{c}")).alias(f"{prefix}{c}")
            for c in right_cols
        ],
    )


def asof_join_chunked(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    *,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: Sequence[str],
    right_tiebreak: Optional[str] = None,
    direction: str = "backward",
    strict: bool = False,
    tolerance_us: Optional[int] = None,
    prefix: str = "r_",
    chunk_us: int = 3_600 * 1_000_000,
) -> DataFrame:
    """Hot-key-parallel :func:`asof_join`: each key's timeline splits
    into fixed ``chunk_us`` chunks and the running-last window runs per
    (key, chunk) — a year-long hot key becomes ~8760 independent hour
    tasks instead of one. Chunk boundaries are stitched by a carry row
    computed by a per-(key, chunk) partial aggregation (map-side
    combined — the carry frame is keys x touched chunks, kilobytes per
    key) and a window over that small frame: backward carries IN the
    last right row of preceding chunks; forward carries the first right
    row of following chunks.

    Semantics are IDENTICAL to ``asof_join`` with the same ``direction``
    — property-tested on duplicate-timestamp adversarial data. The
    stitching relies on chunk boundaries falling strictly between
    timestamps of different chunks, which fixed-width flooring
    guarantees.

    Cost: two data-sized hash Exchanges (the right-side partial agg and
    the (key, chunk) union window) vs the unchunked operator's one —
    the price of unbounded per-key parallelism. Pick ``chunk_us`` so a
    chunk holds ~10^5-10^6 rows of the hottest key.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    on = list(on)
    right_cols = list(right_cols)
    chunk = lambda ts: (_us_of(F.col(ts)) / F.lit(int(chunk_us))).cast("long")  # noqa: E731

    backward = direction == "backward"
    # boundary right row per (key, chunk): for backward the LAST row by
    # (ts, tb); for forward the FIRST row by ts with GREATEST tb among
    # its ties (max_by over (-ts, tb) lexicographic). One partial-
    # aggregated shuffle, output rows = touched chunks. __row is the
    # SAME struct shape as the in-chunk __rrow so the boundary stitch
    # below is a row-level coalesce, never per-column (a matched row's
    # null column must stay null).
    tb, rrow, rrow_t = _right_row_parts(right, right_ts, right_cols, right_tiebreak)
    ts_ord = _us_of(F.col(right_ts))
    if not backward:
        ts_ord = -ts_ord
    rc = right.select(
        *on,
        chunk(right_ts).alias("__chunk"),
        rrow.alias("__row"),
        F.struct(ts_ord.alias("ts"), tb.alias("tb")).alias("__ord"),
    )
    boundary_per_chunk = rc.groupBy(*on, "__chunk").agg(
        F.max_by("__row", "__ord").alias("__bnd")
    )

    # chunk universe = chunks touched by EITHER side (a left chunk with
    # no right rows still needs a carry; distinct over (key, chunk)
    # pairs only — the frames shuffled here carry two/three columns).
    # backward: carry-IN = last boundary row of any PRECEDING chunk;
    # forward: carry-OUT = first boundary row of any FOLLOWING chunk.
    chunks = (
        left.select(*on, chunk(left_ts).alias("__chunk"))
        .unionByName(rc.select(*on, "__chunk"))
        .distinct()
    )
    wc = Window.partitionBy(*on).orderBy(F.col("__chunk").asc())
    if backward:
        carry_col = F.last("__bnd", ignorenulls=True).over(
            wc.rowsBetween(Window.unboundedPreceding, -1)
        )
    else:
        carry_col = F.first("__bnd", ignorenulls=True).over(
            wc.rowsBetween(1, Window.unboundedFollowing)
        )
    carry = (
        chunks.join(boundary_per_chunk, on=on + ["__chunk"], how="left")
        .withColumn("__carry", carry_col)
        .select(*on, "__chunk", "__carry")
    )

    # in-chunk union window — same construction as asof_join but
    # partitioned by (key, chunk); carry-in joins back on the SAME
    # (key, chunk) grouping so AQE plans it against the small frame
    r_pri, l_pri = (1, 0) if strict else (0, 1)
    lcols = list(left.columns)
    r_sel = [F.col(c) for c in on] + [
        chunk(right_ts).alias("__chunk"),
        F.col(right_ts).alias("__ts"),
        F.lit(r_pri).alias("__pri"),
        tb.alias("__tb"),
        F.lit(1).alias("__side"),
        rrow.alias("__rrow"),
    ] + [F.lit(None).cast(t).alias(f"__l_{c}") for c, t in left.dtypes if c not in on]
    l_sel = [F.col(c) for c in on] + [
        chunk(left_ts).alias("__chunk"),
        F.col(left_ts).alias("__ts"),
        F.lit(l_pri).alias("__pri"),
        F.lit(None).cast(rrow_t["__tb"].dataType).alias("__tb"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(rrow_t).alias("__rrow"),
    ] + [F.col(c).alias(f"__l_{c}") for c in lcols if c not in on]
    u = right.select(*r_sel).unionByName(left.select(*l_sel))

    in_order = (
        [F.col("__ts").asc()] if backward else [F.col("__ts").desc()]
    ) + [F.col("__pri").asc(), F.col("__tb").asc()]
    w = (
        Window.partitionBy(*(on + ["__chunk"]))
        .orderBy(*in_order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = (
        u.withColumn("__mrow", F.last("__rrow", ignorenulls=True).over(w))
        .filter(F.col("__side") == 0)
        .join(carry, on=on + ["__chunk"], how="left")
    )

    # stitch at ROW level: no in-chunk match => the whole carry row
    # (same struct type by construction); a per-column coalesce would
    # smear another row's value over a matched row's legitimate null
    frow = F.coalesce(F.col("__mrow"), F.col("__carry"))
    mts = frow.getField("__ts")
    within: Column = F.lit(True)
    if tolerance_us is not None:
        gap = _us_of(F.col("__ts")) - _us_of(mts)
        if not backward:
            gap = -gap
        within = mts.isNotNull() & (gap <= F.lit(int(tolerance_us)))

    return out.select(
        *[F.col(c) for c in on],
        F.col("__ts").alias(left_ts),
        *[F.col(f"__l_{c}").alias(c) for c in lcols if c not in on and c != left_ts],
        F.when(within, mts).alias(f"{prefix}{right_ts}"),
        *[
            F.when(within, frow.getField(c)).alias(f"{prefix}{c}")
            for c in right_cols
        ],
    )


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: Sequence[str],
    *,
    point_ts: str = "ts",
    start: str = "start",
    end: str = "end",
    how: str = "inner",
    bucket_us: int = 3_600 * 1_000_000,
) -> DataFrame:
    """Containment join: every ``points`` row pairs with every
    ``intervals`` row (same key) whose ``[start, end]`` (closed) contains
    its timestamp. ``how="left_intervals"`` keeps empty intervals (their
    point columns null) — the attribution shape ("events per campaign
    window, windows with zero events included").

    Output = all interval columns + all point columns (caller
    disambiguates name collisions beforehand).

    Scale shape: the naive inequality join is a broadcast-nested-loop
    (or a per-key cross product) — O(|points| x |intervals|) candidates
    per key. Here both sides bucket into fixed ``bucket_us`` time cells:
    an interval replicates into each cell it overlaps (sequence +
    explode — replication factor = interval length / bucket width, pick
    ``bucket_us`` near the TYPICAL interval length), a point lands in
    exactly ONE cell, and the join is a plain hash equi-join on
    (key, cell) followed by the exact containment filter. One data-sized
    Exchange per side; a point's single cell means no output dedup is
    needed.
    """
    if how not in ("inner", "left_intervals"):
        raise ValueError(f"how must be inner|left_intervals, got {how!r}")
    on = list(on)
    overlap = set(points.columns) & set(intervals.columns) - set(on)
    if overlap:
        raise ValueError(
            f"point/interval column name collision: {sorted(overlap)}; "
            f"rename before joining"
        )
    b = int(bucket_us)
    cell_of = lambda c: (_us_of(F.col(c)) / F.lit(b)).cast("long")  # noqa: E731

    # surrogate instance id BEFORE the explode, so every cell replica of
    # one interval row shares it (left_intervals groups empties by it)
    iv = intervals.withColumn("__iid", F.monotonically_increasing_id()).withColumn(
        "__cell",
        F.explode(F.sequence(cell_of(start), cell_of(end))),
    )
    pt = points.withColumn("__cell", cell_of(point_ts))
    cond = (F.col(point_ts) >= F.col(start)) & (F.col(point_ts) <= F.col(end))

    if how == "inner":
        return (
            iv.join(pt, on=on + ["__cell"], how="inner")
            .filter(cond)
            .drop("__cell", "__iid")
        )
    # left_intervals: keep every interval INSTANCE exactly once when
    # nothing matches — a surrogate per-row id (so duplicate interval
    # rows keep their multiplicity) and ONE window over the join output
    # (so the bucketed join subtree executes once structurally, instead
    # of a matched-filter + empties-groupBy union that re-runs it).
    # Non-matching candidates must not survive as spurious half-null
    # rows: point columns failing the containment test are nulled, and
    # per interval instance either its matches pass through or exactly
    # one representative no-match row survives.
    pcols = [c for c in points.columns if c not in on]
    j = iv.join(pt, on=on + ["__cell"], how="left")
    for c in pcols:
        j = j.withColumn(c, F.when(cond, F.col(c)))
    wi = Window.partitionBy("__iid").orderBy(F.col("__cell").asc())
    j = (
        j.withColumn(
            "__any",
            F.max(F.when(F.col(point_ts).isNotNull(), 1)).over(
                wi.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
            ),
        )
        .withColumn("__rn", F.row_number().over(wi))
    )
    return j.filter(
        F.col(point_ts).isNotNull()
        | (F.col("__any").isNull() & (F.col("__rn") == 1))
    ).drop("__cell", "__iid", "__any", "__rn")


def resample_locf(
    df: DataFrame,
    on: Sequence[str],
    *,
    ts: str = "ts",
    value_cols: Sequence[str],
    step_us: int = 3_600 * 1_000_000,
    tiebreak: Optional[str] = None,
    prefix: str = "locf_",
    chunk_us: Optional[int] = None,
) -> DataFrame:
    """Per-key fixed-step time grid with last-observation-carried-forward
    values: one output row per (key, grid instant) from the key's first
    observation (floored to the grid) through its last, each carrying the
    most recent at-or-before observation of every ``value_cols`` entry
    (plus ``prefix + ts`` = that observation's timestamp).

    The grid generates from a per-key min/max aggregation (one partial-
    aggregated shuffle, one output row per key) + ``sequence``/``explode``
    — never a driver-side loop — and values attach via
    :func:`asof_join`'s single-shuffle union window. Grid instants before
    the first observation (the flooring edge) keep nulls.

    ``chunk_us``: route the value attachment through
    :func:`asof_join_chunked` instead — a key whose whole grid would
    otherwise serialize into one window task (years of dense grid on one
    hot entity) parallelizes per time chunk, identical output.
    """
    on = list(on)
    step = int(step_us)
    bounds = df.groupBy(*on).agg(
        F.min(ts).alias("__t0"), F.max(ts).alias("__t1")
    )
    grid = bounds.select(
        *on,
        F.explode(
            F.sequence(
                (_us_of(F.col("__t0")) / F.lit(step)).cast("long") * F.lit(step),
                _us_of(F.col("__t1")),
                F.lit(step),
            )
        ).alias("__gus"),
    ).select(*on, F.timestamp_micros(F.col("__gus")).alias("grid_ts"))
    kw = dict(
        left_ts="grid_ts",
        right_ts=ts,
        right_cols=list(value_cols),
        right_tiebreak=tiebreak,
        prefix=prefix,
    )
    if chunk_us is not None:
        return asof_join_chunked(grid, df, on, chunk_us=int(chunk_us), **kw)
    return asof_join(grid, df, on, direction="backward", **kw)


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    *,
    left_start: str = "start",
    left_end: str = "end",
    right_start: str = "start",
    right_end: str = "end",
    bucket_us: int = 3_600 * 1_000_000,
) -> DataFrame:
    """Interval x interval overlap join (closed bounds): every left/right
    pair (same key) whose ``[start, end]`` ranges intersect — downtime
    windows vs deploy windows, session overlap, coverage analysis.

    Same cell-bucketing as :func:`interval_join`, with one extra idea:
    a pair of long intervals shares MANY cells, so each pair is emitted
    only in its FIRST shared cell — ``max(floor(ls/w), floor(rs/w))``,
    a cell both sides are guaranteed to occupy when they overlap — which
    makes the output exact without any dedup shuffle. Cost: one hash
    equi-join on (key, cell); replication factor = interval length /
    ``bucket_us`` per side.

    Column names must not collide across the two inputs (rename first);
    key columns join by name.
    """
    on = list(on)
    overlap_cols = set(left.columns) & set(right.columns) - set(on)
    if overlap_cols:
        raise ValueError(
            f"left/right column name collision: {sorted(overlap_cols)}; "
            f"rename before joining"
        )
    b = int(bucket_us)
    cell_of = lambda c: (_us_of(F.col(c)) / F.lit(b)).cast("long")  # noqa: E731

    li = left.withColumn(
        "__cell", F.explode(F.sequence(cell_of(left_start), cell_of(left_end)))
    ).withColumn("__ls_cell", cell_of(left_start))
    ri = right.withColumn(
        "__cell", F.explode(F.sequence(cell_of(right_start), cell_of(right_end)))
    ).withColumn("__rs_cell", cell_of(right_start))
    j = li.join(ri, on=on + ["__cell"], how="inner")
    overlaps = (F.col(left_start) <= F.col(right_end)) & (
        F.col(right_start) <= F.col(left_end)
    )
    first_shared = F.col("__cell") == F.greatest(
        F.col("__ls_cell"), F.col("__rs_cell")
    )
    return j.filter(overlaps & first_shared).drop(
        "__cell", "__ls_cell", "__rs_cell"
    )


def time_weighted_avg(
    df: DataFrame,
    on: Sequence[str],
    *,
    ts: str = "ts",
    value_col: str,
    t0,
    t1,
    tiebreak: Optional[str] = None,
    value_scale: Optional[int] = None,
) -> DataFrame:
    """Per-key time-weighted average of a step signal over the window
    ``[t0, t1)``: each observation holds (LOCF) until the next one, and
    contributes its value weighted by the held duration clipped to the
    window — the correct aggregate for irregularly-sampled series, where
    a plain AVG over-weights bursts of updates. Output
    ``(*on, twa, covered_us, n_obs)``; ``covered_us`` is the window time
    during which some non-null observation was in effect — keys whose
    first observation is inside the window cover less than ``t1 - t0``,
    and ``twa`` averages over covered time only.

    One hash shuffle + per-key sort: rows at-or-before ``t1`` get
    ``held = [max(ts, t0), min(next_ts, t1))`` from a single ``lead``
    window — the last pre-window row is automatically the boundary
    (its clipped start is ``t0``), and rows that stopped holding before
    ``t0`` clamp to zero duration. No as-of join, no explode.
    ``tiebreak`` totally orders equal timestamps (the later-ordered row
    supersedes at zero held time for the earlier — same contract as the
    as-of operators). Null values hold "no signal": their segments are
    excluded from both the numerator and covered time.

    ``value_scale``: when set (e.g. 1000), the value quantizes to
    ``1/value_scale`` units and the weighted numerator accumulates as
    an EXACT ``decimal(38,0)`` integer, with ``twa`` one fixed double
    division at the end — the repo's exact-arithmetic discipline.
    The default (None) sums raw doubles, whose result depends on
    partition-order association: fine for analytics, NOT reproducible
    bit-for-bit across engines or shuffle layouts (the r8 sf0.1 sweep
    caught exactly that last-bit drift in the gate; every oracle-paired
    use should pass a scale).
    """
    on = list(on)
    t0_us, t1_us = int(t0), int(t1)
    if t1_us <= t0_us:
        raise ValueError(f"need t0 < t1, got [{t0}, {t1})")
    order = [F.col(ts).asc()]
    if tiebreak is not None:
        order.append(F.col(tiebreak).asc())
    w = Window.partitionBy(*on).orderBy(*order)
    us = _us_of(F.col(ts))
    seg_start = F.greatest(us, F.lit(t0_us))
    seg_end = F.least(
        F.coalesce(F.lead(us).over(w), F.lit(t1_us)), F.lit(t1_us)
    )
    held = F.greatest(seg_end - seg_start, F.lit(0))
    v = F.col(value_col).cast("double")
    if value_scale is not None:
        scale = int(value_scale)
        qv = F.round(v * scale).cast("long").cast("decimal(38,0)")
        seg = (
            df.filter(us < F.lit(t1_us))
            .withColumn(
                "__held", F.when(v.isNotNull(), held).otherwise(F.lit(0))
            )
            .withColumn("__wv", qv * F.col("__held").cast("decimal(38,0)"))
        )
        # exact decimal numerator; covered_us < 2^53 is exact in double,
        # so twa is ONE correctly-rounded division — bit-identical in any
        # engine whose big-int -> double path is correctly rounded (the
        # DuckDB oracle routes through VARCHAR for that)
        return seg.groupBy(*on).agg(
            (
                F.sum("__wv").cast("double")
                / (F.sum("__held").cast("double") * float(scale))
            ).alias("twa"),
            F.sum("__held").cast("long").alias("covered_us"),
            F.count(F.lit(1)).cast("long").alias("n_obs"),
        )
    seg = (
        df.filter(us < F.lit(t1_us))
        .withColumn("__held", F.when(v.isNotNull(), held).otherwise(F.lit(0)))
        .withColumn("__wv", v * F.col("__held"))
    )
    return seg.groupBy(*on).agg(
        (F.sum("__wv") / F.sum("__held")).alias("twa"),
        F.sum("__held").cast("long").alias("covered_us"),
        F.count(F.lit(1)).cast("long").alias("n_obs"),
    )


def merge_intervals(
    df: DataFrame,
    on: Sequence[str],
    *,
    start: str = "start",
    end: str = "end",
    min_gap_us: int = 0,
) -> DataFrame:
    """Coalesce overlapping/adjacent intervals per key into maximal
    disjoint spans: ``(*on, start, end, n_merged)`` — downtime windows
    union, coverage spans, deploy-freeze consolidation. Two intervals
    merge when the later one starts within ``min_gap_us`` of (or before)
    the earlier span's end; closed bounds, so touching intervals merge
    at ``min_gap_us=0``.

    Gaps-and-islands: one hash shuffle + per-key sort by start, a
    running max of ``end`` marks span breaks (an interval starts a new
    span iff it begins after every previous interval's end + gap), then
    one aggregation per (key, span). Same cost shape as sessionization —
    no self-join, no explode.
    """
    on = list(on)
    w = Window.partitionBy(*on).orderBy(F.col(start).asc(), F.col(end).asc())
    prev_max_end = F.max(_us_of(F.col(end))).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    is_new = F.when(
        prev_max_end.isNull()
        | (_us_of(F.col(start)) > prev_max_end + F.lit(int(min_gap_us))),
        1,
    ).otherwise(0)
    spans = df.withColumn("__new", is_new).withColumn(
        "__span",
        F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        spans.groupBy(*on, "__span")
        .agg(
            F.min(start).alias(start),
            F.max(end).alias(end),
            F.count(F.lit(1)).cast("long").alias("n_merged"),
        )
        .drop("__span")
    )


def collapse_bursts(
    df: DataFrame,
    on: Sequence[str],
    *,
    ts: str = "ts",
    gap_us: int,
    tiebreak: Optional[str] = None,
) -> DataFrame:
    """Burst-collapse deduplication: per key, consecutive rows closer
    than ``gap_us`` form one burst, and only the burst's FIRST row
    survives, annotated with ``burst_n`` (rows collapsed into it) and
    ``burst_end`` (the burst's last timestamp) — the telemetry-cleanup
    step that turns a retry storm / duplicate-delivery burst into one
    event without losing its extent.

    Burst = gaps-and-islands session (a burst ends when the NEXT row is
    more than ``gap_us`` away), the same construction as the
    sessionization gate — one hash shuffle + per-key sort, no iterative
    state. ``tiebreak`` totally orders equal timestamps (first = least
    tiebreak, consistent with "earliest wins").
    """
    on = list(on)
    order = [F.col(ts).asc()]
    if tiebreak is not None:
        order.append(F.col(tiebreak).asc())
    w = Window.partitionBy(*on).orderBy(*order)
    us = _us_of(F.col(ts))
    prev = F.lag(us).over(w)
    is_new = F.when(prev.isNull() | ((us - prev) > int(gap_us)), 1).otherwise(0)
    with_burst = df.withColumn("__new", is_new).withColumn(
        "__burst",
        F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    wb = Window.partitionBy(*(on + ["__burst"])).orderBy(*order)
    wball = Window.partitionBy(*(on + ["__burst"]))
    return (
        with_burst.withColumn("__rn", F.row_number().over(wb))
        .withColumn("burst_n", F.count(F.lit(1)).over(wball).cast("long"))
        .withColumn("burst_end", F.max(ts).over(wball))
        .filter(F.col("__rn") == 1)
        .drop("__new", "__burst", "__rn")
    )


def funnel_steps(
    events: DataFrame,
    on: Sequence[str],
    *,
    ts_col: str,
    step_col: str,
    steps: Sequence[str],
    within_us: int,
    tiebreak: Optional[str] = None,
) -> DataFrame:
    """Ordered-sequence conversion funnel ("signup -> click -> purchase
    within 7 days"), composed from chained FORWARD as-of joins: per key,
    take the FIRST ``steps[0]`` event, then for each later step the
    nearest qualifying event STRICTLY after the previous step's
    timestamp and within ``within_us`` of it. One output row per key
    that performed step 0: ``(*on, t1, t2, ..., tN)`` with nulls from
    the first step not reached onward.

    Scale shape: each chain link is one :func:`asof_join` — the
    union-window single-shuffle formulation, never an inequality join —
    and links only process keys still alive in the funnel (drop-offs
    exit the chain immediately and re-enter the output by union, so a
    90%-drop-off funnel does almost no work after step 1). Each link's
    join result is ``tracked_cache``'d: it forks into the drop-off
    branch AND the next link's input, so without materialization link
    i's as-of join re-executes once per downstream consumer (the r12
    plan audit counted 16 event scans for a 3-step funnel — link 1 ran
    3x). The cached frame is one row per key still alive at that link,
    never the raw event stream; caches release via
    ``operators.release_caches()``.

    ``tiebreak`` orders same-timestamp step events (greatest wins),
    exactly as in :func:`asof_join`.
    """
    on = list(on)
    steps = list(steps)
    if len(steps) < 2:
        raise ValueError(f"need >= 2 steps, got {steps}")
    t = lambda i: f"t{i + 1}"  # noqa: E731

    cur = (
        events.filter(F.col(step_col) == steps[0])
        .groupBy(*on)
        .agg(F.min(ts_col).alias(t(0)))
    )
    done: Optional[DataFrame] = None
    ts_type = dict(events.dtypes)[ts_col]
    for i, s in enumerate(steps[1:], start=1):
        nxt = events.filter(F.col(step_col) == s).select(
            *on,
            F.col(ts_col),
            *( [F.col(tiebreak)] if tiebreak else [] ),
        )
        from cassandra_diff_spark.operators import tracked_cache

        matched = tracked_cache(
            asof_join(
                cur,
                nxt,
                on,
                left_ts=t(i - 1),
                right_ts=ts_col,
                right_cols=[],
                right_tiebreak=tiebreak,
                direction="forward",
                strict=True,
                tolerance_us=int(within_us),
                prefix="__m_",
            ).withColumnRenamed(f"__m_{ts_col}", t(i))
        )
        # keys that never reached step i leave the chain NOW and carry
        # nulls for every later step
        dropped = matched.filter(F.col(t(i)).isNull())
        for j in range(i + 1, len(steps)):
            dropped = dropped.withColumn(t(j), F.lit(None).cast(ts_type))
        done = dropped if done is None else done.unionByName(dropped)
        cur = matched.filter(F.col(t(i)).isNotNull())
    out = cur if done is None else cur.unionByName(done)
    return out.select(*on, *[t(i) for i in range(len(steps))])


def funnel_summary(funnel: DataFrame, n_steps: int) -> DataFrame:
    """Step-reach rollup of a :func:`funnel_steps` frame: ``(step,
    n_keys)`` — one tiny aggregation over the per-key funnel rows."""
    return funnel.agg(
        *[
            F.count(F.col(f"t{i + 1}")).cast("long").alias(f"__n{i}")
            for i in range(n_steps)
        ]
    ).select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i + 1).alias("step"),
                        F.col(f"__n{i}").alias("n_keys"),
                    )
                    for i in range(n_steps)
                ]
            )
        ).alias("r")
    ).select("r.*")


def cohort_retention(
    events: DataFrame,
    id_col: str,
    ts_col: str,
    *,
    period_us: int = 7 * 86_400_000_000,
) -> DataFrame:
    """Cohort retention matrix: users grouped by their FIRST-activity
    period, counted in every later period they return — ``(cohort,
    offset, n_active)`` where ``cohort = min_period(user)`` and
    ``offset = period - cohort`` (offset 0 = the cohort's size).

    Periods are integer epoch buckets (``epoch_us div period_us``) —
    no calendar arithmetic, so results are engine-exact and the default
    week is exactly 7 days from the epoch, not an ISO week.

    Scale shape: one distinct over (user, period) — the activity set,
    map-side combined — one min-aggregation for cohorts (both shuffle
    on the user key, so the join between them is co-partitioned), and
    a final small rollup. Nothing row-expands: the matrix is
    |cohorts| x |offsets| rows.
    """
    pu = F.lit(int(period_us))
    # floor of the double quotient equals integer division here: epoch
    # micros < 2^53 are exact doubles, and at an exact period boundary
    # the quotient is an exactly-representable integer
    act = (
        events.select(
            F.col(id_col).alias("__u"),
            F.floor(_us_of(F.col(ts_col)) / pu).cast("long").alias("__p"),
        )
        .distinct()
    )
    cohorts = act.groupBy("__u").agg(F.min("__p").alias("__c"))
    return (
        act.join(cohorts, "__u")
        .groupBy(
            F.col("__c").alias("cohort"),
            (F.col("__p") - F.col("__c")).alias("offset"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_active"))
    )


def interval_coverage(
    df: DataFrame,
    on: Sequence[str],
    *,
    start: str = "start",
    end: str = "end",
    min_gap_us: int = 0,
) -> DataFrame:
    """Per-key COVERED time: total duration of the union of the key's
    intervals (overlaps counted once — summing raw durations
    double-counts every overlap), plus span/interval counts and the
    coverage envelope. The uptime/SLA/active-time rollup.

    Composition: :func:`merge_intervals` produces the maximal disjoint
    spans (one shuffle + per-key sort), this adds ONE map-side-combined
    aggregation over the merged-span frame — the expensive union work
    is not repeated. Output: ``(*on, covered_us, n_spans, n_intervals,
    first_start, last_end)`` with ``covered_us`` an exact integer
    microsecond sum.
    """
    on = list(on)
    merged = merge_intervals(df, on, start=start, end=end, min_gap_us=min_gap_us)
    dur = F.unix_micros(F.col(end)) - F.unix_micros(F.col(start))
    return merged.groupBy(*on).agg(
        F.sum(dur).cast("long").alias("covered_us"),
        F.count(F.lit(1)).cast("long").alias("n_spans"),
        F.sum("n_merged").cast("long").alias("n_intervals"),
        F.min(start).alias("first_start"),
        F.max(end).alias("last_end"),
    )


def gap_report(
    df: DataFrame,
    on: Sequence[str],
    *,
    start: str = "start",
    end: str = "end",
    min_gap_us: int = 0,
    min_report_us: int = 0,
) -> DataFrame:
    """Per-key GAPS in interval coverage — the downtime dual of
    :func:`interval_coverage` ("when was the sensor/service/feed dark,
    and for how long"): the windows between consecutive merged spans,
    filtered to gaps of at least ``min_report_us``.

    Composition: :func:`merge_intervals` does the union (one shuffle +
    per-key sort); the gap extraction is a lag window over the MERGED
    span frame — per key that frame is spans, not intervals, so the
    window state is already collapsed. Output: ``(*on, gap_start,
    gap_end, gap_us)`` with ``gap_us`` exact integer microseconds;
    keys with a single span report no gaps.
    """
    on = list(on)
    merged = merge_intervals(df, on, start=start, end=end, min_gap_us=min_gap_us)
    w = Window.partitionBy(*on).orderBy(F.col(start).asc())
    gapped = merged.withColumn("__prev_end", F.lag(end).over(w)).filter(
        F.col("__prev_end").isNotNull()
    )
    gap_us = F.unix_micros(F.col(start)) - F.unix_micros(F.col("__prev_end"))
    return (
        gapped.select(
            *on,
            F.col("__prev_end").alias("gap_start"),
            F.col(start).alias("gap_end"),
            gap_us.cast("long").alias("gap_us"),
        )
        .filter(F.col("gap_us") >= int(min_report_us))
    )


def transition_matrix(
    df: DataFrame,
    key_col: str,
    time_col: str,
    label_col: str,
    tiebreak_col: str,
    *,
    ppm: bool = True,
) -> DataFrame:
    """First-order (Markov) label-transition counts over per-key ordered
    event streams — "after a `view`, what fraction of next events are
    `purchase`?" The behavioral-sequence profile that funnels (fixed
    target sequence) and sessions (gap structure) don't capture, and the
    input to sequence-model sanity checks (does generated traffic match
    the empirical transition structure?).

    One window shuffle keyed on ``key_col`` computes each event's
    successor label (``lead`` over (time, tiebreak) — the tiebreak makes
    the order TOTAL, so equal timestamps transition deterministically,
    the contract the gate oracle reproduces); the bigram aggregation is
    label-pair cardinality, map-side combined. Per-key streams never
    leave their partition, so the cost shape is exactly one windowed agg
    at 100 TB — no self-join, no explode.

    Output: ``(from_label, to_label, n_trans, row_ppm)`` where
    ``row_ppm = (n_trans * 1e6) DIV sum-over-from-row`` — real integer
    floor division (SQL ``div``, not double-divide-then-floor, which
    diverges from the oracle's ``//`` once a row total nears 2^53/1e6
    or the true quotient lands within half an ULP of an integer) —
    exact in any engine. ``ppm=False`` drops the normalized column."""
    w = Window.partitionBy(key_col).orderBy(
        F.col(time_col).asc(), F.col(tiebreak_col).asc()
    )
    trans = (
        df.select(
            F.col(key_col),
            F.col(time_col),
            F.col(tiebreak_col),
            F.col(label_col).alias("from_label"),
        )
        .withColumn("to_label", F.lead("from_label").over(w))
        # end-of-sequence detection via a SENTINEL lead: filtering on
        # to_label IS NOT NULL would also drop real transitions INTO a
        # null label (caught by the streaming-twin equality test)
        .withColumn("__has_next", F.lead(F.lit(1)).over(w))
        .filter(F.col("__has_next").isNotNull())
        .groupBy("from_label", "to_label")
        .agg(F.count(F.lit(1)).cast("long").alias("n_trans"))
    )
    if not ppm:
        return trans
    wf = Window.partitionBy("from_label")
    return (
        trans.withColumn("__row_total", F.sum("n_trans").over(wf))
        .withColumn(
            "row_ppm",
            F.expr("(n_trans * 1000000) div __row_total").cast("long"),
        )
        .drop("__row_total")
    )


def sequence_loglik(
    df: DataFrame,
    key_col: str,
    time_col: str,
    label_col: str,
    tiebreak_col: str,
    *,
    matrix: "DataFrame | None" = None,
    alphabet_size: "int | None" = None,
) -> DataFrame:
    """Per-key bigram sequence log-likelihood against a label-transition
    model — "does this user's event stream match the corpus transition
    structure?" — the sequence-anomaly scorer :func:`transition_matrix`
    exists to feed. A key whose hops are all high-probability corpus
    transitions scores near zero; a key full of never-seen hops scores
    deeply negative. The per-sequence twin of CCNet-style LM scoring
    (``lm_unigram_score``), one model order up.

    Model: add-1-smoothed first-order Markov — ``P(b|a) = (n_ab + 1) /
    (total_a + V)`` where ``V`` is the label-alphabet size (distinct
    labels in ``df``, counting NULL as a label, or ``alphabet_size``
    when an external ``matrix`` (``from_label, to_label, n_trans``) is
    supplied — a batch's own alphabet would re-smooth every score).
    Each transition contributes ``round(ln(P) * 1e6)`` micro-nats,
    rounded BEFORE the per-key sum, so the sum is an order-free integer
    — association order can never move a score (the
    ``lm_unigram_score`` discipline).

    Cost shape: ONE window shuffle on ``key_col`` extracts the bigrams
    (sentinel lead — transitions into a NULL label are real, ends of
    sequence are not); the matrix, row totals, and alphabet size are
    |labels|²-sized frames that ride broadcast joins (null-safe ``<=>``
    keys); the per-key sum is map-side combinable. At 100 TB: one
    data-sized Exchange plus kilobyte broadcasts.

    Output: ``(key, n_trans, loglik_u)``; single-event keys don't
    appear (no transitions — callers left-join and fill as fits).
    """
    w = Window.partitionBy("key").orderBy(
        F.col(time_col).asc(), F.col(tiebreak_col).asc()
    )
    pairs = (
        df.select(
            F.col(key_col).alias("key"),
            F.col(time_col),
            F.col(tiebreak_col),
            F.col(label_col).alias("a"),
        )
        .withColumn("b", F.lead("a").over(w))
        .withColumn("__has_next", F.lead(F.lit(1)).over(w))
        .filter(F.col("__has_next").isNotNull())
        .select("key", "a", "b")
    )
    if matrix is None:
        m = pairs.groupBy("a", "b").agg(
            F.count(F.lit(1)).cast("long").alias("__n")
        ).select(
            F.col("a").alias("__ma"), F.col("b").alias("__mb"), "__n"
        )
        v_df = df.select(
            (
                F.countDistinct(label_col)
                + F.max(F.col(label_col).isNull().cast("int"))
            ).cast("long").alias("__V")
        )
    else:
        if alphabet_size is None:
            raise ValueError(
                "sequence_loglik: alphabet_size is required with an "
                "external matrix (the scored batch's own alphabet would "
                "re-smooth every probability)"
            )
        m = matrix.select(
            F.col("from_label").alias("__ma"),
            F.col("to_label").alias("__mb"),
            F.col("n_trans").cast("long").alias("__n"),
        )
        v_df = df.sparkSession.range(1).select(
            F.lit(int(alphabet_size)).cast("long").alias("__V")
        )
    totals = m.groupBy("__ma").agg(F.sum("__n").alias("__tot")).select(
        F.col("__ma").alias("__ta"), "__tot"
    )
    scored = (
        pairs.join(
            F.broadcast(m),
            F.expr("a <=> __ma") & F.expr("b <=> __mb"),
            "left",
        )
        .select("key", "a", "__n")
        .join(F.broadcast(totals), F.expr("a <=> __ta"), "left")
    )
    # lp_u per transition, rounded before the order-free integer sum
    lp_u = F.round(
        F.log(
            (F.coalesce(F.col("__n"), F.lit(0)) + F.lit(1.0))
            / (F.coalesce(F.col("__tot"), F.lit(0)) + F.col("__V"))
        )
        * 1_000_000
    ).cast("long")
    return (
        scored.crossJoin(F.broadcast(v_df))
        .select("key", lp_u.alias("__lp"))
        .groupBy("key")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_trans"),
            F.sum("__lp").cast("long").alias("loglik_u"),
        )
    )


def decayed_counts(
    df: DataFrame,
    group_col: str,
    time_col: str,
    *,
    half_life_s: int = 86_400,
    unit_weight: int = 1_000_000,
    max_shift: int = 40,
) -> DataFrame:
    """Exponentially-decayed event scores per group — the "trending now"
    signal (an event from one half-life ago counts half as much), made
    EXACT: the decay is quantized to halving buckets, ``weight =
    unit_weight >> floor(age / half_life_s)``, so every weight is an
    integer and the score an exact BIGINT sum — reproducible bit-for-bit
    in any engine, no ``pow(2.0, -x)`` libm ULP divergence (the
    cross-engine float trap this family of gates exists to avoid).

    The reference epoch is ``max(time_col)`` over the input (computed in
    the same plan and broadcast — deterministic, no wall clock); shifts
    clamp at ``max_shift`` (weight 0 long before 2^-40). Cost shape: one
    scalar-aggregate broadcast join plus one map-side-combined groupBy —
    at 100 TB this is the same two-exchange shape as any global-constant
    normalization.

    Output: ``(group, n_events, decayed_score)``, exact integers."""
    tref = df.select(F.max(time_col).alias("__tref"))
    # all-integer bucket math: age in exact microseconds, DIV (integer
    # floor division) by the half-life — a double division could round
    # across the bucket boundary at exact multiples. shiftright's
    # Python API takes only a literal shift, so the whole weight is one
    # SQL expression (the shift amount is a per-row column here).
    weight = F.expr(
        f"shiftright(CAST({int(unit_weight)} AS BIGINT), "
        f"least(CAST((unix_micros(__tref) - unix_micros({time_col})) DIV "
        f"{int(half_life_s) * 1_000_000} AS INT), {int(max_shift)}))"
    )
    return (
        df.crossJoin(F.broadcast(tref))
        .select(F.col(group_col).alias("group"), weight.alias("__w"))
        .groupBy("group")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum("__w").cast("long").alias("decayed_score"),
        )
    )


def decayed_counts_aligned(
    df: DataFrame,
    group_col: str,
    time_col: str,
    *,
    half_life_s: int = 86_400,
    unit_weight: int = 1_000_000,
    max_shift: int = 40,
) -> DataFrame:
    """:func:`decayed_counts` with EPOCH-ALIGNED halving buckets —
    ``shift = (epoch_us(tref) DIV hl) - (epoch_us(t) DIV hl)`` instead
    of the relative-age ``(tref - t) DIV hl`` — the variant whose state
    is exactly foldable (see :func:`decayed_count_state`).

    Why a second bucketing exists at all: relative-age buckets are
    PROVABLY not foldable. When the reference epoch advances by
    ``delta`` that is not a whole number of half-lives, every bucket
    boundary re-phases — an event's new shift is ``old + k`` OR
    ``old + k + 1`` depending on where inside its old bucket it sat,
    information a per-bucket count has discarded (no finite bucket
    granularity fixes this; any bucket is split by the re-phased
    boundary). Aligning buckets to absolute multiples of the half-life
    makes the epoch advance an INTEGER count of half-lives by
    construction, so rebasing history is a lossless ``shift += delta_k``
    on the bucket index — the ``>> delta_k`` rebase is exact. Same
    all-integer weights, same two-exchange cost shape; only the bucket
    phase differs (ages quantize against the absolute half-life grid
    rather than against ``tref``).

    One-shot form: equals ``decayed_counts_from_state(
    decayed_count_state(df, ...))`` bit-exactly by construction."""
    hl_us = int(half_life_s) * 1_000_000
    tref = df.select(F.max(time_col).alias("__tref"))
    weight = F.expr(
        f"shiftright(CAST({int(unit_weight)} AS BIGINT), "
        f"least(CAST(unix_micros(__tref) DIV {hl_us} "
        f"- unix_micros({time_col}) DIV {hl_us} AS INT), {int(max_shift)}))"
    )
    return (
        df.crossJoin(F.broadcast(tref))
        .select(F.col(group_col).alias("group"), weight.alias("__w"))
        .groupBy("group")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum("__w").cast("long").alias("decayed_score"),
        )
    )


def decayed_count_state(
    df: DataFrame,
    group_col: str,
    time_col: str,
    *,
    half_life_s: int = 86_400,
    max_shift: int = 40,
) -> DataFrame:
    """Per-(group, halving-bucket) integer counts — the persisted state
    behind incremental trending scores. ``(group, epoch_bucket, shift,
    n)`` where ``epoch_bucket = max(epoch_us(t)) DIV hl`` over THIS
    input (carried on every row so the frame is self-describing) and
    ``shift = epoch_bucket - epoch_us(t) DIV hl`` clamped at
    ``max_shift``. At most ``max_shift + 1`` rows per group — kilobytes
    per group regardless of corpus size, the same persisted-index
    contract as ``fold_histograms`` / ``fold_token_counts``.

    Cost shape: one scalar-aggregate broadcast join plus one
    map-side-combined groupBy — identical to the one-shot operator; the
    state is what makes the NEXT refresh one batch scan instead of a
    history rescan."""
    hl_us = int(half_life_s) * 1_000_000
    eb = df.select(
        F.expr(
            f"CAST(max(unix_micros({time_col})) DIV {hl_us} AS BIGINT)"
        ).alias("__eb")
    )
    return (
        df.crossJoin(F.broadcast(eb))
        .select(
            F.col(group_col).alias("group"),
            F.col("__eb").alias("epoch_bucket"),
            F.expr(
                f"least(CAST(__eb - unix_micros({time_col}) DIV {hl_us} "
                f"AS BIGINT), CAST({int(max_shift)} AS BIGINT))"
            ).alias("shift"),
        )
        .groupBy("group", "epoch_bucket", "shift")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def fold_decayed_states(
    states: "Sequence[DataFrame]", *, max_shift: int = 40
) -> DataFrame:
    """Additive fold of :func:`decayed_count_state` frames, rebasing
    every input onto the NEWEST epoch bucket: history whose epoch is
    ``delta_k`` half-lives behind shifts its bucket index by exactly
    ``delta_k`` (clamped at ``max_shift`` — a clamped bucket's true
    shift only grows, so it stays clamped; below the clamp the shift is
    exact, so the rebase is lossless — the whole point of epoch-aligned
    halving buckets). Slices may arrive in ANY time order: the fold
    rebases onto the max epoch over all inputs, so a late-arriving old
    slice folds as correctly as a new one.

    Resolving the fold with :func:`decayed_counts_from_state` equals
    :func:`decayed_counts_aligned` over the concatenated inputs
    bit-exactly (oracle-gated; property-tested over random slicings).
    Cost: a union of kilobyte state frames, one scalar max, one
    groupBy — never touches the underlying events."""
    if not states:
        raise ValueError("fold_decayed_states: need at least one state")
    cols = ["group", "epoch_bucket", "shift", "n"]
    u = states[0].select(*cols)
    for s in states[1:]:
        u = u.unionByName(s.select(*cols))
    new_eb = u.select(F.max("epoch_bucket").alias("__new_eb"))
    return (
        u.crossJoin(F.broadcast(new_eb))
        .select(
            "group",
            F.col("__new_eb").alias("epoch_bucket"),
            F.least(
                F.col("shift") + (F.col("__new_eb") - F.col("epoch_bucket")),
                F.lit(int(max_shift)).cast("long"),
            ).cast("long").alias("shift"),
            "n",
        )
        .groupBy("group", "epoch_bucket", "shift")
        .agg(F.sum("n").cast("long").alias("n"))
    )


def decayed_counts_from_state(state: DataFrame, *, unit_weight: int = 1_000_000, max_shift: int = 40) -> DataFrame:
    """Resolve a (folded) :func:`decayed_count_state` frame to the
    ``(group, n_events, decayed_score)`` surface of
    :func:`decayed_counts_aligned` — exact integer weights
    ``unit_weight >> min(shift, max_shift)`` summed per group. Runs on
    the kilobyte state frame, not the corpus."""
    w = F.expr(
        f"n * shiftright(CAST({int(unit_weight)} AS BIGINT), "
        f"CAST(least(shift, {int(max_shift)}) AS INT))"
    )
    return state.groupBy("group").agg(
        F.sum("n").cast("long").alias("n_events"),
        F.sum(w).cast("long").alias("decayed_score"),
    )
