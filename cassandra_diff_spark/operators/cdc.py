"""Changelog (CDC) compaction: latest-state materialization, snapshot
maintenance, and SCD2 validity intervalization.

The reference diffs two LIVE clusters; the recurring-diff deployments its
README describes (nightly source/target reconciliation) in practice feed
from change streams. These operators close that loop Spark-first: given
an append-only changelog of upserts/deletes, materialize the current
state (the thing you then diff/repair with
:mod:`~cassandra_diff_spark.operators.digest` at phase-2 cost), roll an
existing snapshot forward, or intervalize history for point-in-time
queries via :func:`~cassandra_diff_spark.operators.temporal.
interval_join`.

Scale shapes (the reason these are not "just a window"):

* :func:`latest_state` is a ``max_by`` hash AGGREGATION, not a
  ``row_number() = 1`` window: the aggregation partial-combines map-side
  (each input partition collapses to at most its distinct keys before
  the shuffle — a changelog with 100 updates/key moves ~1% of itself),
  while the window formulation shuffles and SORTS every version of every
  row. Same result, provably (the gate oracle IS the window
  formulation).
* :func:`apply_changelog` = union + the same aggregation: one shuffle
  over snapshot + delta, no join.
* :func:`scd2_intervals` is the one true window here (each version needs
  its SUCCESSOR's timestamp) — one shuffle + sort, emitting
  ``[valid_from, valid_to)`` rows; open versions get a null
  ``valid_to``.

Version ordering is the total order ``(ts, seq)`` — ``seq`` disambiguates
same-timestamp writes (a CDC log's offset/LSN); ties broken by GREATEST,
consistent with the temporal operators' tiebreak contract.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: op-column values: upsert (insert-or-update) and delete.
OP_UPSERT = "U"
OP_DELETE = "D"


def _not_delete(col):
    """Null-safe "is not a delete": a NULL op code is an upsert, never a
    silent drop (``col != 'D'`` is NULL for null ops, and a filter
    treats NULL as false — a malformed changelog row would vanish from
    the compacted state)."""
    return ~(col.eqNullSafe(F.lit(OP_DELETE)))


def _version_ord(ts_col: str, seq_col: Optional[str]):
    if seq_col is None:
        return F.struct(F.col(ts_col).alias("ts"))
    return F.struct(F.col(ts_col).alias("ts"), F.col(seq_col).alias("seq"))


def latest_state(
    changelog: DataFrame,
    keys: Sequence[str],
    *,
    ts_col: str = "op_ts",
    seq_col: Optional[str] = None,
    op_col: Optional[str] = "op",
) -> DataFrame:
    """Compact a changelog to current state: per key, the greatest
    ``(ts, seq)`` version wins; if that version is a delete
    (``op_col == "D"``) the key is absent from the output.

    Output columns = the changelog's, minus ``op_col``. Pass
    ``op_col=None`` for an upsert-only log (no tombstones).

    One hash shuffle with map-side partial aggregation: ``max_by(payload,
    version)`` combines within each input partition first, so a log with
    many versions per key ships roughly its key count, not its row
    count, through the Exchange — the property a row_number window
    (sort-based, no partial agg) cannot have.
    """
    keys = list(keys)
    payload_cols = [c for c in changelog.columns if c not in keys]
    ver = _version_ord(ts_col, seq_col)
    latest = changelog.groupBy(*keys).agg(
        F.max_by(F.struct(*[F.col(c) for c in payload_cols]), ver).alias("__v")
    )
    out = latest.select(
        *keys, *[F.col(f"__v.{c}").alias(c) for c in payload_cols]
    )
    if op_col is not None:
        out = out.filter(_not_delete(F.col(op_col))).drop(op_col)
    return out


def apply_changelog(
    snapshot: DataFrame,
    changelog: DataFrame,
    keys: Sequence[str],
    *,
    ts_col: str = "op_ts",
    seq_col: Optional[str] = None,
    op_col: str = "op",
) -> DataFrame:
    """Roll a snapshot forward: apply a changelog's upserts/deletes on
    top of an existing state table; returns the new state with the
    snapshot's columns.

    The snapshot's rows participate as version ``(-inf)`` — any
    changelog entry for a key outranks it. Union + one ``max_by``
    aggregation shuffle; no join, so a delta of d rows over a snapshot
    of N costs one (N + d)-row shuffle whose map side collapses to the
    key count. For the TINY-delta regime, filter the snapshot first with
    a broadcast semi-join on the changelog's keys and union the
    untouched remainder — at that point the digest-pruned recurring
    diff (:mod:`~cassandra_diff_spark.operators.digest`) is the better
    tool anyway.

    Changelog rows must carry the snapshot's columns (plus
    ``ts/seq/op``); extra changelog columns are dropped.
    """
    keys = list(keys)
    snap_cols = list(snapshot.columns)
    missing = [c for c in snap_cols if c not in changelog.columns]
    if missing:
        raise ValueError(
            f"changelog lacks snapshot columns {missing}; upserts must "
            f"carry full rows"
        )
    # snapshot rows must rank BELOW every changelog version; null
    # timestamps can't express that portably (aggregation comparators
    # don't promise nulls-first), so the version struct gets an explicit
    # leading rank: (0, null-version) snapshot, (1, version) changelog.
    ver = _version_ord(ts_col, seq_col)
    cl = changelog.select(
        *keys,
        F.struct(
            *[F.col(c) for c in snap_cols if c not in keys],
            F.col(op_col).alias("__op"),
        ).alias("__p"),
        F.struct(F.lit(1).alias("rank"), ver.alias("v")).alias("__ver"),
    )
    ver_type = cl.schema["__ver"].dataType["v"].dataType.simpleString()
    sn = snapshot.select(
        *keys,
        F.struct(
            *[F.col(c) for c in snap_cols if c not in keys],
            F.lit(OP_UPSERT).alias("__op"),
        ).alias("__p"),
        F.struct(
            F.lit(0).alias("rank"),
            F.lit(None).cast(ver_type).alias("v"),
        ).alias("__ver"),
    )
    u = sn.unionByName(cl)
    latest = u.groupBy(*keys).agg(F.max_by("__p", "__ver").alias("__v"))
    return (
        latest.filter(_not_delete(F.col("__v.__op")))
        .select(*keys, *[F.col(f"__v.{c}").alias(c) for c in snap_cols if c not in keys])
    )


def scd2_intervals(
    changelog: DataFrame,
    keys: Sequence[str],
    *,
    ts_col: str = "op_ts",
    seq_col: Optional[str] = None,
    op_col: Optional[str] = "op",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Intervalize a changelog into SCD2 validity rows: each version
    becomes ``[valid_from, valid_to)`` where ``valid_to`` is the NEXT
    version's timestamp for the same key (null = still current). Delete
    versions close the preceding interval but emit no row themselves.

    Point-in-time lookups then become containment joins
    (:func:`~cassandra_diff_spark.operators.temporal.interval_join`) or
    plain ``valid_from <= t AND (valid_to IS NULL OR t < valid_to)``
    predicates — the classic warehouse shape.

    One shuffle + per-key sort (``lead`` genuinely needs the successor);
    for hot keys the same chunking argument as
    :func:`~cassandra_diff_spark.operators.temporal.asof_join_chunked`
    applies, but a key hot enough to matter in a DIMENSION history is
    rare — revisit if one appears.
    """
    from pyspark.sql import Window

    keys = list(keys)
    order = [F.col(ts_col).asc()]
    if seq_col is not None:
        order.append(F.col(seq_col).asc())
    w = Window.partitionBy(*keys).orderBy(*order)
    out = changelog.withColumn(valid_from, F.col(ts_col)).withColumn(
        valid_to, F.lead(ts_col).over(w)
    )
    if op_col is not None:
        out = out.filter(_not_delete(F.col(op_col))).drop(op_col)
    return out.drop(ts_col, *( [seq_col] if seq_col else [] ))
