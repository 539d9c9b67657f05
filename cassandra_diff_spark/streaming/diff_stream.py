"""Structured Streaming surface.

The reference is batch-only (SURVEY.md §2.8) — this module is the
beyond-reference streaming mode: continuous diffing of an incoming change
stream against a reference snapshot, plus the standard event-time
operators (windowed aggregation with watermarks, session windows, custom
stateful processing) a training-data ingest pipeline needs.

Patterns:
  * windowed_event_counts — watermark + tumbling/sliding window agg;
    late data beyond the watermark is dropped by Spark's state store.
  * stream_diff — foreachBatch incremental diff: each micro-batch of
    source-side changes is diffed (set alignment) against the target
    snapshot; mismatch rows append to the journal. Exactly-once per batch
    via foreachBatch's epoch id is left to the sink (parquet append is
    at-least-once; a Delta sink would make it exactly-once).
  * sessionize — session_window gap-based grouping.
  * running_user_totals — applyInPandasWithState custom stateful operator
    (running per-user aggregates with processing-time timeout).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from cassandra_diff_spark.model import TableSpec

_INT_STATE_TYPES = ("tinyint", "smallint", "int", "integer", "bigint", "long")



def _drain(w, checkpoint: "str | None") -> None:
    """Start an availableNow writer and block until it drains.

    A caller-supplied ``checkpoint`` (the durable production path) is
    honored verbatim and kept. Without one, the drain's checkpoint is
    EPHEMERAL by definition — the result is read back from the sink and
    nothing ever resumes the query — so it goes to a unique directory
    on the fastest local scratch and is removed after the drain.
    Per-trigger state-store commits are the dominant drain cost, and an
    interleaved A/B (r12, sf0.1, medians of 3, A-B-A bracketed) measured
    the stateful drains 20-30% faster with tmpfs scratch than with the
    java.io.tmpdir default on disk (events_asof_stream_forward
    18.2/20.1 s -> 14.0 s, events_asof_stream 10.0/11.1 -> 7.4,
    events_interval_stream 6.9/7.3 -> 5.6; the foreachBatch drains
    moved within noise). Scratch root: $SPARK_GRAFT_STREAM_SCRATCH,
    defaulting to /dev/shm when present; without either, Spark's own
    temp-checkpoint behavior (java.io.tmpdir, delete-on-stop) applies
    unchanged."""
    import os
    import shutil
    import uuid

    tmp = None
    if checkpoint:
        w = w.option("checkpointLocation", checkpoint)
    else:
        root = os.environ.get("SPARK_GRAFT_STREAM_SCRATCH") or "/dev/shm"
        if os.path.isdir(root):
            tmp = os.path.join(root, f"cds_drain_ckpt_{uuid.uuid4().hex}")
            w = w.option("checkpointLocation", tmp)
    try:
        q = w.start()
        q.awaitTermination()
    finally:
        if tmp is not None:
            shutil.rmtree(tmp, ignore_errors=True)

def _py_state_values(series, spark_type):
    """Union pdf columns arrive as float64 (NaN on the other side's
    rows); applyInPandasWithState state arrays silently NULL a float
    stored into an integer slot — convert to exact Python values first.
    Shared by every stateful operator that banks payload columns from a
    side-tagged union into state (the r8 sf0.1 sweep caught
    stream_interval_join missing this: one cross-batch interval's
    bigint payload came back NULL while its int()-converted bounds
    survived)."""
    import numpy as np

    out = []
    for x in series.tolist():
        if x is None or (isinstance(x, float) and np.isnan(x)):
            out.append(None)
        elif spark_type in _INT_STATE_TYPES:
            out.append(int(x))
        elif spark_type == "boolean":
            out.append(bool(x))
        else:
            out.append(x)
    return out
from cassandra_diff_spark.operators.diff import build_diff


def windowed_event_counts(
    events: DataFrame,
    window: str = "5 minutes",
    slide: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Event-time windowed counts with late-data watermark."""
    win = (
        F.window("ts", window, slide) if slide else F.window("ts", window)
    )
    return (
        events.withWatermark("ts", watermark)
        .groupBy(win.alias("win"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n",
            "total_value",
        )
    )


def sessionize(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Session windows per user: activity bursts separated by >= gap."""
    return (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", gap).alias("sess"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            "n_events",
        )
    )


def stream_diff(
    stream: DataFrame,
    target: DataFrame,
    spec: TableSpec,
    on_batch: Callable[[DataFrame, int], None],
):
    """Continuous diff: per micro-batch, compare the batch's rows (keyed by
    the spec's partition key) against the target snapshot and hand the
    mismatch DataFrame to ``on_batch``.

    Semantics per batch: the batch is the source side RESTRICTED to the
    keys it contains — target rows whose keys aren't in the batch are not
    "missing", so only_in_target rows are filtered out (a change stream
    only asserts the keys it carries).
    """

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        if not batch_df.take(1):
            return
        keys = batch_df.select(*spec.partition_key).distinct()
        tgt_slice = target.join(F.broadcast(keys), list(spec.partition_key), "left_semi")
        res = build_diff(batch_df, tgt_slice, spec, align="set")
        mm = res.mismatches.filter(F.col("mismatch_type") != "ONLY_IN_TARGET")
        on_batch(mm, epoch_id)

    return stream.writeStream.foreachBatch(process)


#: output schema of running_user_totals
_TOTALS_SCHEMA = "user_id bigint, n_events bigint, total_value double"
_STATE_SCHEMA = "n bigint, total double"


def stream_exact_dedup(
    stream: DataFrame,
    text_col: str,
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """First-seen exact dedup of a document STREAM: fingerprint each
    record (functions/text.fingerprint — same normalization as the batch
    ``exact_dedup``) and emit only the first occurrence. State is bounded
    by the watermark: a duplicate arriving later than ``watermark`` after
    its original re-emits — the standard streaming-dedup tradeoff
    (``dropDuplicatesWithinWatermark`` semantics). The batch operator
    remains the exactness baseline; this is the ingest-time guard."""
    from cassandra_diff_spark.functions.text import fingerprint

    return (
        stream.withColumn("fp", fingerprint(F.col(text_col)))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["fp"])
    )


def snapshot_stream_diff(
    stream: DataFrame,
    target: DataFrame,
    spec: TableSpec,
    *,
    keys_dir: str,
    align: str = "set",
) -> DataFrame:
    """Full 9-counter diff of a STREAMED source against a static target
    snapshot: each micro-batch diffs against the target slice sharing its
    keys (matched / mismatched / only_in_source accumulate driver-side —
    the per-batch stats are one-row collects), batch keys journal to
    ``keys_dir``, and after the availableNow drain the target keys never
    seen in the stream become only_in_target via one anti-join. The
    drained result equals ``build_diff(source, target).stats`` exactly,
    so the batch diff's DuckDB oracle gates the streaming runtime.

    Contract (same shape as the reference's partition-atomic paging): all
    rows of a source partition must arrive within ONE micro-batch —
    file-source batches split at file boundaries, so write each partition
    key's rows to one file (any layout produced by a partition-key
    shuffle or bucketed write satisfies this). Keys may not straddle
    batches or their per-partition counters would double-count."""
    from cassandra_diff_spark.model import STAT_FIELDS, DiffStats

    spark = target.sparkSession
    pk = list(spec.partition_key)
    totals = DiffStats()

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        if not batch_df.take(1):
            return
        keys = batch_df.select(*pk).distinct()
        keys.write.mode("append").parquet(keys_dir)
        tgt_slice = target.join(F.broadcast(keys), pk, "left_semi")
        res = build_diff(batch_df, tgt_slice, spec, align=align)
        totals.accumulate(DiffStats.from_row(res.stats.collect()[0]))

    q = (
        stream.writeStream.foreachBatch(process)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    seen = spark.read.parquet(keys_dir).distinct()
    totals.only_in_target += (
        target.join(seen, pk, "left_anti").select(*pk).distinct().count()
    )
    row = {"table": spec.name, **{f: getattr(totals, f) for f in STAT_FIELDS}}
    return spark.createDataFrame([row]).select(
        "table", *[F.col(f).cast("long").alias(f) for f in STAT_FIELDS]
    )


def digest_stream(
    stream: DataFrame,
    spec: TableSpec,
    *,
    name: str,
    n_buckets: int = 4096,
    token=None,
    row_hash=None,
    checkpoint: str | None = None,
) -> DataFrame:
    """Streaming bucket digests: the drift-monitoring primitive
    (operators/digest.py) computed as a COMPLETE-mode streaming
    aggregation — count / sum-mod / bit_xor are all order-independent
    and map-side-combinable, so the running digest state is exactly
    ``n_buckets`` rows no matter how much data streams through.

    Runs the query with an availableNow trigger into an in-memory table
    and returns the drained final frame: deterministic and IDENTICAL to
    the batch :func:`~cassandra_diff_spark.operators.digest.
    bucket_digests` over the same data (the oracle-paired gate asserts
    this through the same DuckDB SQL as the batch digest compare). In
    production the same plan runs unbounded (processingTime trigger,
    parquet/Delta sink) to keep a live drift signal against a static
    snapshot's digests."""
    from cassandra_diff_spark.operators.digest import bucket_digests

    agg = bucket_digests(
        stream, spec, n_buckets=n_buckets, token=token, row_hash=row_hash
    )
    w = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
    )
    _drain(w, checkpoint)
    return stream.sparkSession.table(name)


def running_user_totals(events: DataFrame) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: running
    per-user event count + value sum across micro-batches."""
    import pandas as pd

    def update(key, pdfs, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=_TOTALS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_minhash_dedup(
    stream: DataFrame,
    index_dir: str,
    out_dir: str,
    id_col: str,
    text_col: str,
    *,
    n: int = 3,
    min_agree_num: int = 1,
    min_agree_den: int = 2,
) -> DataFrame:
    """Streaming ingest dedup against a GROWING MinHash signature index:
    each micro-batch is deduped with
    :func:`~cassandra_diff_spark.operators.dedup.minhash_lsh_incremental`
    against the signatures persisted so far (original corpus + every
    earlier batch), its verified duplicate relations append to
    ``out_dir``, and its own signatures append to ``index_dir`` — so the
    index grows with ingestion and history text is never re-read.

    Returns the drained decision table ``(new_id, dup_id, n_agree,
    est_sim)`` — one row per verified relation "stream doc new_id
    duplicates earlier doc dup_id". With stream ids MONOTONE across
    batches (the normal ingest shape), the drained table equals the
    one-shot ``minhash_lsh_incremental(all_stream_docs, corpus_sigs)``
    run minus its dup_in label (a cross-batch stream duplicate is served
    from the index, indistinguishable from original corpus by design);
    out-of-order ids across batches would report reversed pairs instead.
    Parquet appends are at-least-once under batch retry — same caveat as
    stream_diff (a Delta/transactional sink upgrades both to
    exactly-once).
    """
    from cassandra_diff_spark.operators.dedup import (
        minhash_lsh_incremental,
        minhash_signatures,
    )

    spark = stream.sparkSession

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        if not batch_df.take(1):
            return
        sigs = spark.read.parquet(index_dir)
        dups = minhash_lsh_incremental(
            batch_df, sigs, id_col, text_col, n,
            min_agree_num=min_agree_num, min_agree_den=min_agree_den,
        ).drop("dup_in")
        dups.write.mode("append").parquet(out_dir)
        # index ALL batch signatures (dups included): one-shot parity
        # requires later docs to compare against every earlier doc, not
        # only the novel ones
        minhash_signatures(batch_df, id_col, text_col, n).write.mode(
            "append"
        ).parquet(index_dir)

    q = (
        stream.writeStream.foreachBatch(process)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out_dir)


def stream_asof_join(
    left: DataFrame,
    right: DataFrame,
    on,
    *,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols,
    right_tiebreak: str | None = None,
    strict: bool = False,
    tolerance_us: int | None = None,
    prefix: str = "r_",
    name: str,
    prune_keep_us: int | None = None,
    checkpoint: str | None = None,
) -> DataFrame:
    """Stream-stream as-of join: every LEFT stream row picks the nearest
    RIGHT stream row at-or-before (``strict``: strictly-before) its
    timestamp, per key — the streaming twin of
    :func:`~cassandra_diff_spark.operators.temporal.asof_join`
    (backward), implemented as ONE ``applyInPandasWithState`` stateful
    operator over the side-tagged union of the two streams. (The FORWARD
    direction is deliberately absent: it needs future right rows, i.e. a
    watermark-delayed emit — buffer left rows in state and flush them as
    the right frontier passes; use the batch operator until a real
    watermark-driven variant exists.)

    Per-key state is the right-side history, collapsed to the greatest-
    tiebreak row per timestamp (rows a backward as-of can never pick are
    dropped at ingest, so state size is bounded by DISTINCT right
    timestamps per key, not right rows). Each micro-batch ingests its
    right rows FIRST, then matches its left rows against the full
    history — so a right row matches left rows of its own batch.

    Ordering contract (the same one every foreachBatch operator here
    documents): micro-batches must arrive event-time-ordered per key —
    a left row's candidate right rows (ts at-or-before it) must be in
    the same or an earlier batch. File sources get this by stamping
    time-partitioned files in order (see the gate); a Kafka deployment
    gets it from per-key partition ordering. Under that contract the
    drained result equals the batch operator exactly (pytest + the
    oracle-paired gate assert it, including the tiebreak contract).

    ``prune_keep_us``: state TTL for 100 TB streams — right rows older
    than (key's max right ts - prune_keep_us) collapse to the single
    newest such row (the carry a backward as-of still needs). Exact as
    long as no left row arrives more than ``prune_keep_us`` behind its
    key's right-side frontier; None (default) keeps full history.

    Drains an availableNow trigger into an in-memory table and returns
    the final frame; in production the same plan runs unbounded with a
    processingTime trigger into a parquet/Delta sink.
    """
    import numpy as np
    import pandas as pd

    on = list(on)
    right_cols = list(right_cols)
    ltypes = dict(left.dtypes)
    rtypes = dict(right.dtypes)
    lpayload = [c for c in left.columns if c not in on and c != left_ts]
    tb_type = rtypes[right_tiebreak] if right_tiebreak is not None else "int"
    tb = (
        F.col(right_tiebreak) if right_tiebreak is not None else F.lit(0)
    )

    # side-tagged union; timestamps as epoch micros (pandas-friendly,
    # no tz round-trip in state)
    r_sel = [F.col(c) for c in on] + [
        F.unix_micros(F.col(right_ts).cast("timestamp")).alias("__ts"),
        F.lit(1).alias("__side"),
        tb.alias("__tb"),
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
        *[F.lit(None).cast(ltypes[c]).alias(f"__l_{c}") for c in lpayload],
    ]
    l_sel = [F.col(c) for c in on] + [
        F.unix_micros(F.col(left_ts).cast("timestamp")).alias("__ts"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(tb_type).alias("__tb"),
        *[F.lit(None).cast(rtypes[c]).alias(f"__r_{c}") for c in right_cols],
        *[F.col(c).alias(f"__l_{c}") for c in lpayload],
    ]
    u = right.select(*r_sel).unionByName(left.select(*l_sel))

    key_schema = ", ".join(f"{c} {dict(u.dtypes)[c]}" for c in on)
    out_schema = (
        key_schema
        + ", __ts long"
        + "".join(f", __l_{c} {ltypes[c]}" for c in lpayload)
        + ", __mts long"
        + "".join(f", __m_{c} {rtypes[c]}" for c in right_cols)
    )
    state_schema = (
        f"ts array<long>, tb array<{tb_type}>"
        + "".join(f", v_{c} array<{rtypes[c]}>" for c in right_cols)
    )
    n_vals = len(right_cols)
    out_cols = (
        on
        + ["__ts"]
        + [f"__l_{c}" for c in lpayload]
        + ["__mts"]
        + [f"__m_{c}" for c in right_cols]
    )

    def update(key, pdfs, state: GroupState):
        # r13 (guide §4.2): the per-key body is plain numpy arrays +
        # Python lists — the previous pandas formulation (a DataFrame
        # rebuilt from state, pd.concat, sort_values, drop_duplicates,
        # .iloc per emitted value) measured ~10 ms PER KEY per trigger
        # (updateMs 15-20 s across 8 state partitions for ~1500 keys,
        # plans/r13/*_prof_before.txt), which WAS the addBatch floor.
        # Every value still flows verbatim (same sort order, same pick
        # indices), so the drained result is bit-identical.
        if state.exists:
            st = state.get
            h_ts = np.asarray(st[0], dtype=np.int64)
            h_tb = list(st[1])
            h_v = [list(st[2 + i]) for i in range(n_vals)]
        else:
            h_ts = np.empty(0, dtype=np.int64)
            h_tb = []
            h_v = [[] for _ in range(n_vals)]

        l_ts_parts, l_pay_parts = [], {c: [] for c in lpayload}
        add_ts_parts, add_tb_parts = [], []
        add_v_parts: list = [[] for _ in range(n_vals)]
        for pdf in pdfs:
            side = pdf["__side"].to_numpy()
            rmask = side == 1
            if rmask.any():
                add_ts_parts.append(
                    pdf["__ts"].to_numpy()[rmask].astype(np.int64)
                )
                add_tb_parts.append(pdf["__tb"].to_numpy()[rmask])
                for i, c in enumerate(right_cols):
                    add_v_parts[i].append(
                        pdf[f"__r_{c}"].to_numpy()[rmask]
                    )
            lmask = side == 0
            if lmask.any():
                l_ts_parts.append(
                    pdf["__ts"].to_numpy()[lmask].astype(np.int64)
                )
                for c in lpayload:
                    l_pay_parts[c].append(pdf[f"__l_{c}"].to_numpy()[lmask])
        if add_ts_parts:
            all_ts = np.concatenate([h_ts] + add_ts_parts)
            all_tb = h_tb + [
                v for part in add_tb_parts for v in part.tolist()
            ]
            all_v = [
                h_v[i]
                + [v for part in add_v_parts[i] for v in part.tolist()]
                for i in range(n_vals)
            ]
            # stable sort by (ts, tb) — null tiebreak first, i.e. it
            # LOSES — then collapse to the greatest-tb row per ts (only
            # that row can ever be picked by a backward non-strict
            # as-of). np.lexsort is stable; non-numeric tiebreaks take
            # the (equally stable) Python tuple sort.
            notnull = np.fromiter(
                (
                    not (
                        v is None
                        or (isinstance(v, float) and np.isnan(v))
                    )
                    for v in all_tb
                ),
                dtype=np.int8,
                count=len(all_tb),
            )
            try:
                tb_key = np.asarray(
                    [
                        0 if not nn else v
                        for v, nn in zip(all_tb, notnull)
                    ],
                    dtype=np.float64
                    if tb_type in ("float", "double")
                    else np.int64,
                )
                order = np.lexsort((tb_key, notnull, all_ts))
            except (TypeError, ValueError, OverflowError):
                order = np.asarray(
                    sorted(
                        range(len(all_ts)),
                        key=lambda i: (
                            all_ts[i],
                            int(notnull[i]),
                            all_tb[i] if notnull[i] else 0,
                        ),
                    ),
                    dtype=np.int64,
                )
            sorted_ts = all_ts[order]
            last = np.empty(len(order), dtype=bool)
            if len(order):
                last[:-1] = sorted_ts[1:] != sorted_ts[:-1]
                last[-1] = True
            sel = order[last]
            h_ts = all_ts[sel]
            h_tb = [all_tb[i] for i in sel]
            h_v = [[col[i] for i in sel] for col in all_v]
            if prune_keep_us is not None and len(h_ts):
                floor = int(h_ts[-1]) - int(prune_keep_us)
                # keep everything newer than the floor, plus the single
                # newest at-or-below it (the carry)
                cut = max(0, int(np.searchsorted(h_ts, floor, "right")) - 1)
                if cut:
                    h_ts = h_ts[cut:]
                    h_tb = h_tb[cut:]
                    h_v = [col[cut:] for col in h_v]
            state.update((h_ts.tolist(), h_tb, *h_v))
        if not l_ts_parts:
            return
        l_ts = np.concatenate(l_ts_parts)
        if len(h_ts):
            # rightmost history row with ts <= left ts (strict: < — the
            # 'left' side excludes equal timestamps entirely, and the
            # per-ts collapse can't hide anything strict would pick):
            # searchsorted on the (ts,tb)-sorted, per-ts-collapsed history
            pos = (
                np.searchsorted(h_ts, l_ts, "left" if strict else "right")
                - 1
            )
            ok = pos >= 0
            if tolerance_us is not None:
                gap = l_ts - np.where(ok, h_ts[np.maximum(pos, 0)], 0)
                ok = ok & (gap <= int(tolerance_us))
            mts = [int(h_ts[p]) if o else None for p, o in zip(pos, ok)]
            mvals = {
                f"__m_{c}": [
                    h_v[i][p] if o else None for p, o in zip(pos, ok)
                ]
                for i, c in enumerate(right_cols)
            }
        else:
            mts = [None] * len(l_ts)
            mvals = {f"__m_{c}": [None] * len(l_ts) for c in right_cols}
        out = pd.DataFrame(
            {
                **{c: [key[i]] * len(l_ts) for i, c in enumerate(on)},
                "__ts": l_ts,
                **{
                    f"__l_{c}": np.concatenate(l_pay_parts[c])
                    for c in lpayload
                },
                "__mts": mts,
                **mvals,
            }
        )
        yield out[out_cols]

    stateful = u.groupBy(*on).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    w = (
        stateful.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
    )
    _drain(w, checkpoint)
    drained = left.sparkSession.table(name)
    return drained.select(
        *on,
        F.timestamp_micros(F.col("__ts")).alias(left_ts),
        *[F.col(f"__l_{c}").alias(c) for c in lpayload],
        F.timestamp_micros(F.col("__mts")).alias(f"{prefix}{right_ts}"),
        *[F.col(f"__m_{c}").alias(f"{prefix}{c}") for c in right_cols],
    )


def stream_asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    on,
    *,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols,
    tolerance_us: int,
    right_tiebreak: str | None = None,
    prefix: str = "r_",
    name: str,
    watermark_delay: str = "10 seconds",
    checkpoint: str | None = None,
) -> DataFrame:
    """Watermark-driven FORWARD stream-stream as-of: every LEFT row picks
    the nearest RIGHT row at-or-after its timestamp within
    ``tolerance_us`` — the direction that needs FUTURE right rows, so
    unlike :func:`stream_asof_join` it cannot emit in the left row's own
    batch. Left rows buffer in per-key state and emit exactly when the
    WATERMARK proves their answer final:

    * a candidate match (the minimal right ts at-or-after, greatest
      tiebreak among its ties) emits once ``watermark > candidate_ts`` —
      no earlier-or-tying right row can arrive anymore;
    * a left row with no candidate emits null once
      ``watermark > left_ts + tolerance_us`` — which is why the
      tolerance is REQUIRED: an unbounded forward match could stay
      unresolved forever.

    Event-time timeouts (not data) drive the final flush: the drain's
    closing watermark advance fires the timeout callback and resolves
    everything whose window has closed. Left rows still inside the
    tolerance window at end-of-stream remain unemitted — correct
    streaming semantics; a deployment appends a heartbeat/punctuation
    row (the gate does exactly this) to close the tail. State is pruned
    by the watermark: right history keeps only rows a pending or future
    left could still pick.

    No cross-batch ordering contract: the watermark (set here with
    ``watermark_delay`` on the union's event time) is the correctness
    mechanism, so arrival order doesn't matter up to the allowed
    lateness — rows later than the delay may resolve against an
    already-emitted answer and are then ignored.
    """
    import numpy as np
    import pandas as pd

    if tolerance_us is None:
        raise ValueError("forward stream as-of requires tolerance_us")
    on = list(on)
    right_cols = list(right_cols)
    ltypes = dict(left.dtypes)
    rtypes = dict(right.dtypes)
    lpayload = [c for c in left.columns if c not in on and c != left_ts]
    tb_type = rtypes[right_tiebreak] if right_tiebreak is not None else "int"
    tb = F.col(right_tiebreak) if right_tiebreak is not None else F.lit(0)
    tol = int(tolerance_us)

    r_sel = [F.col(c) for c in on] + [
        F.col(right_ts).cast("timestamp").alias("__et"),
        F.lit(1).alias("__side"),
        tb.alias("__tb"),
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
        *[F.lit(None).cast(ltypes[c]).alias(f"__l_{c}") for c in lpayload],
    ]
    l_sel = [F.col(c) for c in on] + [
        F.col(left_ts).cast("timestamp").alias("__et"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(tb_type).alias("__tb"),
        *[F.lit(None).cast(rtypes[c]).alias(f"__r_{c}") for c in right_cols],
        *[F.col(c).alias(f"__l_{c}") for c in lpayload],
    ]
    u = (
        right.select(*r_sel)
        .unionByName(left.select(*l_sel))
        .withWatermark("__et", watermark_delay)
    )

    utypes = dict(u.dtypes)
    key_schema = ", ".join(f"{c} {utypes[c]}" for c in on)
    out_schema = (
        key_schema
        + ", __ts long"
        + "".join(f", __l_{c} {ltypes[c]}" for c in lpayload)
        + ", __mts long"
        + "".join(f", __m_{c} {rtypes[c]}" for c in right_cols)
    )
    state_schema = (
        f"lts array<long>"
        + "".join(f", l_{c} array<{ltypes[c]}>" for c in lpayload)
        + f", rts array<long>, rtb array<{tb_type}>"
        + "".join(f", r_{c} array<{rtypes[c]}>" for c in right_cols)
    )
    n_l = len(lpayload)
    out_cols = (
        on
        + ["__ts"]
        + [f"__l_{c}" for c in lpayload]
        + ["__mts"]
        + [f"__m_{c}" for c in right_cols]
    )

    _py = _py_state_values

    def update(key, pdfs, state: GroupState):
        # r13 (guide §4.2): per-key body on numpy arrays + lists — the
        # pandas formulation (state rebuilt into a DataFrame, pd.concat
        # + sort_values + drop_duplicates per batch, and the same again
        # on every TIMEOUT sweep) measured ~10 ms per key per trigger
        # (updateMs 15-20 s + removeMs up to 12 s across 8 partitions,
        # plans/r13/events_asof_stream_forward_prof_before.txt). Values
        # flow verbatim; the drained result is bit-identical.
        lts, lvals = [], {c: [] for c in lpayload}
        r_ts_l: list = []
        r_tb: list = []
        r_v: list = [[] for _ in range(len(right_cols))]
        if state.exists:
            st = state.get
            lts = list(st[0])
            for i, c in enumerate(lpayload):
                lvals[c] = list(st[1 + i])
            r_ts_l = list(st[1 + n_l])
            r_tb = list(st[2 + n_l])
            r_v = [list(st[3 + n_l + i]) for i in range(len(right_cols))]
        r_ts = np.asarray(r_ts_l, dtype=np.int64)
        if not state.hasTimedOut:
            added = False
            for pdf in pdfs:
                side = pdf["__side"].to_numpy()
                rmask = side == 1
                if rmask.any():
                    added = True
                    r_ts_l.extend(
                        pdf["__et"]
                        .to_numpy()[rmask]
                        .astype("datetime64[us]")
                        .astype("int64")
                        .tolist()
                    )
                    r_tb.extend(_py(pdf["__tb"].iloc[rmask], tb_type))
                    for i, c in enumerate(right_cols):
                        r_v[i].extend(
                            _py(pdf[f"__r_{c}"].iloc[rmask], rtypes[c])
                        )
                lmask = side == 0
                if lmask.any():
                    lts.extend(
                        pdf["__et"]
                        .to_numpy()[lmask]
                        .astype("datetime64[us]")
                        .astype("int64")
                        .tolist()
                    )
                    for c in lpayload:
                        lvals[c].extend(_py(pdf[f"__l_{c}"].iloc[lmask], ltypes[c]))
            if added and r_ts_l:
                # forward pick = FIRST ts at-or-after, greatest tb among
                # its ties: stable sort (ts asc, nulls-first tb asc),
                # collapse per ts keeping the LAST (greatest tb)
                all_ts = np.asarray(r_ts_l, dtype=np.int64)
                notnull = np.fromiter(
                    (v is not None for v in r_tb),
                    dtype=np.int8,
                    count=len(r_tb),
                )
                try:
                    tb_key = np.asarray(
                        [0 if v is None else v for v in r_tb],
                        dtype=np.float64
                        if tb_type in ("float", "double")
                        else np.int64,
                    )
                    order = np.lexsort((tb_key, notnull, all_ts))
                except (TypeError, ValueError, OverflowError):
                    order = np.asarray(
                        sorted(
                            range(len(all_ts)),
                            key=lambda i: (
                                all_ts[i],
                                int(notnull[i]),
                                r_tb[i] if notnull[i] else 0,
                            ),
                        ),
                        dtype=np.int64,
                    )
                sorted_ts = all_ts[order]
                last = np.empty(len(order), dtype=bool)
                last[:-1] = sorted_ts[1:] != sorted_ts[:-1]
                last[-1] = True
                sel = order[last]
                r_ts = all_ts[sel]
                r_ts_l = r_ts.tolist()
                r_tb = [r_tb[i] for i in sel]
                r_v = [[col[i] for i in sel] for col in r_v]
        wm_us = state.getCurrentWatermarkMs() * 1000

        # resolve: emit every pending left whose answer the watermark
        # has made final. Vectorized — the per-key cost is
        # O(pending * log rights) in C per batch, so a key that buffers
        # many lefts across many batches never degenerates into a
        # Python row loop.
        lts_a = np.asarray(lts, dtype=np.int64)
        pos = np.searchsorted(r_ts, lts_a, "left")
        safe = np.minimum(pos, max(len(r_ts) - 1, 0))
        cand = r_ts[safe] if len(r_ts) else np.zeros(len(lts_a), dtype=np.int64)
        valid = (pos < len(r_ts)) & (cand - lts_a <= tol)
        emit_match = valid & (cand < wm_us)
        emit_null = ~valid & (lts_a + tol < wm_us)
        keep_mask = ~(emit_match | emit_null)
        keep_idx = np.flatnonzero(keep_mask)
        out = None
        if len(lts_a) and not keep_mask.all():
            out_idx = np.flatnonzero(~keep_mask)
            matched = emit_match[out_idx]
            mpos = safe[out_idx]
            data = {}
            for j, c in enumerate(on):
                data[c] = [key[j]] * len(out_idx)
            data["__ts"] = lts_a[out_idx]
            for c in lpayload:
                vals = lvals[c]
                data[f"__l_{c}"] = [vals[i] for i in out_idx]
            mcand = cand[out_idx]
            data["__mts"] = [
                int(t) if m else None for t, m in zip(mcand, matched)
            ]
            for i, c in enumerate(right_cols):
                col = r_v[i]
                data[f"__m_{c}"] = [
                    col[p] if m else None for p, m in zip(mpos, matched)
                ]
            out = pd.DataFrame(data, columns=out_cols)

        lts = [lts[i] for i in keep_idx]
        for c in lpayload:
            vals = lvals[c]
            lvals[c] = [vals[i] for i in keep_idx]
        # prune rights: only rows a pending left (ts >= min pending lt)
        # or a future left (ts >= watermark) could still pick —
        # r_ts is sorted, so the floor filter is one searchsorted cut
        if len(r_ts):
            floor = min([wm_us] + lts) if lts else wm_us
            cut = int(np.searchsorted(r_ts, floor, "left"))
            if cut:
                r_ts_l = r_ts_l[cut:]
                r_tb = r_tb[cut:]
                r_v = [col[cut:] for col in r_v]

        if not lts and not r_ts_l:
            if state.exists:
                state.remove()
        else:
            state.update(
                (
                    lts,
                    *[lvals[c] for c in lpayload],
                    r_ts_l,
                    r_tb,
                    *r_v,
                )
            )
            if lts:
                # wake when the earliest unresolved window can close
                nxt = min(
                    (lt + tol) for lt in lts
                )
                state.setTimeoutTimestamp(max(nxt // 1000 + 1, wm_us // 1000 + 1))
        if out is not None:
            yield out

    stateful = u.groupBy(*on).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
    w = (
        stateful.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
    )
    _drain(w, checkpoint)
    drained = left.sparkSession.table(name)
    return drained.select(
        *on,
        F.timestamp_micros(F.col("__ts")).alias(left_ts),
        *[F.col(f"__l_{c}").alias(c) for c in lpayload],
        F.timestamp_micros(F.col("__mts")).alias(f"{prefix}{right_ts}"),
        *[F.col(f"__m_{c}").alias(f"{prefix}{c}") for c in right_cols],
    )


def stream_check_rules(
    stream: DataFrame,
    rules,
    *,
    name: str,
    checkpoint: str | None = None,
) -> DataFrame:
    """Streaming data-quality monitor: the ROW-LOCAL rules (not_null /
    accepted_values / in_range / regex / custom predicate) fuse into the
    SAME single aggregation as the batch
    :func:`~cassandra_diff_spark.operators.validate.check_rules` and run
    it COMPLETE-mode — conditional sums are order-independent and
    map-side-combinable, so the running state is ONE row no matter how
    much data streams through. Drained output row-for-row equals the
    batch operator over the same data (oracle-gated).

    ``unique`` needs a streaming-unsupported distinct aggregation and
    ``foreign_key`` an anti-join pass — both are rejected loudly: run
    them in the batch sweep; the live monitor covers the per-row kinds.
    In production the same plan runs unbounded and each micro-batch
    updates the violation counters in place — the freshness/quality
    dashboard feed.
    """
    from cassandra_diff_spark.operators.validate import (
        _ROW_LOCAL,
        _violation_cond,
    )

    rules = list(rules)
    if not rules:
        raise ValueError("empty rule set")
    names = [r.name for r in rules]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate rule names: {sorted(names)}")
    bad = [r.name for r in rules if r.kind not in _ROW_LOCAL]
    if bad:
        raise ValueError(
            f"stream_check_rules supports row-local rules only; run "
            f"{bad} in the batch sweep"
        )
    aggs = [F.count(F.lit(1)).alias("__total")] + [
        F.sum(_violation_cond(r).cast("long")).alias(f"__v{i}")
        for i, r in enumerate(rules)
    ]
    agg = stream.agg(*aggs)
    w = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
    )
    _drain(w, checkpoint)
    one = stream.sparkSession.table(name)
    return one.select(
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
                    for i, r in enumerate(rules)
                ]
            )
        ).alias("r")
    ).select("r.*").withColumn("pass", F.col("violations") == 0)


def stream_quantiles_histogram(
    stream: DataFrame,
    value_col: str,
    probs,
    *,
    lo: float,
    hi: float,
    n_bins: int = 1024,
    by=None,
    name: str,
    checkpoint: str | None = None,
) -> DataFrame:
    """Streaming binned quantiles: the live-distribution monitor. The
    per-(group, bin) COUNT histogram — order-independent and map-side-
    combinable — runs as a COMPLETE-mode streaming aggregation, so the
    running state is ≤ ``n_bins`` rows per group no matter how much
    data streams through; the quantile extraction (cumulative windows +
    rank pick) runs on the DRAINED kilobyte-scale histogram table,
    where windows are legal and cheap.

    Drained output is deterministic and IDENTICAL to the batch
    :func:`~cassandra_diff_spark.operators.stats.quantiles_histogram`
    over the same data (oracle-gated). In production the same histogram
    plan runs unbounded (processingTime trigger, parquet/Delta sink)
    and the extraction is a trivial batch query over the sink — the
    p50/p99-dashboard recipe.
    """
    from cassandra_diff_spark.operators.stats import (
        _check_args,
        histogram_counts,
        quantiles_from_histogram,
    )

    _check_args(probs, lo, hi)
    by = list(by) if by else []
    width = (float(hi) - float(lo)) / int(n_bins)
    hist = histogram_counts(stream, value_col, by, lo, width, n_bins)
    w = (
        hist.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
    )
    _drain(w, checkpoint)
    drained = stream.sparkSession.table(name)
    return quantiles_from_histogram(drained, probs, by=by, lo=lo, width=width)


def stream_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on,
    *,
    point_ts: str = "ts",
    start: str = "start",
    end: str = "end",
    name: str,
    prune_keep_us: int | None = None,
    checkpoint: str | None = None,
) -> DataFrame:
    """Stream-stream containment join: every POINT stream row pairs with
    every INTERVAL stream row (same key) whose ``[start, end]`` (closed)
    contains its timestamp — the streaming twin of
    :func:`~cassandra_diff_spark.operators.temporal.interval_join`
    (inner), as one ``applyInPandasWithState`` operator over the
    side-tagged union of the two streams.

    Per-key state is the interval history; each micro-batch ingests its
    intervals FIRST, then matches its points against every interval seen
    so far — each (point, interval) pair emits exactly once, in the
    point's batch.

    Ordering contract: micro-batches must arrive event-time-ordered per
    key with intervals ordered by their START — a point's containing
    intervals all have ``start <= point_ts``, so under shared time-slice
    staging they sit in the same or an earlier batch (the same contract,
    and in the gate the same staged files, as :func:`stream_asof_join`).

    ``prune_keep_us``: state TTL — intervals whose ``end`` is more than
    this far behind the key's point-time frontier are dropped (they can
    no longer contain any future point under the ordering contract);
    None keeps full history.

    Drains an availableNow trigger into an in-memory table and returns
    the final frame (interval columns + point columns, like the batch
    operator's inner output).
    """
    import numpy as np
    import pandas as pd

    on = list(on)
    overlap = set(points.columns) & set(intervals.columns) - set(on)
    if overlap:
        raise ValueError(
            f"point/interval column name collision: {sorted(overlap)}; "
            f"rename before joining"
        )
    ptypes = dict(points.dtypes)
    itypes = dict(intervals.dtypes)
    ipayload = [c for c in intervals.columns if c not in on + [start, end]]
    ppayload = [c for c in points.columns if c not in on + [point_ts]]

    i_sel = [F.col(c) for c in on] + [
        F.unix_micros(F.col(start).cast("timestamp")).alias("__s"),
        F.unix_micros(F.col(end).cast("timestamp")).alias("__e"),
        F.lit(1).alias("__side"),
        F.lit(None).cast("long").alias("__pt"),
        *[F.col(c).alias(f"__i_{c}") for c in ipayload],
        *[F.lit(None).cast(ptypes[c]).alias(f"__p_{c}") for c in ppayload],
    ]
    p_sel = [F.col(c) for c in on] + [
        F.lit(None).cast("long").alias("__s"),
        F.lit(None).cast("long").alias("__e"),
        F.lit(0).alias("__side"),
        F.unix_micros(F.col(point_ts).cast("timestamp")).alias("__pt"),
        *[F.lit(None).cast(itypes[c]).alias(f"__i_{c}") for c in ipayload],
        *[F.col(c).alias(f"__p_{c}") for c in ppayload],
    ]
    u = intervals.select(*i_sel).unionByName(points.select(*p_sel))

    utypes = dict(u.dtypes)
    key_schema = ", ".join(f"{c} {utypes[c]}" for c in on)
    out_schema = (
        key_schema
        + ", __s long, __e long"
        + "".join(f", __i_{c} {itypes[c]}" for c in ipayload)
        + ", __pt long"
        + "".join(f", __p_{c} {ptypes[c]}" for c in ppayload)
    )
    state_schema = "s array<long>, e array<long>, hwm long" + "".join(
        f", i_{c} array<{itypes[c]}>" for c in ipayload
    )
    out_cols = (
        on
        + ["__s", "__e"]
        + [f"__i_{c}" for c in ipayload]
        + ["__pt"]
        + [f"__p_{c}" for c in ppayload]
    )

    def update(key, pdfs, state: GroupState):
        s_l, e_l, hwm = [], [], None
        ivals = {c: [] for c in ipayload}
        if state.exists:
            st = state.get
            s_l, e_l, hwm = list(st[0]), list(st[1]), st[2]
            for i, c in enumerate(ipayload):
                ivals[c] = list(st[3 + i])
        pt_parts, p_pay_parts = [], {c: [] for c in ppayload}
        added = False
        for pdf in pdfs:
            # r13 (guide §4.2): mask with numpy instead of slicing
            # per-side pandas sub-frames; point chunks accumulate as
            # arrays, not DataFrames — the per-key pandas construction
            # was the measured addBatch floor (see the asof twins)
            side = pdf["__side"].to_numpy()
            imask = side == 1
            if imask.any():
                added = True
                s_l.extend(pdf["__s"].to_numpy()[imask].astype(np.int64).tolist())
                e_l.extend(pdf["__e"].to_numpy()[imask].astype(np.int64).tolist())
                for c in ipayload:
                    # exact Python values, not the union frame's float64:
                    # a float stored into an integer state slot NULLs
                    # silently (see _py_state_values)
                    ivals[c].extend(
                        _py_state_values(pdf[f"__i_{c}"].iloc[imask], itypes[c])
                    )
            pmask = side == 0
            if pmask.any():
                pt_parts.append(
                    pdf["__pt"].to_numpy()[pmask].astype(np.int64)
                )
                for c in ppayload:
                    p_pay_parts[c].append(pdf[f"__p_{c}"].to_numpy()[pmask])
        out = None
        if pt_parts:
            pt_all = np.concatenate(pt_parts)
            hwm = max(int(pt_all.max()), hwm if hwm is not None else -(2**62))
            if s_l:
                # Vectorized containment resolve (same treatment the forward
                # as-of resolve got): broadcast-compare the point vector
                # against the interval bound arrays, one np.nonzero for all
                # (point, interval) hits — no per-row Python loop. The
                # point axis is CHUNKED so the dense hit matrix stays
                # bounded (~128 MB at 1M retained intervals) instead of
                # growing O(points x intervals) with the micro-batch.
                s_a = np.asarray(s_l, dtype=np.int64)
                e_a = np.asarray(e_l, dtype=np.int64)
                pt_a = pt_all
                pt_chunk = max(1, (1 << 27) // max(1, len(s_a)))
                pis, iis = [], []
                for c0 in range(0, len(pt_a), pt_chunk):
                    pc = pt_a[c0 : c0 + pt_chunk]
                    hit = (s_a[None, :] <= pc[:, None]) & (
                        e_a[None, :] >= pc[:, None]
                    )
                    cpi, cii = np.nonzero(hit)
                    pis.append(cpi + c0)
                    iis.append(cii)
                pi = np.concatenate(pis) if pis else np.empty(0, np.int64)
                ii = np.concatenate(iis) if iis else np.empty(0, np.int64)
                if len(pi):
                    data = {c: [key[k]] * len(pi) for k, c in enumerate(on)}
                    data["__s"] = s_a[ii]
                    data["__e"] = e_a[ii]
                    for c in ipayload:
                        col = ivals[c]
                        data[f"__i_{c}"] = [col[i] for i in ii]
                    data["__pt"] = pt_a[pi]
                    for c in ppayload:
                        data[f"__p_{c}"] = np.concatenate(p_pay_parts[c])[pi]
                    out = pd.DataFrame(data, columns=out_cols)
        if prune_keep_us is not None and hwm is not None and s_l:
            floor = hwm - int(prune_keep_us)
            keep = [i for i, e in enumerate(e_l) if e >= floor]
            if len(keep) < len(s_l):
                s_l = [s_l[i] for i in keep]
                e_l = [e_l[i] for i in keep]
                for c in ipayload:
                    ivals[c] = [ivals[c][i] for i in keep]
        if added or pt_parts:
            state.update((s_l, e_l, hwm, *[ivals[c] for c in ipayload]))
        if out is not None:
            yield out

    stateful = u.groupBy(*on).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    w = (
        stateful.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
    )
    _drain(w, checkpoint)
    drained = points.sparkSession.table(name)
    return drained.select(
        *on,
        F.timestamp_micros(F.col("__s")).alias(start),
        F.timestamp_micros(F.col("__e")).alias(end),
        *[F.col(f"__i_{c}").alias(c) for c in ipayload],
        F.timestamp_micros(F.col("__pt")).alias(point_ts),
        *[F.col(f"__p_{c}").alias(c) for c in ppayload],
    )


def stream_latest_state(
    stream: DataFrame,
    keys,
    *,
    name: str,
    ts_col: str = "op_ts",
    seq_col: str | None = None,
    op_col: str | None = "op",
    checkpoint: str | None = None,
) -> DataFrame:
    """Streaming CDC compaction: a changelog stream maintained as
    current state by the SAME max_by aggregation as the batch
    :func:`~cassandra_diff_spark.operators.cdc.latest_state` — running
    state is ONE struct per live key (the greatest-(ts, seq) version),
    map-side-combined within every micro-batch, in COMPLETE output mode.

    Drains an availableNow trigger into an in-memory table and returns
    the final state frame — deterministic and identical to the batch
    operator over the same rows (the gate asserts this against the
    window-formulation SQL oracle). The delete filter applies on the
    drained frame: tombstoned keys hold their (tiny) tombstone struct in
    state rather than vanishing, which is what lets a later upsert
    resurrect the key with correct ordering. In production the same
    plan runs unbounded with a processingTime trigger into a
    Delta/parquet sink serving point lookups."""
    from pyspark.sql import functions as F

    keys = list(keys)
    payload_cols = [c for c in stream.columns if c not in keys]
    if seq_col is None:
        ver = F.struct(F.col(ts_col).alias("ts"))
    else:
        ver = F.struct(F.col(ts_col).alias("ts"), F.col(seq_col).alias("seq"))
    agg = stream.groupBy(*[F.col(k) for k in keys]).agg(
        F.max_by(
            F.struct(*[F.col(c) for c in payload_cols]), ver
        ).alias("__v")
    )
    w = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
    )
    _drain(w, checkpoint)
    drained = stream.sparkSession.table(name)
    out = drained.select(
        *keys, *[F.col(f"__v.{c}").alias(c) for c in payload_cols]
    )
    if op_col is not None:
        # null-safe: a NULL op is an upsert, matching cdc.latest_state
        out = out.filter(~F.col(op_col).eqNullSafe("D")).drop(op_col)
    return out


def stream_rolling_anomaly(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    order_cols: "tuple[str, ...]" = ("event_id",),
    *,
    window: int = 20,
    z_int: int = 3,
    min_periods: int = 5,
    scale: int = 100,
    name: str = "cds_stream_rolling_anomaly",
    checkpoint: "str | None" = None,
) -> DataFrame:
    """Streaming twin of :func:`~cassandra_diff_spark.operators.stats.
    rolling_anomaly`: per-key rolling z-score flags emitted AS EVENTS
    ARRIVE — the live monitoring form of the batch sweep (alert on the
    anomalous reading now, not at tonight's batch).

    Same exactness contract as the batch op: values quantize to
    ``1/scale`` units with Spark's HALF_UP rounding and the test is the
    integer inequality ``(x*n - S)^2 (n-1) > z^2 (Q*n - S^2) n`` over
    the preceding ``window`` ROWS of the key (self excluded; null
    values occupy a row slot but contribute nothing, exactly like the
    batch ROWS frame) — so the drained stream equals the batch operator
    and shares its oracle.

    State per key: ONE array of the last ``window`` quantized values
    (nulls included for slot fidelity) — bounded, tiny, no TTL needed.
    Ordering contract (same as :func:`stream_asof_join`): rows are
    ordered by ``(ts, *order_cols)`` within each micro-batch by the
    operator, and batches must arrive in event-time order per key (file
    streams staged time-sliced satisfy this); out-of-order arrival
    ACROSS batches evaluates against the already-shipped window, which
    a real-time monitor inherently accepts.

    Drains an availableNow trigger into an in-memory table; production
    runs the same plan unbounded with a real sink.

    Cost shape: the per-batch kernel is vectorized (exact int64 prefix
    sums over [carry-in | batch]); wall-clock is dominated by the
    streaming runtime itself — applyInPandasWithState invokes once per
    (key, micro-batch), so many tiny key groups cost invocation
    overhead, not kernel time. On a real cluster those invocations
    spread across executors; batch :func:`~cassandra_diff_spark.
    operators.stats.rolling_anomaly` remains the backfill path.
    """
    import math

    import pandas as pd

    lo_n = max(int(min_periods), 2)
    w_n, z2, sc = int(window), int(z_int) * int(z_int), int(scale)
    types = dict(events.dtypes)
    out_schema = ", ".join(
        [f"`{key_col}` {types[key_col]}", f"`{ts_col}` {types[ts_col]}"]
        + [f"`{c}` {types[c]}" for c in order_cols]
        + ["value_c bigint", "n_prev bigint", "mean_c1000 bigint"]
    )

    def update(key, pdfs, state: GroupState):
        import numpy as np

        buf = list(state.get[0]) if state.exists else []
        out = None
        # concat BEFORE sorting: a group's batch rows can span multiple
        # Arrow chunks with no cross-chunk order guarantee — the
        # carry-buffer kernel is order-sensitive, so per-chunk sorting
        # would mis-window keys exceeding maxRecordsPerBatch rows in one
        # batch (same fix as stream_transitions)
        frames = [p for p in pdfs if len(p)]
        if frames:
            pdf = (
                pd.concat(frames, ignore_index=True)
                if len(frames) > 1
                else frames[0]
            )
            # stable ts-major sort via one lexsort (r13, guide §4.2 —
            # the per-key pandas sort + row-at-a-time quantization loop
            # was this operator's Python floor)
            # lexsort: LAST key is primary, so feed (least..most
            # significant) = reversed order_cols, then ts
            keys = [pdf[c].to_numpy() for c in (*reversed(order_cols), ts_col)]
            order = np.lexsort(tuple(keys))
            # vectorized HALF_UP-on-ties quantization, bit-equal to the
            # scalar form: v*sc floored; an EXACT .5 tie goes away from
            # zero (Spark round); everything else is round-half-even
            # (Python round == np.rint on float64)
            v = pdf[value_col].to_numpy(dtype=np.float64)[order] * sc
            nullmask = np.isnan(v)
            v0 = np.where(nullmask, 0.0, v)
            tie = np.abs(v0 - np.floor(v0)) == 0.5
            q = np.where(
                tie, np.trunc(v0) + np.copysign(1.0, v0), np.rint(v0)
            ).astype(np.int64)
            # rolling window over [carry-in buffer | batch]: EXACT int64
            # prefix sums (a float cumsum would shed low bits at ~2^53
            # and corrupt the integer inequality); nulls occupy slots
            # (ROWS-frame fidelity) but carry zero weight
            m = len(buf)
            bvals = np.fromiter(
                (0 if b is None else b for b in buf), dtype=np.int64, count=m
            )
            bvalid = np.fromiter(
                (b is not None for b in buf), dtype=np.int64, count=m
            )
            vals = np.concatenate([bvals, np.where(nullmask, 0, q)])
            valid = np.concatenate([bvalid, (~nullmask).astype(np.int64)])
            cs = np.concatenate([[0], np.cumsum(vals)])
            cq = np.concatenate([[0], np.cumsum(vals * vals)])
            cn = np.concatenate([[0], np.cumsum(valid)])
            idx = np.arange(m, m + len(q))
            lo = np.maximum(0, idx - w_n)
            s = cs[idx] - cs[lo]
            q2 = cq[idx] - cq[lo]
            n = cn[idx] - cn[lo]
            x = np.where(valid[m:] == 1, vals[m:], 0)
            with np.errstate(over="ignore"):
                lhs = (x * n - s) ** 2 * (n - 1)
                rhs = z2 * (q2 * n - s * s) * n
            flag = (valid[m:] == 1) & (n >= lo_n) & (lhs > rhs)
            hit = np.nonzero(flag)[0]
            if len(hit):
                src = order[hit]
                data = {
                    c: pdf[c].to_numpy()[src]
                    for c in (key_col, ts_col, *order_cols)
                }
                data["value_c"] = x[hit]
                data["n_prev"] = n[hit]
                # same float sequence as the scalar math.floor(1000.0*s/n)
                data["mean_c1000"] = np.floor(
                    (1000.0 * s[hit]) / n[hit]
                ).astype(np.int64)
                out = pd.DataFrame(
                    data,
                    columns=[
                        key_col, ts_col, *order_cols,
                        "value_c", "n_prev", "mean_c1000",
                    ],
                )
            comb_v = vals[-w_n:] if len(vals) > w_n else vals
            comb_ok = valid[-w_n:] if len(valid) > w_n else valid
            buf = [
                int(cv) if ok else None for cv, ok in zip(comb_v, comb_ok)
            ]
        state.update((buf,))
        if out is not None:
            yield out

    flagged = events.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType="buf array<bigint>",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    w = (
        flagged.writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
    )
    _drain(w, checkpoint)
    return events.sparkSession.table(name)


def _drain_complete(agg: DataFrame, name: str, checkpoint: "str | None" = None) -> DataFrame:
    """availableNow complete-mode drain into an in-memory table — the
    shared tail of the bounded-state streaming aggregations."""
    w = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
    )
    _drain(w, checkpoint)
    return agg.sparkSession.table(name)


def stream_cm_sketch(
    stream: DataFrame,
    col: str,
    *,
    depth: int = 4,
    width: int = 1024,
    seed: int = 0,
    name: str = "cds_stream_cm",
    checkpoint: "str | None" = None,
) -> DataFrame:
    """Streaming Count-Min build: the batch
    :func:`~cassandra_diff_spark.operators.sketch.cm_sketch_build`
    expression IS a map-side-combinable integer groupBy, so it runs
    unchanged as a COMPLETE-mode streaming aggregation with at most
    ``depth x width`` rows of state no matter how much data streams
    through — the live frequency store. Drained cells equal the batch
    build (same oracle through :func:`~cassandra_diff_spark.operators.
    sketch.cm_estimate`)."""
    from cassandra_diff_spark.operators.sketch import cm_sketch_build

    agg = cm_sketch_build(stream, col, depth=depth, width=width, seed=seed)
    return _drain_complete(agg, name, checkpoint)


def stream_calibration_bins(
    stream: DataFrame,
    score_col: str,
    label_col: str,
    *,
    n_bins: int = 10,
    lo: int,
    hi: int,
    name: str = "cds_stream_calib",
    checkpoint: "str | None" = None,
) -> DataFrame:
    """Streaming twin of :func:`~cassandra_diff_spark.operators.evaluate.
    calibration_bins`: the fixed-grid integer bin assignment plus the
    per-bin count/positive/score sums are one order-free,
    map-side-combinable groupBy, so the batch expression runs unchanged
    as a COMPLETE-mode streaming aggregation with at most ``n_bins``
    rows of state — a live reliability diagram that firms up as scored
    events arrive (drift in a bin's positive rate is the
    production signal that a deployed quality model's score stopped
    meaning what it claimed). Drained bins equal the batch operator
    over the same data by construction (oracle-gated)."""
    from cassandra_diff_spark.operators.evaluate import calibration_bins

    agg = calibration_bins(
        stream, score_col, label_col, n_bins=n_bins, lo=lo, hi=hi
    )
    return _drain_complete(agg, name, checkpoint)


def stream_decayed_count_state(
    stream: DataFrame,
    group_col: str,
    time_col: str,
    *,
    epoch_bucket: int,
    half_life_s: int = 86_400,
    max_shift: int = 40,
    name: str = "cds_stream_decay",
    checkpoint: "str | None" = None,
) -> DataFrame:
    """Streaming twin of :func:`~cassandra_diff_spark.operators.temporal.
    decayed_count_state`: the epoch-ALIGNED halving-bucket counts are a
    plain integer groupBy — order-free and map-side-combinable — so they
    run as a COMPLETE-mode streaming aggregation with at most
    ``groups x (max_shift + 1)`` rows of state no matter how much data
    streams through. Feed the drained frame to
    ``decayed_counts_from_state`` for live trending scores, or
    ``fold_decayed_states`` to merge it with persisted history (the
    epoch-aligned rebase makes that fold exact — the whole reason this
    family quantizes decay to absolute half-life buckets).

    Unlike the batch operator, the reference ``epoch_bucket`` must be
    given explicitly (``epoch_us(t) DIV (half_life_s * 1e6)`` of the
    chosen reference time): a stream cannot take ``max(ts)`` of data it
    has not seen yet. Any event NEWER than the reference epoch is a
    contract violation (its shift would be negative, silently producing
    garbage weights downstream), so the shift expression fail-fasts with
    ``raise_error`` instead — pick the epoch at or ahead of the stream's
    horizon, or rebase later via ``fold_decayed_states``.

    Drained output schema equals the batch state frame:
    ``(group, epoch_bucket, shift, n)``."""
    hl_us = int(half_life_s) * 1_000_000
    eb = int(epoch_bucket)
    # bound column, not name splicing: a time column needing backticks
    # must not break the expression (the calibration_bins rule); the
    # integer DIV runs on the pre-aliased __t below
    raw = F.expr(
        f"CAST({eb} AS BIGINT) - unix_micros(__t) DIV {hl_us}"
    )
    shift = F.when(
        raw < 0,
        F.raise_error(
            F.concat(
                F.lit(
                    f"stream_decayed_count_state: event newer than "
                    f"epoch_bucket={eb} (bucket "
                ),
                (F.lit(eb) - raw).cast("string"),
                F.lit(") — advance the reference epoch"),
            )
        ).cast("long"),
    ).otherwise(F.least(raw, F.lit(int(max_shift)).cast("long")))
    g = (
        stream.select(
            F.col(group_col).alias("group"), F.col(time_col).alias("__t")
        )
        .select("group", shift.alias("shift"))
        .groupBy("group", "shift")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    drained = _drain_complete(g, name, checkpoint)
    return drained.select(
        "group",
        F.lit(eb).cast("long").alias("epoch_bucket"),
        "shift",
        "n",
    )


def stream_bloom_build(
    stream: DataFrame,
    col: str,
    *,
    m_bits: int = 1 << 20,
    k: int = 5,
    seed: int = 0,
    name: str = "cds_stream_bloom",
    checkpoint: "str | None" = None,
) -> DataFrame:
    """Streaming bloom build: ``bit_or`` packing is order-free and
    idempotent, so the batch :func:`~cassandra_diff_spark.operators.
    sketch.bloom_build` runs as a COMPLETE-mode aggregation with at
    most ``ceil(m_bits/63)`` rows of state — a membership filter that
    tracks the stream (feed the drained frame to
    ``bloom_filter_keys``)."""
    from cassandra_diff_spark.operators.sketch import bloom_build

    agg = bloom_build(stream, col, m_bits=m_bits, k=k, seed=seed)
    return _drain_complete(agg, name, checkpoint)


def stream_majority_label(
    stream: DataFrame,
    item_col: str,
    label_col: str,
    *,
    name: str = "cds_stream_majority",
    checkpoint: "str | None" = None,
) -> DataFrame:
    """Streaming majority-vote label aggregation: the (item, label)
    vote COUNTS — order-free, map-side-combinable — run as the
    COMPLETE-mode state (one row per live (item, label) pair); winner
    resolution runs on the DRAINED count table through the SAME
    ``majority_from_counts`` tail as the batch operator, so drained
    output equals :func:`~cassandra_diff_spark.operators.evaluate.
    majority_label` over the same data by construction (oracle-gated).

    In production the count aggregation runs unbounded and the
    resolution is a trivial batch query over the sink — labels firm up
    as votes arrive."""
    from cassandra_diff_spark.operators.evaluate import majority_from_counts

    g = (
        stream.select(
            F.col(item_col).alias("item"),
            F.col(label_col).cast("string").alias("__label"),
        )
        .groupBy("item", "__label")
        .agg(F.count(F.lit(1)).alias("__cnt"))
    )
    return majority_from_counts(_drain_complete(g, name, checkpoint))


def stream_contamination(
    stream: DataFrame,
    benchmark_shingles: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    *,
    name: str = "cds_stream_contamination",
    checkpoint: "str | None" = None,
) -> DataFrame:
    """Streaming decontamination monitor: documents stream in, each one
    scored for n-gram overlap against a STATIC broadcast benchmark
    shingle frame (``shingle_set`` output, built once from the eval
    suites). The per-document (n_grams, n_overlap) counters are
    order-free sums keyed by doc id, so they run COMPLETE-mode (state =
    one row per seen doc); the milli-fraction projects off the drained
    table. Drained output equals the batch
    :func:`~cassandra_diff_spark.operators.curate.benchmark_contamination`
    over the same data (oracle-gated).

    The stream side is map-only before the aggregation: shingle
    explode + broadcast hash join — no stream-stream join, no
    watermark needed."""
    from cassandra_diff_spark.operators import tracked_cache
    from cassandra_diff_spark.operators.dedup import shingle_set

    doc_sh = shingle_set(stream, id_col, text_col, n)
    # cache the STATIC side (r13, guide §2.4): every micro-batch's
    # incremental plan re-instantiates the stream-static join, and the
    # uncached benchmark subtree (shingle explode + md5 + distinct) was
    # re-executed per trigger — 4 triggers paid 4 shingling passes at
    # the gate. The cache fills once and every later trigger's
    # broadcast build reads it.
    bench = tracked_cache(
        benchmark_shingles.select("h").distinct().withColumn("bh", F.col("h"))
    )
    hit = F.when(F.col("bh").isNotNull(), 1).otherwise(0)
    agg = (
        doc_sh.join(F.broadcast(bench), ["h"], "left")
        .groupBy("id")
        .agg(
            F.count("*").cast("long").alias("n_grams"),
            F.sum(hit).cast("long").alias("n_overlap"),
        )
    )
    drained = _drain_complete(agg, name, checkpoint)
    return drained.select(
        "id",
        "n_grams",
        "n_overlap",
        F.expr("(n_overlap * 1000) div n_grams").alias("overlap_milli"),
    )


def stream_token_counts(
    stream: DataFrame,
    text_col: str,
    *,
    name: str = "cds_stream_tokcounts",
    checkpoint: "str | None" = None,
) -> DataFrame:
    """Streaming token-frequency build: the ``token_counts`` groupBy is
    an order-free map-side-combinable integer count, so it runs as a
    COMPLETE-mode aggregation with state bounded by the DISTINCT token
    count (vocabulary-sized, not corpus-sized). Drained counts equal
    the batch build exactly — feed them to ``vocab_from_counts`` for a
    live vocabulary or to ``js_divergence`` against a persisted
    baseline for the live drift monitor."""
    from cassandra_diff_spark.functions.text import words

    agg = (
        stream.select(F.explode(words(F.col(text_col))).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return _drain_complete(agg, name, checkpoint)


def stream_class_metrics(
    stream: DataFrame,
    truth_col: str,
    pred_col: str,
    *,
    name: str = "cds_stream_classmetrics",
    checkpoint: "str | None" = None,
) -> DataFrame:
    """Streaming classifier QA: the (truth, pred) confusion-cell counts
    — order-free, map-side-combinable — run as the COMPLETE-mode state
    (|labels|² rows no matter how much data streams through); per-class
    P/R/F1 resolve on the DRAINED cell table through the SAME
    ``class_metrics_from_cells`` tail as the batch operator, so drained
    output equals :func:`~cassandra_diff_spark.operators.evaluate.
    class_metrics` by construction (oracle-gated). The live
    model-vs-golden dashboard feed."""
    from cassandra_diff_spark.operators.evaluate import class_metrics_from_cells

    cells = (
        stream.select(
            F.col(truth_col).cast("string").alias("truth"),
            F.col(pred_col).cast("string").alias("pred"),
        )
        .groupBy("truth", "pred")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return class_metrics_from_cells(_drain_complete(cells, name, checkpoint))


def stream_transitions(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    label_col: str,
    tiebreak_col: str,
    *,
    name: str = "cds_stream_transitions",
    checkpoint: "str | None" = None,
) -> DataFrame:
    """Streaming twin of :func:`~cassandra_diff_spark.operators.temporal.
    transition_matrix`'s bigram extraction: per-key label transitions
    emitted AS EVENTS ARRIVE — the live form of the behavioral-sequence
    profile (count the `view -> purchase` hop the moment it happens).

    State per key is ONE value: the latest label (plus a seen flag so a
    genuinely-NULL label is still a valid predecessor, exactly like the
    batch ``lead``). Each micro-batch sorts its rows by ``(ts,
    tiebreak)`` — the same total order the batch window uses — chains
    them onto the carried label, and yields one (from_label, to_label)
    row per adjacent pair. Drained bigrams therefore equal the batch
    operator's pre-aggregation pairs; the caller aggregates counts/ppm
    on the drained frame and shares the batch oracle.

    Ordering contract (same as :func:`stream_rolling_anomaly`): batches
    arrive event-time-ordered per key (time-sliced file staging).
    Bounded state: one label per key, no TTL needed.

    Integer label columns with any nulls arrive float64 from pandas;
    labels are restored to exact Python values via ``_py_state_values``
    before chaining/state (labels beyond 2^53 would lose bits at the
    Arrow->pandas boundary itself — a pandas-interchange limit shared
    by every ``applyInPandasWithState`` operator, pinned in tests).
    """
    import pandas as pd

    types = dict(events.dtypes)
    lab_t = types[label_col]
    out_schema = f"from_label {lab_t}, to_label {lab_t}"
    state_schema = f"seen boolean, last {lab_t}"

    def update(key, pdfs, state: GroupState):
        import numpy as np

        seen, last = (state.get if state.exists else (False, None))
        # concat BEFORE sorting: a group's micro-batch rows can span
        # multiple Arrow chunks with no cross-chunk order guarantee —
        # sorting per chunk would mis-order transitions for keys with
        # >maxRecordsPerBatch rows in one batch.
        # r13 (guide §4.2): sort with one stable np.lexsort over the
        # (ts, tiebreak) arrays instead of pd.concat + sort_values per
        # key — the per-key pandas construction was the measured
        # addBatch floor of this operator family.
        ts_parts, tb_parts, lab_parts = [], [], []
        for pdf in pdfs:
            if len(pdf):
                ts_parts.append(pdf[ts_col].to_numpy())
                tb_parts.append(pdf[tiebreak_col].to_numpy())
                lab_parts.append(pdf[label_col])
        frm, to = [], []
        if ts_parts:
            ts_a = np.concatenate(ts_parts)
            tb_a = np.concatenate(tb_parts)
            order = np.lexsort((tb_a, ts_a))  # stable, ts-major
            labs = _py_state_values(pd.concat(lab_parts), lab_t)
            for i in order:
                lab = labs[i]
                if seen:
                    frm.append(last)
                    to.append(lab)
                seen, last = True, lab
        state.update((seen, last))
        if frm:
            yield pd.DataFrame(
                {"from_label": frm, "to_label": to}, dtype=object
            )

    stateful = events.select(
        key_col, ts_col, tiebreak_col, label_col
    ).groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    w = (
        stateful.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
    )
    _drain(w, checkpoint)
    return events.sparkSession.table(name)
