"""CDC compaction operators: latest-state, snapshot roll-forward, SCD2
intervalization — randomized against a per-key brute-force replay."""

from __future__ import annotations

import random
from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from cassandra_diff_spark.operators.cdc import (
    apply_changelog,
    latest_state,
    scd2_intervals,
)

_EPOCH = datetime(1970, 1, 1)


def _ts(us: int) -> datetime:
    return _EPOCH + timedelta(microseconds=int(us))


def _mk_log(spark, rows):
    """rows: (key, ts_us, seq, value, op)"""
    return spark.createDataFrame(
        [(k, _ts(t), s, float(v), op) for k, t, s, v, op in rows],
        "k long, op_ts timestamp, seq long, v double, op string",
    )


class TestLatestState:
    def test_upserts_deletes_ties(self, spark):
        log = _mk_log(
            spark,
            [
                (1, 10, 0, 1.0, "U"),
                (1, 20, 1, 2.0, "U"),   # latest for key 1
                (2, 10, 2, 3.0, "U"),
                (2, 30, 3, 0.0, "D"),   # key 2 deleted
                (3, 10, 4, 4.0, "U"),
                (3, 10, 5, 5.0, "U"),   # same ts: greatest seq wins
            ],
        )
        got = {
            r.k: r.v
            for r in latest_state(log, ["k"], seq_col="seq").collect()
        }
        assert got == {1: 2.0, 3: 5.0}

    def test_no_op_col(self, spark):
        log = _mk_log(spark, [(1, 10, 0, 1.0, "U"), (1, 20, 1, 2.0, "U")])
        rows = latest_state(
            log.drop("op"), ["k"], seq_col="seq", op_col=None
        ).collect()
        assert len(rows) == 1 and rows[0].v == 2.0

    def test_randomized_vs_replay(self, spark):
        rnd = random.Random(23)
        rows = [
            (
                rnd.randrange(6),
                rnd.randrange(20),
                s,
                rnd.randrange(100),
                "D" if rnd.random() < 0.25 else "U",
            )
            for s in range(120)
        ]
        # brute force: replay in (ts, seq) order per key
        state = {}
        for k, t, s, v, op in sorted(rows, key=lambda r: (r[1], r[2])):
            if op == "D":
                state.pop(k, None)
            else:
                state[k] = float(v)
        got = {
            r.k: r.v
            for r in latest_state(_mk_log(spark, rows), ["k"], seq_col="seq").collect()
        }
        assert got == state


class TestApplyChangelog:
    def test_update_delete_insert(self, spark):
        snap = spark.createDataFrame(
            [(1, 1.0), (2, 2.0), (3, 3.0)], "k long, v double"
        )
        log = _mk_log(
            spark,
            [
                (1, 10, 0, 10.0, "U"),  # update
                (2, 10, 1, 0.0, "D"),   # delete
                (9, 10, 2, 9.0, "U"),   # insert
            ],
        ).select("k", "v", "op_ts", "seq", "op")
        got = {
            r.k: r.v
            for r in apply_changelog(snap, log, ["k"], seq_col="seq").collect()
        }
        assert got == {1: 10.0, 3: 3.0, 9: 9.0}

    def test_multi_version_delta(self, spark):
        snap = spark.createDataFrame([(1, 1.0)], "k long, v double")
        log = _mk_log(
            spark,
            [(1, 10, 0, 5.0, "U"), (1, 20, 1, 0.0, "D"), (1, 30, 2, 7.0, "U")],
        ).select("k", "v", "op_ts", "seq", "op")
        got = apply_changelog(snap, log, ["k"], seq_col="seq").collect()
        assert len(got) == 1 and got[0].v == 7.0

    def test_missing_column_raises(self, spark):
        snap = spark.createDataFrame([(1, 1.0)], "k long, v double")
        log = spark.createDataFrame(
            [(1, _ts(10), "U")], "k long, op_ts timestamp, op string"
        )
        with pytest.raises(ValueError, match="lacks snapshot columns"):
            apply_changelog(snap, log, ["k"])

    def test_randomized_vs_replay(self, spark):
        rnd = random.Random(29)
        snap_rows = [(k, float(rnd.randrange(50))) for k in range(8)]
        log_rows = [
            (
                rnd.randrange(12),
                rnd.randrange(20),
                s,
                rnd.randrange(100),
                "D" if rnd.random() < 0.3 else "U",
            )
            for s in range(80)
        ]
        state = dict(snap_rows)
        for k, t, s, v, op in sorted(log_rows, key=lambda r: (r[1], r[2])):
            if op == "D":
                state.pop(k, None)
            else:
                state[k] = float(v)
        snap = spark.createDataFrame(snap_rows, "k long, v double")
        log = _mk_log(spark, log_rows).select("k", "v", "op_ts", "seq", "op")
        got = {
            r.k: r.v
            for r in apply_changelog(snap, log, ["k"], seq_col="seq").collect()
        }
        assert got == state


class TestScd2Intervals:
    def test_chain_with_delete(self, spark):
        log = _mk_log(
            spark,
            [
                (1, 10, 0, 1.0, "U"),
                (1, 20, 1, 2.0, "U"),
                (1, 30, 2, 0.0, "D"),  # closes v=2.0, emits nothing
                (2, 10, 3, 9.0, "U"),  # open version
            ],
        )
        rows = sorted(
            scd2_intervals(log, ["k"], seq_col="seq").collect(),
            key=lambda r: (r.k, r.valid_from),
        )
        assert [(r.k, r.v) for r in rows] == [(1, 1.0), (1, 2.0), (2, 9.0)]
        assert rows[0].valid_to == _ts(20)
        assert rows[1].valid_to == _ts(30)  # delete closes the interval
        assert rows[2].valid_to is None  # still current

    def test_version_cols_dropped(self, spark):
        log = _mk_log(spark, [(1, 10, 0, 1.0, "U")])
        cols = scd2_intervals(log, ["k"], seq_col="seq").columns
        assert cols == ["k", "v", "valid_from", "valid_to"]


class TestNullOpIsUpsert:
    """A NULL op code is an upsert, never a silent drop (round-5 ADVICE:
    `op != 'D'` is NULL for null ops and the filter swallowed the row)."""

    def test_latest_state_null_op_kept(self, spark):
        log = _mk_log(
            spark,
            [(1, 10, 0, 1.0, "U"), (2, 10, 1, 2.0, "U"), (3, 5, 2, 3.0, "U")],
        ).unionByName(
            spark.createDataFrame(
                [(2, _ts(20), 3, 9.0, None), (3, _ts(9), 4, 8.0, None)],
                "k long, op_ts timestamp, seq long, v double, op string",
            )
        )
        got = {
            r.k: r.v for r in latest_state(log, ["k"], seq_col="seq").collect()
        }
        # null-op versions win their keys and survive as upserts
        assert got == {1: 1.0, 2: 9.0, 3: 8.0}

    def test_apply_changelog_null_op_kept(self, spark):
        snap = spark.createDataFrame([(1, 1.0)], "k long, v double")
        delta = spark.createDataFrame(
            [(1, _ts(10), 0, 5.0, None), (2, _ts(10), 1, 7.0, None)],
            "k long, op_ts timestamp, seq long, v double, op string",
        )
        got = {
            r.k: r.v
            for r in apply_changelog(
                snap, delta, ["k"], seq_col="seq"
            ).collect()
        }
        assert got == {1: 5.0, 2: 7.0}

    def test_scd2_null_op_emits_interval(self, spark):
        log = spark.createDataFrame(
            [(1, _ts(10), 0, 1.0, None), (1, _ts(20), 1, 2.0, "D")],
            "k long, op_ts timestamp, seq long, v double, op string",
        )
        rows = scd2_intervals(log, ["k"], seq_col="seq").collect()
        assert len(rows) == 1
        assert rows[0].v == 1.0 and rows[0].valid_to is not None
