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


class TestSnapshotDelta:
    def _snap(self, spark, rows):
        """rows: (key, a, b) — a nullable string, b double."""
        return spark.createDataFrame(
            [(k, a, None if b is None else float(b)) for k, a, b in rows],
            "k long, a string, b double",
        )

    def test_classification(self, spark):
        old = self._snap(spark, [(1, "x", 1.0), (2, "y", 2.0), (3, None, 3.0)])
        new = self._snap(spark, [(2, "y", 2.0), (3, None, 9.0), (4, "z", None)])
        from cassandra_diff_spark.operators.cdc import snapshot_delta

        got = {
            r.k: (r.op, r.a, r.b)
            for r in snapshot_delta(old, new, ["k"]).collect()
        }
        # key 2 identical -> absent; null payloads compare null-safely
        assert got == {
            1: ("D", "x", 1.0),
            3: ("U", None, 9.0),
            4: ("I", "z", None),
        }

    def test_null_only_change_detected(self, spark):
        old = self._snap(spark, [(1, "x", 1.0)])
        new = self._snap(spark, [(1, "x", None)])
        from cassandra_diff_spark.operators.cdc import snapshot_delta

        rows = snapshot_delta(old, new, ["k"]).collect()
        assert len(rows) == 1 and rows[0].op == "U" and rows[0].b is None

    def test_roundtrip_apply(self, spark):
        """apply_changelog(old, snapshot_delta(old, new)) == new."""
        rnd = random.Random(61)
        keys = list(range(40))
        old = self._snap(
            spark,
            [
                (k, rnd.choice(["x", "y", None]), rnd.choice([1.0, 2.0, None]))
                for k in keys
                if rnd.random() < 0.8
            ],
        )
        new = self._snap(
            spark,
            [
                (k, rnd.choice(["x", "y", None]), rnd.choice([1.0, 2.0, None]))
                for k in keys
                if rnd.random() < 0.8
            ],
        )
        from cassandra_diff_spark.operators.cdc import snapshot_delta

        delta = snapshot_delta(old, new, ["k"], ts_col="op_ts", ts_value=_ts(1))
        rolled = apply_changelog(old, delta, ["k"], ts_col="op_ts")
        assert sorted(
            (r.k, r.a, r.b) for r in rolled.collect()
        ) == sorted((r.k, r.a, r.b) for r in new.collect())

    def test_repair_ops_heals_target(self, spark):
        source = self._snap(spark, [(1, "x", 1.0), (2, "y", 2.0)])
        target = self._snap(spark, [(2, "y", 9.0), (3, "z", 3.0)])
        from cassandra_diff_spark.operators.cdc import repair_ops

        plan = repair_ops(source, target, ["k"])
        healed = apply_changelog(
            target, plan.withColumn("op_ts", F.lit(_ts(1))), ["k"], ts_col="op_ts"
        )
        assert sorted((r.k, r.a, r.b) for r in healed.collect()) == [
            (1, "x", 1.0),
            (2, "y", 2.0),
        ]

    def test_missing_column_raises(self, spark):
        old = self._snap(spark, [(1, "x", 1.0)]).drop("b")
        new = self._snap(spark, [(1, "x", 1.0)])
        from cassandra_diff_spark.operators.cdc import snapshot_delta

        with pytest.raises(ValueError, match="lacks columns"):
            snapshot_delta(old, new, ["k"])


class TestDiffKway:
    def test_majority_and_ties(self, spark):
        from cassandra_diff_spark.operators.diff import diff_kway

        def snap(rows):
            return spark.createDataFrame(rows, "k long, v string")

        a = snap([(1, "good"), (2, "good"), (3, "va")])
        b = snap([(1, "good"), (2, "bad"), (3, "vb")])
        c = snap([(1, "good"), (2, "good")])
        out = {
            r.k: r
            for r in diff_kway([("a", a), ("b", b), ("c", c)], ["k"]).collect()
        }
        r1 = out[1]
        assert (r1.n_present, r1.n_values, r1.majority_n) == (3, 1, 3)
        assert r1.consensus == "a,b,c" and r1.present == "a,b,c"
        assert bool(r1.consistent)
        r2 = out[2]
        assert (r2.n_present, r2.n_values, r2.majority_n) == (3, 2, 2)
        assert r2.consensus == "a,c" and not bool(r2.consistent)
        # key 3: 1-1 tie -> lexicographically smallest member name wins
        r3 = out[3]
        assert (r3.n_present, r3.n_values, r3.majority_n) == (2, 2, 1)
        assert r3.consensus == "a" and r3.present == "a,b"

    def test_validation(self, spark):
        from cassandra_diff_spark.operators.diff import diff_kway

        df = spark.createDataFrame([(1, "x")], "k long, v string")
        with pytest.raises(ValueError, match="at least two"):
            diff_kway([("a", df)], ["k"])
        with pytest.raises(ValueError, match="duplicate"):
            diff_kway([("a", df), ("a", df)], ["k"])
        with pytest.raises(ValueError, match="lacks columns"):
            diff_kway([("a", df), ("b", df.drop("v"))], ["k"])


class TestConsensusState:
    def _snap(self, spark, rows):
        return spark.createDataFrame(rows, "k long, v string")

    def test_majority_payload_and_quorum(self, spark):
        from cassandra_diff_spark.operators.diff import consensus_state

        a = self._snap(spark, [(1, "good"), (2, "good"), (3, None)])
        b = self._snap(spark, [(1, "good"), (2, "bad"), (3, "x")])
        c = self._snap(spark, [(1, "good"), (2, "good")])
        srcs = [("a", a), ("b", b), ("c", c)]
        full = {r.k: r for r in consensus_state(srcs, ["k"]).collect()}
        # nulls ride the winning row untouched; 1-1 tie at key 3 -> 'a'
        assert (full[1].v, full[1].n_votes) == ("good", 3)
        assert (full[2].v, full[2].n_votes) == ("good", 2)
        assert (full[3].v, full[3].n_votes) == (None, 1)
        q2 = {r.k for r in consensus_state(srcs, ["k"], quorum=2).collect()}
        assert q2 == {1, 2}

    def test_repair_to_consensus(self, spark):
        from cassandra_diff_spark.operators.cdc import apply_changelog, repair_ops
        from cassandra_diff_spark.operators.diff import consensus_state

        a = self._snap(spark, [(1, "good"), (2, "good")])
        b = self._snap(spark, [(1, "good"), (2, "bad"), (9, "junk")])
        c = self._snap(spark, [(1, "good"), (2, "good")])
        cons = consensus_state([("a", a), ("b", b), ("c", c)], ["k"]).drop(
            "n_votes"
        )
        plan = repair_ops(cons, b, ["k"], ts_col="op_ts", ts_value=None)
        healed = apply_changelog(b, plan, ["k"], ts_col="op_ts")
        assert sorted((r.k, r.v) for r in healed.collect()) == sorted(
            (r.k, r.v) for r in cons.collect()
        )


class TestDiffFamilyPlans:
    """Physical-shape assertions for the snapshot/k-way family: the
    docstring claims (single-shuffle union pairing; no joins) hold in
    the executed plan, so a regression that silently reintroduces a
    join or extra exchange fails loudly."""

    def _plan(self, df):
        return df._jdf.queryExecution().executedPlan().toString()

    def test_snapshot_delta_single_shuffle(self, spark):
        from cassandra_diff_spark.operators.cdc import snapshot_delta

        a = spark.createDataFrame([(1, "x")], "k long, v string")
        b = spark.createDataFrame([(1, "y")], "k long, v string")
        p = self._plan(snapshot_delta(a, b, ["k"]))
        assert p.count("Exchange") == 1
        assert "Join" not in p

    def test_kway_two_shuffles_no_join(self, spark):
        from cassandra_diff_spark.operators.diff import (
            consensus_state,
            diff_kway,
        )

        dfs = [
            (n, spark.createDataFrame([(1, "x")], "k long, v string"))
            for n in ("a", "b", "c")
        ]
        for op in (diff_kway, consensus_state):
            p = self._plan(op(dfs, ["k"]))
            assert p.count("Exchange hashpartitioning") == 2, op.__name__
            assert "Join" not in p, op.__name__
