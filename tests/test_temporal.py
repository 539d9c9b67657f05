"""Temporal join operators: as-of join (plain + hot-key-chunked),
interval containment join, LOCF resampling.

The randomized suites compare against brute-force references (a pandas
per-row scan for as-of; Spark's own inequality cross-join for
intervals) on adversarial data — duplicate keys, duplicate timestamps
(forcing the tiebreak contract), keys missing from one side, and chunk
widths from far-below to far-above the timestamp spacing.
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from cassandra_diff_spark.operators.temporal import (
    asof_join,
    asof_join_chunked,
    interval_join,
    resample_locf,
)

US = 1_000_000
_EPOCH = datetime(1970, 1, 1)


def _ts(us: int) -> datetime:
    return _EPOCH + timedelta(microseconds=int(us))


def _us(dt: datetime) -> int:
    return (dt - _EPOCH) // timedelta(microseconds=1)



def _mk_left(spark, rows):
    return spark.createDataFrame(
        [(k, _ts(t), i) for i, (k, t) in enumerate(rows)],
        "k long, ts timestamp, lid long",
    )


def _mk_right(spark, rows):
    return spark.createDataFrame(
        [
            (k, _ts(t), i, float(v))
            for i, (k, t, v) in enumerate(rows)
        ],
        "k long, ts timestamp, rid long, v double",
    )


def _brute_asof(lrows, rrows, *, direction="backward", strict=False, tol=None):
    """Per-left-row scan over the right side: the semantics spec."""
    out = {}
    for li, (lk, lt) in enumerate(lrows):
        best = None  # (ts, rid, v)
        for ri, (rk, rt, rv) in enumerate(rrows):
            if rk != lk:
                continue
            if direction == "backward":
                ok = rt < lt if strict else rt <= lt
                better = best is None or (rt, ri) > (best[0], best[1])
            else:
                ok = rt > lt if strict else rt >= lt
                # nearest following; among equal ts the greatest rid wins
                better = best is None or (-rt, ri) > (-best[0], best[1])
            if ok and better:
                best = (rt, ri, rv)
        if best is not None and tol is not None:
            gap = (lt - best[0]) if direction == "backward" else (best[0] - lt)
            if gap > tol:
                best = None
        out[li] = best
    return out


class TestAsofJoin:
    def test_basic_backward(self, spark):
        left = _mk_left(spark, [(1, 100), (1, 200), (2, 50)])
        right = _mk_right(spark, [(1, 90, 9.0), (1, 150, 15.0), (3, 10, 1.0)])
        got = {
            r.lid: (r.r_ts, r.r_v)
            for r in asof_join(
                left, right, ["k"], right_cols=["v"], right_tiebreak="rid"
            ).collect()
        }
        assert got[0] == (_ts(90), 9.0)
        assert got[1] == (_ts(150), 15.0)
        assert got[2] == (None, None)  # key 2 has no right rows

    def test_equal_ts_tiebreak_and_strict(self, spark):
        left = _mk_left(spark, [(1, 100)])
        # two right rows at the LEFT row's own ts: non-strict picks the
        # greatest rid; strict excludes both and falls back
        right = _mk_right(spark, [(1, 100, 1.0), (1, 100, 2.0), (1, 99, 0.5)])
        r = asof_join(
            left, right, ["k"], right_cols=["v"], right_tiebreak="rid"
        ).collect()[0]
        assert r.r_v == 2.0
        r = asof_join(
            left, right, ["k"], right_cols=["v"], right_tiebreak="rid",
            strict=True,
        ).collect()[0]
        assert r.r_v == 0.5

    def test_tolerance_nulls_stale_match(self, spark):
        left = _mk_left(spark, [(1, 100 * US), (1, 200 * US)])
        right = _mk_right(spark, [(1, 95 * US, 9.0)])
        rows = {
            r.lid: r.r_v
            for r in asof_join(
                left, right, ["k"], right_cols=["v"], right_tiebreak="rid",
                tolerance_us=10 * US,
            ).collect()
        }
        assert rows[0] == 9.0  # 5 s gap, within tolerance
        assert rows[1] is None  # 105 s gap, stale

    def test_forward(self, spark):
        left = _mk_left(spark, [(1, 100), (1, 300)])
        right = _mk_right(spark, [(1, 150, 15.0), (1, 250, 25.0)])
        rows = {
            r.lid: r.r_v
            for r in asof_join(
                left, right, ["k"], right_cols=["v"], right_tiebreak="rid",
                direction="forward",
            ).collect()
        }
        assert rows[0] == 15.0  # nearest following, not latest
        assert rows[1] is None

    def test_single_exchange_plan(self, spark):
        left = _mk_left(spark, [(1, 100)])
        right = _mk_right(spark, [(1, 90, 9.0)])
        df = asof_join(left, right, ["k"], right_cols=["v"], right_tiebreak="rid")
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange hashpartitioning") == 1

    @pytest.mark.parametrize("direction,strict", [
        ("backward", False), ("backward", True),
        ("forward", False), ("forward", True),
    ])
    def test_randomized_vs_brute(self, spark, direction, strict):
        rnd = random.Random(7)
        # tiny ts domain => many exact ties; keys 0-4, some left-only/
        # right-only
        lrows = [(rnd.randrange(5), rnd.randrange(30)) for _ in range(60)]
        rrows = [
            (rnd.randrange(6), rnd.randrange(30), rnd.randrange(100))
            for _ in range(80)
        ]
        want = _brute_asof(lrows, rrows, direction=direction, strict=strict)
        got = {
            r.lid: (None if r.r_v is None else (_us(r.r_ts), r.r_v))
            for r in asof_join(
                _mk_left(spark, lrows),
                _mk_right(spark, rrows),
                ["k"],
                right_cols=["v"],
                right_tiebreak="rid",
                direction=direction,
                strict=strict,
            ).collect()
        }
        assert len(got) == len(lrows)
        for li, best in want.items():
            assert got[li] == (None if best is None else (best[0], best[2])), li


class TestAsofChunked:
    @pytest.mark.parametrize("chunk_us", [1, 7, 1000])
    @pytest.mark.parametrize("strict", [False, True])
    @pytest.mark.parametrize("direction", ["backward", "forward"])
    def test_matches_unchunked(self, spark, chunk_us, strict, direction):
        rnd = random.Random(11)
        lrows = [(rnd.randrange(4), rnd.randrange(50)) for _ in range(70)]
        rrows = [
            (rnd.randrange(5), rnd.randrange(50), rnd.randrange(100))
            for _ in range(90)
        ]
        left, right = _mk_left(spark, lrows), _mk_right(spark, rrows)
        kw = dict(
            right_cols=["v"], right_tiebreak="rid", strict=strict,
            direction=direction,
        )
        plain = {
            r.lid: (r.r_ts, r.r_v)
            for r in asof_join(left, right, ["k"], **kw).collect()
        }
        chunked = {
            r.lid: (r.r_ts, r.r_v)
            for r in asof_join_chunked(
                left, right, ["k"], chunk_us=chunk_us, **kw
            ).collect()
        }
        assert chunked == plain

    def test_tolerance_matches_unchunked(self, spark):
        rnd = random.Random(13)
        lrows = [(rnd.randrange(3), rnd.randrange(40) * US) for _ in range(40)]
        rrows = [
            (rnd.randrange(3), rnd.randrange(40) * US, rnd.randrange(10))
            for _ in range(40)
        ]
        left, right = _mk_left(spark, lrows), _mk_right(spark, rrows)
        kw = dict(right_cols=["v"], right_tiebreak="rid", tolerance_us=5 * US)
        plain = {
            r.lid: (r.r_ts, r.r_v)
            for r in asof_join(left, right, ["k"], **kw).collect()
        }
        chunked = {
            r.lid: (r.r_ts, r.r_v)
            for r in asof_join_chunked(
                left, right, ["k"], chunk_us=3 * US, **kw
            ).collect()
        }
        assert chunked == plain


class TestIntervalJoin:
    def _mk(self, spark, rnd, n_iv, n_pt):
        iv = spark.createDataFrame(
            [
                (rnd.randrange(4), i, _ts(a),
                 _ts(a + rnd.randrange(0, 20)))
                for i, a in enumerate(rnd.randrange(60) for _ in range(n_iv))
            ],
            "k long, iv_id long, start timestamp, end timestamp",
        )
        pt = spark.createDataFrame(
            [
                (rnd.randrange(4), i, _ts(rnd.randrange(70)))
                for i in range(n_pt)
            ],
            "k long, pt_id long, ts timestamp",
        )
        return iv, pt

    @pytest.mark.parametrize("bucket_us", [1, 5, 1000])
    def test_inner_vs_inequality_join(self, spark, bucket_us):
        rnd = random.Random(17)
        iv, pt = self._mk(spark, rnd, 25, 60)
        got = {
            (r.iv_id, r.pt_id)
            for r in interval_join(
                pt, iv, ["k"], bucket_us=bucket_us
            ).collect()
        }
        want = {
            (r.iv_id, r.pt_id)
            for r in iv.alias("i")
            .join(
                pt.alias("p"),
                (F.col("i.k") == F.col("p.k"))
                & (F.col("p.ts") >= F.col("i.start"))
                & (F.col("p.ts") <= F.col("i.end")),
            )
            .collect()
        }
        assert got == want

    def test_left_intervals_keeps_empties(self, spark):
        iv = spark.createDataFrame(
            [
                (1, 0, _ts(10), _ts(20)),
                (1, 1, _ts(100), _ts(110)),
            ],
            "k long, iv_id long, start timestamp, end timestamp",
        )
        pt = spark.createDataFrame(
            [(1, 0, _ts(15))],
            "k long, pt_id long, ts timestamp",
        )
        rows = interval_join(
            pt, iv, ["k"], how="left_intervals", bucket_us=5
        ).collect()
        by_iv = {}
        for r in rows:
            by_iv.setdefault(r.iv_id, []).append(r.pt_id)
        assert by_iv[0] == [0]
        assert by_iv[1] == [None]  # empty interval survives with null point

    def test_collision_raises(self, spark):
        iv = spark.createDataFrame(
            [(1, _ts(0), _ts(1))],
            "k long, start timestamp, end timestamp",
        )
        pt = spark.createDataFrame(
            [(1, _ts(0), _ts(0))],
            "k long, ts timestamp, start timestamp",
        )
        with pytest.raises(ValueError, match="collision"):
            interval_join(pt, iv, ["k"])


class TestResampleLocf:
    def test_hourly_grid(self, spark):
        h = 3_600 * US
        df = spark.createDataFrame(
            [
                (1, _ts(h + 600 * US), 10.0),
                (1, _ts(3 * h + 60 * US), 30.0),
            ],
            "k long, ts timestamp, v double",
        )
        rows = sorted(
            resample_locf(df, ["k"], value_cols=["v"], step_us=h).collect(),
            key=lambda r: r.grid_ts,
        )
        # grid: floor(1h10m)=1h .. 3h1m => 1h, 2h, 3h
        assert [_us(r.grid_ts) for r in rows] == [h, 2 * h, 3 * h]
        # 1h grid point precedes the first observation => null
        assert [r.locf_v for r in rows] == [None, 10.0, 10.0]


class TestIntervalOverlapJoin:
    @pytest.mark.parametrize("bucket_us", [1, 7, 1000])
    def test_vs_inequality_join(self, spark, bucket_us):
        from cassandra_diff_spark.operators.temporal import interval_overlap_join

        rnd = random.Random(37)

        def mk(prefix, n):
            rows = []
            for i in range(n):
                a = rnd.randrange(60)
                rows.append((rnd.randrange(4), i, _ts(a), _ts(a + rnd.randrange(0, 25))))
            return spark.createDataFrame(
                rows, f"k long, {prefix}_id long, {prefix}_s timestamp, {prefix}_e timestamp"
            )

        l, r = mk("l", 30), mk("r", 40)
        got = {
            (x.l_id, x.r_id)
            for x in interval_overlap_join(
                l, r, ["k"],
                left_start="l_s", left_end="l_e",
                right_start="r_s", right_end="r_e",
                bucket_us=bucket_us,
            ).collect()
        }
        want = {
            (x.l_id, x.r_id)
            for x in l.alias("a")
            .join(
                r.alias("b"),
                (F.col("a.k") == F.col("b.k"))
                & (F.col("a.l_s") <= F.col("b.r_e"))
                & (F.col("b.r_s") <= F.col("a.l_e")),
            )
            .collect()
        }
        assert got == want
        # exactly-once emission: no pair may appear twice
        rows = interval_overlap_join(
            l, r, ["k"],
            left_start="l_s", left_end="l_e",
            right_start="r_s", right_end="r_e",
            bucket_us=bucket_us,
        ).collect()
        assert len(rows) == len(got)

    def test_collision_raises(self, spark):
        from cassandra_diff_spark.operators.temporal import interval_overlap_join

        iv = spark.createDataFrame(
            [(1, _ts(0), _ts(1))], "k long, start timestamp, end timestamp"
        )
        with pytest.raises(ValueError, match="collision"):
            interval_overlap_join(iv, iv, ["k"])


class TestCollapseBursts:
    def test_burst_semantics(self, spark):
        from cassandra_diff_spark.operators.temporal import collapse_bursts

        # key 1: burst (0, 5, 9) then lone row at 100; key 2: one row
        df = spark.createDataFrame(
            [
                (1, _ts(0), 10),
                (1, _ts(5), 11),
                (1, _ts(9), 12),
                (1, _ts(100), 13),
                (2, _ts(50), 20),
            ],
            "k long, ts timestamp, eid long",
        )
        rows = sorted(
            collapse_bursts(df, ["k"], gap_us=6, tiebreak="eid").collect(),
            key=lambda r: (r.k, r.ts),
        )
        assert [(r.k, r.eid, r.burst_n, _us(r.burst_end)) for r in rows] == [
            (1, 10, 3, 9),     # burst of 3, extent through t=9
            (1, 13, 1, 100),
            (2, 20, 1, 50),
        ]

    def test_equal_ts_tiebreak(self, spark):
        from cassandra_diff_spark.operators.temporal import collapse_bursts

        df = spark.createDataFrame(
            [(1, _ts(0), 5), (1, _ts(0), 3)], "k long, ts timestamp, eid long"
        )
        rows = collapse_bursts(df, ["k"], gap_us=1, tiebreak="eid").collect()
        assert len(rows) == 1 and rows[0].eid == 3  # earliest tiebreak wins


class TestAsofRowAtomicity:
    """Regression suite for the round-5 ADVICE items: null values in
    matched right rows must come through as nulls (the match is ONE row,
    never a per-column mix), the side marker must not be inferred from
    tiebreak nullness, and non-numeric tiebreaks must keep their native
    ordering."""

    def _right_nullable(self, spark, rows):
        # (k, t_us, rid-or-None, v-or-None)
        return spark.createDataFrame(
            [(k, _ts(t), rid, v) for k, t, rid, v in rows],
            "k long, ts timestamp, rid long, v double",
        )

    def test_matched_null_col_stays_null(self, spark):
        left = _mk_left(spark, [(1, 25)])
        right = self._right_nullable(
            spark, [(1, 10, 1, 1.0), (1, 20, 2, None)]
        )
        r = asof_join(
            left, right, ["k"], right_cols=["v"], right_tiebreak="rid"
        ).collect()[0]
        assert _us(r.r_ts) == 20
        assert r.r_v is None  # NOT backfilled from the t=10 row

    def test_null_tiebreak_row_is_still_right(self, spark):
        left = _mk_left(spark, [(1, 15)])
        right = self._right_nullable(spark, [(1, 10, None, 5.0)])
        rows = asof_join(
            left, right, ["k"], right_cols=["v"], right_tiebreak="rid"
        ).collect()
        # exactly the left row — no phantom all-null-left output row —
        # and the null-tiebreak right row still matches
        assert len(rows) == 1
        assert rows[0].lid == 0 and rows[0].r_v == 5.0

    def test_null_tiebreak_loses_to_nonnull_peer(self, spark):
        left = _mk_left(spark, [(1, 10)])
        right = self._right_nullable(
            spark, [(1, 10, None, 1.0), (1, 10, 7, 2.0)]
        )
        r = asof_join(
            left, right, ["k"], right_cols=["v"], right_tiebreak="rid"
        ).collect()[0]
        assert r.r_v == 2.0

    def test_string_tiebreak_native_order(self, spark):
        left = _mk_left(spark, [(1, 10)])
        right = spark.createDataFrame(
            [(1, _ts(10), "a", 1.0), (1, _ts(10), "b", 2.0)],
            "k long, ts timestamp, sid string, v double",
        )
        r = asof_join(
            left, right, ["k"], right_cols=["v"], right_tiebreak="sid"
        ).collect()[0]
        assert r.r_v == 2.0  # greatest string wins, no long-cast nulling

    def test_chunked_carry_does_not_smear_null(self, spark):
        # in-chunk match at t=995 has v NULL; an earlier-chunk carry row
        # at t=5 has v=7.0. A per-column coalesce would emit 7.0 with
        # r_ts=995 — mixing two rows. Row-level stitch must emit NULL.
        left = _mk_left(spark, [(1, 1000)])
        right = self._right_nullable(
            spark, [(1, 5, 1, 7.0), (1, 995, 2, None)]
        )
        r = asof_join_chunked(
            left, right, ["k"], right_cols=["v"], right_tiebreak="rid",
            chunk_us=100,
        ).collect()[0]
        assert _us(r.r_ts) == 995
        assert r.r_v is None

    def test_chunked_carry_row_with_null_col(self, spark):
        # no in-chunk match; the carry row itself has a null column
        left = _mk_left(spark, [(1, 1000)])
        right = self._right_nullable(spark, [(1, 10, 1, None)])
        r = asof_join_chunked(
            left, right, ["k"], right_cols=["v"], right_tiebreak="rid",
            chunk_us=100,
        ).collect()[0]
        assert _us(r.r_ts) == 10
        assert r.r_v is None

    def test_chunked_null_tiebreak_row_is_still_right(self, spark):
        left = _mk_left(spark, [(1, 1000)])
        right = self._right_nullable(spark, [(1, 10, None, 5.0)])
        rows = asof_join_chunked(
            left, right, ["k"], right_cols=["v"], right_tiebreak="rid",
            chunk_us=100,
        ).collect()
        assert len(rows) == 1
        assert rows[0].lid == 0 and rows[0].r_v == 5.0

    def test_reserved_right_col_rejected(self, spark):
        left = _mk_left(spark, [(1, 10)])
        right = spark.createDataFrame(
            [(1, _ts(5), 1.0)], "k long, ts timestamp, __ts double"
        )
        with pytest.raises(ValueError, match="reserved"):
            asof_join(left, right, ["k"], right_cols=["__ts"])


class TestLeftIntervalsSinglePass:
    def test_duplicate_empty_intervals_keep_multiplicity(self, spark):
        iv = spark.createDataFrame(
            [(1, _ts(100), _ts(110)), (1, _ts(100), _ts(110))],
            "k long, start timestamp, end timestamp",
        )
        pt = spark.createDataFrame(
            [(1, 0, _ts(15))], "k long, pt_id long, ts timestamp"
        )
        rows = interval_join(
            pt, iv, ["k"], how="left_intervals", bucket_us=5
        ).collect()
        # both identical empty interval INSTANCES survive
        assert len(rows) == 2
        assert all(r.pt_id is None for r in rows)

    def test_single_join_subtree_plan(self, spark):
        iv = spark.createDataFrame(
            [(1, _ts(10), _ts(20))],
            "k long, start timestamp, end timestamp",
        )
        pt = spark.createDataFrame(
            [(1, 0, _ts(15))], "k long, pt_id long, ts timestamp"
        )
        df = interval_join(pt, iv, ["k"], how="left_intervals", bucket_us=5)
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        assert plan.count("Join") == 1  # join subtree executes ONCE

    def test_interval_matched_and_empty_mixed(self, spark):
        iv = spark.createDataFrame(
            [(1, 0, _ts(10), _ts(20)), (1, 1, _ts(100), _ts(110))],
            "k long, iv_id long, start timestamp, end timestamp",
        )
        pt = spark.createDataFrame(
            [(1, 0, _ts(12)), (1, 1, _ts(15)), (1, 2, _ts(50))],
            "k long, pt_id long, ts timestamp",
        )
        rows = interval_join(
            pt, iv, ["k"], how="left_intervals", bucket_us=3
        ).collect()
        by_iv = {}
        for r in rows:
            by_iv.setdefault(r.iv_id, []).append(r.pt_id)
        assert sorted(by_iv[0]) == [0, 1]
        assert by_iv[1] == [None]


class TestMergeIntervals:
    def test_overlap_touch_and_gap(self, spark):
        from cassandra_diff_spark.operators.temporal import merge_intervals

        iv = spark.createDataFrame(
            [
                (1, _ts(0), _ts(10)),
                (1, _ts(5), _ts(20)),    # overlaps -> merges
                (1, _ts(20), _ts(25)),   # touches (closed) -> merges
                (1, _ts(30), _ts(40)),   # gap -> new span
                (2, _ts(0), _ts(1)),
            ],
            "k long, start timestamp, end timestamp",
        )
        rows = sorted(
            merge_intervals(iv, ["k"]).collect(), key=lambda r: (r.k, r.start)
        )
        got = [(r.k, _us(r.start), _us(r.end), r.n_merged) for r in rows]
        assert got == [(1, 0, 25, 3), (1, 30, 40, 1), (2, 0, 1, 1)]

    def test_contained_interval_does_not_split_span(self, spark):
        """An interval fully inside an earlier long one must not break
        the running span (the running-MAX-end construction, not lag)."""
        from cassandra_diff_spark.operators.temporal import merge_intervals

        iv = spark.createDataFrame(
            [(1, _ts(0), _ts(100)), (1, _ts(10), _ts(20)), (1, _ts(50), _ts(120))],
            "k long, start timestamp, end timestamp",
        )
        rows = merge_intervals(iv, ["k"]).collect()
        assert len(rows) == 1
        assert (_us(rows[0].start), _us(rows[0].end), rows[0].n_merged) == (0, 120, 3)

    def test_min_gap_bridges(self, spark):
        from cassandra_diff_spark.operators.temporal import merge_intervals

        iv = spark.createDataFrame(
            [(1, _ts(0), _ts(10)), (1, _ts(14), _ts(20))],
            "k long, start timestamp, end timestamp",
        )
        assert merge_intervals(iv, ["k"], min_gap_us=5).count() == 1
        assert merge_intervals(iv, ["k"], min_gap_us=3).count() == 2


class TestTimeWeightedAvg:
    def test_step_signal(self, spark):
        from cassandra_diff_spark.operators.temporal import time_weighted_avg

        # key 1: v=10 on [0,40), v=20 on [40,100) within window [0,100)
        df = spark.createDataFrame(
            [(1, _ts(0), 1, 10.0), (1, _ts(40), 2, 20.0)],
            "k long, ts timestamp, oid long, v double",
        )
        r = time_weighted_avg(
            df, ["k"], value_col="v", t0=0, t1=100, tiebreak="oid"
        ).collect()[0]
        assert r.twa == (10.0 * 40 + 20.0 * 60) / 100
        assert r.covered_us == 100

    def test_pre_window_boundary_and_partial_coverage(self, spark):
        from cassandra_diff_spark.operators.temporal import time_weighted_avg

        df = spark.createDataFrame(
            [
                (1, _ts(0), 1, 5.0),     # pre-window obs holds into [10, 30)
                (1, _ts(30), 2, 15.0),   # then 15 on [30, 50)
                (2, _ts(25), 3, 8.0),    # first obs inside window: partial
            ],
            "k long, ts timestamp, oid long, v double",
        )
        rows = {
            r.k: r
            for r in time_weighted_avg(
                df, ["k"], value_col="v", t0=10, t1=50, tiebreak="oid"
            ).collect()
        }
        assert rows[1].twa == (5.0 * 20 + 15.0 * 20) / 40
        assert rows[1].covered_us == 40
        assert rows[2].twa == 8.0
        assert rows[2].covered_us == 25  # [25, 50) only

    def test_equal_ts_later_tiebreak_supersedes(self, spark):
        from cassandra_diff_spark.operators.temporal import time_weighted_avg

        df = spark.createDataFrame(
            [(1, _ts(0), 1, 100.0), (1, _ts(0), 2, 4.0)],
            "k long, ts timestamp, oid long, v double",
        )
        r = time_weighted_avg(
            df, ["k"], value_col="v", t0=0, t1=10, tiebreak="oid"
        ).collect()[0]
        assert r.twa == 4.0  # the oid=1 row held for zero time

    def test_null_value_breaks_coverage(self, spark):
        from cassandra_diff_spark.operators.temporal import time_weighted_avg

        df = spark.createDataFrame(
            [(1, _ts(0), 1, 10.0), (1, _ts(20), 2, None), (1, _ts(60), 3, 30.0)],
            "k long, ts timestamp, oid long, v double",
        )
        r = time_weighted_avg(
            df, ["k"], value_col="v", t0=0, t1=100, tiebreak="oid"
        ).collect()[0]
        # covered: [0,20) at 10 and [60,100) at 30 — the null gap excluded
        assert r.covered_us == 60
        assert r.twa == (10.0 * 20 + 30.0 * 40) / 60


def test_resample_locf_chunked_matches_plain(spark):
    rnd = random.Random(19)
    rows = [
        (rnd.randrange(3), rnd.randrange(100) * US, rnd.randrange(50))
        for _ in range(60)
    ]
    df = _mk_right(spark, rows)
    kw = dict(ts="ts", value_cols=["v"], step_us=7 * US, tiebreak="rid")
    key = lambda d: sorted(  # noqa: E731
        tuple(r) for r in resample_locf(d, ["k"], **kw).collect()
    )
    plain = sorted(
        tuple(r) for r in resample_locf(df, ["k"], **kw).collect()
    )
    chunked = sorted(
        tuple(r)
        for r in resample_locf(df, ["k"], chunk_us=13 * US, **kw).collect()
    )
    assert chunked == plain and len(plain) > 0


class TestFunnel:
    def test_chain_semantics(self, spark):
        from datetime import datetime, timedelta

        from cassandra_diff_spark.operators.temporal import (
            funnel_steps,
            funnel_summary,
        )

        t0 = datetime(2024, 1, 1)
        h = timedelta(hours=1)
        rows = [
            # user 1: full conversion
            (1, t0, "signup", 1),
            (1, t0 + 1 * h, "click", 2),
            (1, t0 + 2 * h, "buy", 3),
            # user 2: clicks BEFORE signup (not forward) -> stops at t1
            (2, t0 + 5 * h, "signup", 4),
            (2, t0 + 1 * h, "click", 5),
            # user 3: click too late (outside window)
            (3, t0, "signup", 6),
            (3, t0 + 50 * h, "click", 7),
            # user 4: same-ts click (strict -> not matched)
            (4, t0, "signup", 8),
            (4, t0, "click", 9),
            # user 5: never signed up -> absent
            (5, t0, "click", 10),
        ]
        ev = spark.createDataFrame(
            rows, "user_id long, ts timestamp, event_type string, event_id long"
        )
        f = funnel_steps(
            ev,
            ["user_id"],
            ts_col="ts",
            step_col="event_type",
            steps=["signup", "click", "buy"],
            within_us=24 * 3_600_000_000,
            tiebreak="event_id",
        )
        got = {r.user_id: (r.t1, r.t2, r.t3) for r in f.collect()}
        assert set(got) == {1, 2, 3, 4}
        assert got[1] == (t0, t0 + 1 * h, t0 + 2 * h)
        assert got[2] == (t0 + 5 * h, None, None)
        assert got[3] == (t0, None, None)
        assert got[4] == (t0, None, None)
        s = {r.step: r.n_keys for r in funnel_summary(f, 3).collect()}
        assert s == {1: 4, 2: 1, 3: 1}

    def test_first_step_instance_is_min_ts(self, spark):
        from datetime import datetime, timedelta

        from cassandra_diff_spark.operators.temporal import funnel_steps

        t0 = datetime(2024, 1, 1)
        h = timedelta(hours=1)
        ev = spark.createDataFrame(
            [
                (1, t0 + 10 * h, "a", 1),
                (1, t0, "a", 2),          # earliest signup wins
                (1, t0 + 1 * h, "b", 3),
            ],
            "user_id long, ts timestamp, event_type string, event_id long",
        )
        f = funnel_steps(
            ev, ["user_id"], ts_col="ts", step_col="event_type",
            steps=["a", "b"], within_us=24 * 3_600_000_000,
        ).collect()
        assert f[0].t1 == t0 and f[0].t2 == t0 + 1 * h


class TestCohortRetention:
    def test_matrix_semantics(self, spark):
        from datetime import datetime, timedelta

        from cassandra_diff_spark.operators.temporal import cohort_retention

        day = 86_400_000_000
        t0 = datetime(2024, 1, 1)
        D = timedelta(days=1)
        rows = [
            (1, t0), (1, t0 + 1 * D),          # u1: periods 0 (x2 -> once)
            (1, t0 + 3 * D),                   # u1: period 1
            (2, t0 + 1 * D),                   # u2: period 0 only
            (3, t0 + 4 * D), (3, t0 + 7 * D),  # u3: cohort 1, offsets 0,1
        ]
        ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
        got = {
            (r.cohort, r.offset): r.n_active
            for r in cohort_retention(
                ev, "user_id", "ts", period_us=3 * day
            ).collect()
        }
        base = int((t0 - datetime(1970, 1, 1)).total_seconds() * 1e6 // (3 * day))
        norm = {(c - base, o): n for (c, o), n in got.items()}
        assert norm == {(0, 0): 2, (0, 1): 1, (1, 0): 1, (1, 1): 1}

    def test_offset_zero_is_cohort_size(self, spark, sf_dir):
        from cassandra_diff_spark.gate import load_events
        from cassandra_diff_spark.operators.temporal import cohort_retention

        ev = load_events(spark, sf_dir)
        m = cohort_retention(ev, "user_id", "ts")
        sizes = m.filter(F.col("offset") == 0).agg(F.sum("n_active")).first()[0]
        users = ev.select("user_id").distinct().count()
        assert sizes == users  # every user appears in exactly one cohort


class TestIntervalCoverage:
    """temporal.interval_coverage — union duration, overlaps once."""

    def test_overlaps_counted_once(self, spark):
        import datetime as dt

        from cassandra_diff_spark.operators.temporal import interval_coverage

        t0 = dt.datetime(2026, 1, 1)
        mk = lambda m: t0 + dt.timedelta(minutes=m)  # noqa: E731
        rows = [
            # key a: [0,60] + [30,90] overlap -> union 90 min; [120,150] disjoint
            ("a", mk(0), mk(60)),
            ("a", mk(30), mk(90)),
            ("a", mk(120), mk(150)),
            # key b: identical duplicates -> counted once
            ("b", mk(0), mk(10)),
            ("b", mk(0), mk(10)),
        ]
        df = spark.createDataFrame(rows, "k string, start timestamp, end timestamp")
        out = {r.k: r for r in interval_coverage(df, ["k"]).collect()}
        assert out["a"].covered_us == (90 + 30) * 60 * 1_000_000
        assert out["a"].n_spans == 2 and out["a"].n_intervals == 3
        assert out["a"].first_start == mk(0) and out["a"].last_end == mk(150)
        assert out["b"].covered_us == 10 * 60 * 1_000_000
        assert out["b"].n_spans == 1 and out["b"].n_intervals == 2


class TestGapReport:
    """temporal.gap_report — the downtime dual."""

    def test_gaps_between_merged_spans(self, spark):
        import datetime as dt

        from cassandra_diff_spark.operators.temporal import gap_report

        t0 = dt.datetime(2026, 1, 1)
        mk = lambda m: t0 + dt.timedelta(minutes=m)  # noqa: E731
        rows = [
            ("a", mk(0), mk(60)), ("a", mk(30), mk(90)),   # one span [0,90]
            ("a", mk(120), mk(150)),                        # gap 90->120 (30m)
            ("a", mk(151), mk(160)),                        # gap 150->151 (1m)
            ("b", mk(0), mk(10)),                           # single span: no gap
        ]
        df = spark.createDataFrame(rows, "k string, start timestamp, end timestamp")
        out = [(r.k, r.gap_start, r.gap_end, r.gap_us)
               for r in gap_report(df, ["k"]).orderBy("k", "gap_start").collect()]
        assert out == [
            ("a", mk(90), mk(120), 30 * 60 * 1_000_000),
            ("a", mk(150), mk(151), 60 * 1_000_000),
        ]
        # threshold filters the 1-minute blip
        big = gap_report(df, ["k"], min_report_us=10 * 60 * 1_000_000).collect()
        assert len(big) == 1 and big[0].gap_us == 30 * 60 * 1_000_000


class TestTransitionMatrix:
    def test_counts_and_ppm(self, spark):
        import datetime as dt

        from cassandra_diff_spark.operators.temporal import transition_matrix

        t0 = dt.datetime(2026, 1, 1)
        mk = lambda s: t0 + dt.timedelta(seconds=s)  # noqa: E731
        # user 1: a->b->a ; user 2: a->b ; user 3: single event (no bigram)
        rows = [
            (1, mk(0), "a", 10), (1, mk(1), "b", 11), (1, mk(2), "a", 12),
            (2, mk(0), "a", 20), (2, mk(5), "b", 21),
            (3, mk(0), "c", 30),
        ]
        df = spark.createDataFrame(
            rows, "user long, ts timestamp, label string, eid long"
        )
        got = {
            (r.from_label, r.to_label): (r.n_trans, r.row_ppm)
            for r in transition_matrix(df, "user", "ts", "label", "eid").collect()
        }
        assert got == {
            ("a", "b"): (2, 1_000_000),
            ("b", "a"): (1, 1_000_000),
        }

    def test_equal_timestamps_break_on_tiebreak(self, spark):
        import datetime as dt

        from cassandra_diff_spark.operators.temporal import transition_matrix

        t = dt.datetime(2026, 1, 1)
        # same ts: order must follow eid, so x->y, never y->x
        rows = [(1, t, "x", 1), (1, t, "y", 2)]
        df = spark.createDataFrame(
            rows, "user long, ts timestamp, label string, eid long"
        )
        got = [
            (r.from_label, r.to_label)
            for r in transition_matrix(df, "user", "ts", "label", "eid").collect()
        ]
        assert got == [("x", "y")]


class TestDecayedCounts:
    def test_halving_buckets_exact(self, spark):
        import datetime as dt

        from cassandra_diff_spark.operators.temporal import decayed_counts

        t0 = dt.datetime(2026, 1, 1)
        hl = 3600
        rows = [
            ("a", t0),                                   # age 0      -> 1000000
            ("a", t0 - dt.timedelta(seconds=hl)),        # 1 half-life-> 500000
            ("a", t0 - dt.timedelta(seconds=2 * hl)),    # 2          -> 250000
            ("a", t0 - dt.timedelta(seconds=2 * hl - 1)),# just under -> 500000
            ("b", t0 - dt.timedelta(seconds=100 * hl)),  # clamped    -> 0
        ]
        df = spark.createDataFrame(rows, "g string, ts timestamp")
        got = {
            r.group: (r.n_events, r.decayed_score)
            for r in decayed_counts(df, "g", "ts", half_life_s=hl).collect()
        }
        assert got == {
            "a": (4, 1_000_000 + 500_000 + 250_000 + 500_000),
            "b": (1, 0),
        }


class TestTimeWeightedAvgExact:
    def test_value_scale_quantizes_and_matches_default_shape(self, spark):
        """value_scale mode: numerator is an exact decimal sum of
        round(v*scale)*held — same result as the default float path for
        values exactly representable at the scale, and quantized
        (round-half-up) otherwise."""
        from cassandra_diff_spark.operators.temporal import time_weighted_avg

        df = spark.createDataFrame(
            [
                (1, _ts(0), 1, 10.0),          # exact at milli
                (1, _ts(40), 2, 20.0005),      # rounds to 20.001 at milli
            ],
            "k long, ts timestamp, oid long, v double",
        )
        r = time_weighted_avg(
            df, ["k"], value_col="v", t0=0, t1=100,
            tiebreak="oid", value_scale=1000,
        ).collect()[0]
        assert r.twa == (10_000 * 40 + 20_001 * 60) / (100 * 1000)
        assert r.covered_us == 100
        # null values still hold "no signal" in exact mode
        df2 = spark.createDataFrame(
            [(1, _ts(0), 1, None), (1, _ts(50), 2, 4.0)],
            "k long, ts timestamp, oid long, v double",
        )
        r2 = time_weighted_avg(
            df2, ["k"], value_col="v", t0=0, t1=100,
            tiebreak="oid", value_scale=1000,
        ).collect()[0]
        assert r2.twa == 4.0 and r2.covered_us == 50


class TestDecayedIncremental:
    """fold(decayed_count_state slices) == decayed_counts_aligned
    rebuild, bit-exact, regardless of how the corpus is sliced or in
    what order the slices fold."""

    def _mk(self, spark, seed, n=400, days=120):
        import datetime as dt
        import random

        rnd = random.Random(seed)
        t0 = dt.datetime(2026, 1, 3, 7, 13, 29)  # off the bucket grid
        rows = [
            (
                rnd.choice(["a", "b", "c", "d"]),
                t0 + dt.timedelta(seconds=rnd.randint(0, 86_400 * days)),
            )
            for _ in range(n)
        ]
        return spark.createDataFrame(rows, "g string, ts timestamp")

    def _key(self, rows):
        return sorted((r.group, r.n_events, r.decayed_score) for r in rows)

    def test_fold_equals_rebuild_random_slicings(self, spark):
        from cassandra_diff_spark.operators.temporal import (
            decayed_count_state,
            decayed_counts_aligned,
            decayed_counts_from_state,
            fold_decayed_states,
        )

        hl = 86_400 * 2
        for seed in (1, 2, 3):
            df = self._mk(spark, seed).cache()
            want = self._key(
                decayed_counts_aligned(df, "g", "ts", half_life_s=hl).collect()
            )
            # random row->slice assignment (slices interleave in time:
            # harder than time-contiguous ingest), folded shuffled
            import random

            rnd = random.Random(100 + seed)
            n_slices = rnd.randint(2, 5)
            tagged = df.withColumn(
                "s", (F.abs(F.hash("g", "ts", F.lit(seed))) % n_slices)
            ).cache()
            states = [
                decayed_count_state(
                    tagged.filter(F.col("s") == i), "g", "ts", half_life_s=hl
                )
                for i in range(n_slices)
            ]
            rnd.shuffle(states)
            got = self._key(
                decayed_counts_from_state(
                    fold_decayed_states(states)
                ).collect()
            )
            assert got == want, f"seed {seed}"
            df.unpersist()
            tagged.unpersist()

    def test_fold_exercises_rebase_clamp_and_empty_slice(self, spark):
        import datetime as dt

        from cassandra_diff_spark.operators.temporal import (
            decayed_count_state,
            decayed_counts_aligned,
            decayed_counts_from_state,
            fold_decayed_states,
        )

        hl = 3_600  # 1h half-life so max_shift=8 clamps within the data
        t0 = dt.datetime(2026, 2, 1, 0, 30)
        old = [("g", t0 + dt.timedelta(minutes=m)) for m in (0, 10, 20)]
        new = [("g", t0 + dt.timedelta(hours=30, minutes=m)) for m in (0, 5)]
        df_old = spark.createDataFrame(old, "g string, ts timestamp")
        df_new = spark.createDataFrame(new, "g string, ts timestamp")
        df_all = df_old.unionByName(df_new)
        empty = spark.createDataFrame([], "g string, ts timestamp")

        s_old = decayed_count_state(df_old, "g", "ts", half_life_s=hl, max_shift=8)
        s_new = decayed_count_state(df_new, "g", "ts", half_life_s=hl, max_shift=8)
        s_empty = decayed_count_state(empty, "g", "ts", half_life_s=hl, max_shift=8)
        # history is 30 epoch buckets behind -> every old row rebases
        # past max_shift and clamps (weight = 1e6 >> 8 = 3906), exactly
        # like the one-shot rebuild's clamp
        folded = decayed_counts_from_state(
            fold_decayed_states([s_empty, s_new, s_old], max_shift=8),
            max_shift=8,
        ).collect()
        want = decayed_counts_aligned(
            df_all, "g", "ts", half_life_s=hl, max_shift=8
        ).collect()
        assert self._key(folded) == self._key(want)
        (r,) = folded
        assert r.n_events == 5
        # 2 fresh events at shift 0 or 1 dominate; 3 clamped at 3906
        assert r.decayed_score == want[0].decayed_score
