"""Histogram-binned quantiles vs an exact sort-based reference."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from cassandra_diff_spark.operators.stats import quantiles_histogram


class TestQuantilesHistogram:
    def test_matches_exact_within_bin_width(self, spark):
        rnd = random.Random(31)
        vals = [rnd.uniform(0, 100) for _ in range(5000)]
        df = spark.createDataFrame([(v,) for v in vals], "x double")
        probs = [0.25, 0.5, 0.9, 0.99]
        n_bins = 1000
        width = 100.0 / n_bins
        got = {
            r.p: r.q
            for r in quantiles_histogram(
                df, "x", probs, lo=0.0, hi=100.0, n_bins=n_bins
            ).collect()
        }
        s = sorted(vals)
        for p in probs:
            exact = s[math.ceil(p * len(s)) - 1]  # nearest-rank
            assert abs(got[p] - exact) <= width, (p, got[p], exact)

    def test_grouped_and_n(self, spark):
        df = spark.createDataFrame(
            [("a", float(i)) for i in range(1, 101)]
            + [("b", float(i)) for i in range(1, 11)],
            "g string, x double",
        )
        rows = quantiles_histogram(
            df, "x", [0.5], lo=0.0, hi=200.0, n_bins=200, by=["g"]
        ).collect()
        by = {r.g: (r.q, r.n) for r in rows}
        # width=1.0; median of 1..100 at rank 50 -> bin edge 50.0
        assert by["a"] == (50.0, 100)
        assert by["b"] == (5.0, 10)

    def test_nulls_and_clamping(self, spark):
        df = spark.createDataFrame(
            [(None,), (-50.0,), (500.0,), (5.0,)], "x double"
        )
        rows = quantiles_histogram(
            df, "x", [1.0], lo=0.0, hi=10.0, n_bins=10
        ).collect()
        assert rows[0].n == 3  # null excluded
        assert rows[0].q == 9.0  # 500 clamps into the last bin

    def test_bad_args(self, spark):
        df = spark.createDataFrame([(1.0,)], "x double")
        with pytest.raises(ValueError, match="probs"):
            quantiles_histogram(df, "x", [], lo=0, hi=1)
        with pytest.raises(ValueError, match="lo < hi"):
            quantiles_histogram(df, "x", [0.5], lo=1, hi=1)

    def test_single_data_shuffle(self, spark):
        """Everything after the histogram groupBy operates on n_bins
        rows: exactly one Exchange carries data-derived rows before the
        windows (whose exchange moves the tiny histogram)."""
        df = spark.range(10000).select(F.col("id").cast("double").alias("x"))
        plan = (
            quantiles_histogram(df, "x", [0.5], lo=0.0, hi=10000.0)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # histogram agg exchange + tiny window/group exchanges; the raw
        # scan feeds exactly one partial_count aggregate
        assert plan.count("partial_count") >= 1


class TestQuantilesRefined:
    def test_exact_vs_sorted_reference(self, spark):
        from cassandra_diff_spark.operators.stats import quantiles_refined

        rnd = random.Random(17)
        vals = [rnd.uniform(0, 100) for _ in range(5000)]
        df = spark.createDataFrame([(v,) for v in vals], "x double")
        probs = [0.25, 0.5, 0.9, 0.99, 1.0]
        got = {
            r.p: (r.q, r.n)
            for r in quantiles_refined(
                df, "x", probs, lo=0.0, hi=100.0, n_bins=64
            ).collect()
        }
        s = sorted(vals)
        for p in probs:
            exact = s[math.ceil(p * len(s)) - 1]
            assert got[p] == (exact, len(s)), p  # EXACT, not within-bin

    def test_grouped_with_duplicates_and_clamping(self, spark):
        from cassandra_diff_spark.operators.stats import quantiles_refined

        # duplicates at the rank boundary + values outside [lo, hi)
        a = [1.0, 2.0, 2.0, 2.0, 3.0, 250.0, -7.0]
        b = [5.0] * 4
        df = spark.createDataFrame(
            [("a", v) for v in a] + [("b", v) for v in b], "g string, x double"
        )
        got = {
            (r.g, r.p): r.q
            for r in quantiles_refined(
                df, "x", [0.5, 1.0], lo=0.0, hi=10.0, n_bins=10, by=["g"]
            ).collect()
        }
        sa, sb = sorted(a), sorted(b)
        assert got[("a", 0.5)] == sa[math.ceil(0.5 * len(sa)) - 1]  # 2.0
        assert got[("a", 1.0)] == 250.0  # clamped bin still yields true max
        assert got[("b", 0.5)] == 5.0 and got[("b", 1.0)] == 5.0

    def test_second_pass_scans_only_target_bins(self, spark):
        """The refine scan is gated by a broadcast semi-join on the
        kilobyte target-bin set (plan-asserted), so its cost is
        ~n/n_bins rows per quantile, not a second full sort."""
        from cassandra_diff_spark.operators.stats import quantiles_refined

        df = spark.range(0, 10_000).select((F.col("id") % 100).cast("double").alias("x"))
        out = quantiles_refined(df, "x", [0.5], lo=0.0, hi=100.0, n_bins=100)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
        r = out.collect()[0]
        assert (r.q, r.n) == (49.0, 10_000)


class TestRollingAnomaly:
    def _ev(self, spark, rows):
        return spark.createDataFrame(
            rows, "user_id long, ts long, event_id long, value double"
        )

    def test_spike_flagged(self, spark):
        from cassandra_diff_spark.operators.stats import rolling_anomaly

        rows = [(1, t, t, 10.0 + (t % 3)) for t in range(10)]
        rows.append((1, 100, 100, 500.0))  # wild spike
        out = rolling_anomaly(
            self._ev(spark, rows), "user_id", "ts", "value",
            order_cols=("event_id",),
        ).collect()
        assert [(r.event_id, r.value_c) for r in out] == [(100, 50000)]
        assert out[0].n_prev == 10

    def test_zero_variance_window_flags_any_deviation(self, spark):
        from cassandra_diff_spark.operators.stats import rolling_anomaly

        rows = [(1, t, t, 7.0) for t in range(6)] + [(1, 10, 10, 7.01)]
        out = rolling_anomaly(
            self._ev(spark, rows), "user_id", "ts", "value",
            order_cols=("event_id",),
        ).collect()
        assert [r.event_id for r in out] == [10]

    def test_min_periods_suppresses_early_rows(self, spark):
        from cassandra_diff_spark.operators.stats import rolling_anomaly

        rows = [(1, 0, 0, 1.0), (1, 1, 1, 1.0), (1, 2, 2, 999.0)]
        assert (
            rolling_anomaly(
                self._ev(spark, rows), "user_id", "ts", "value",
                order_cols=("event_id",),
            ).count()
            == 0
        )

    def test_keys_independent(self, spark):
        from cassandra_diff_spark.operators.stats import rolling_anomaly

        rows = [(1, t, t, 5.0 + (t % 2)) for t in range(8)]
        rows += [(2, t, 100 + t, 400.0 + (t % 2)) for t in range(8)]
        # user 2's values would be wild for user 1's window but are
        # ordinary within its own key
        assert (
            rolling_anomaly(
                self._ev(spark, rows), "user_id", "ts", "value",
                order_cols=("event_id",),
            ).count()
            == 0
        )


class TestFoldHistograms:
    """stats.fold_histograms — incremental quantiles via additive folds."""

    def test_fold_equals_one_shot(self, spark):
        from cassandra_diff_spark.operators.stats import (
            fold_histograms,
            histogram_counts,
            quantiles_from_histogram,
        )

        rows = [(i, "a" if i % 3 else "b", float(i % 97)) for i in range(600)]
        df = spark.createDataFrame(rows, "id long, g string, v double")
        lo, width, n_bins = 0.0, 1.0, 100
        parts = [
            histogram_counts(df.filter(f"id % 3 = {m}"), "v", ["g"], lo, width, n_bins)
            for m in range(3)
        ]
        folded = fold_histograms(parts, by=["g"])
        one_shot = histogram_counts(df, "v", ["g"], lo, width, n_bins)
        key = lambda d: sorted(tuple(r) for r in d.collect())  # noqa: E731
        assert key(folded) == key(one_shot)

        probs = [0.25, 0.5, 0.9]
        qa = quantiles_from_histogram(folded, probs, by=["g"], lo=lo, width=width)
        qb = quantiles_from_histogram(one_shot, probs, by=["g"], lo=lo, width=width)
        assert key(qa) == key(qb)

    def test_validates_inputs(self, spark):
        from cassandra_diff_spark.operators.stats import fold_histograms

        with pytest.raises(ValueError, match="at least one"):
            fold_histograms([], by=["g"])
        bad = spark.createDataFrame([("a", 1)], "g string, __bin long")
        with pytest.raises(ValueError, match="missing columns"):
            fold_histograms([bad], by=["g"])


class TestTopKByGroup:
    """stats.top_k_by_group — exact per-group top-k, no per-group sort."""

    @pytest.fixture(scope="class")
    def vals(self, spark):
        rows = [(i, ["a", "b"][i % 2], float((i * 37) % 100)) for i in range(400)]
        rows += [(1000, "a", None)]  # null value excluded
        return spark.createDataFrame(rows, "id long, g string, v double")

    def _naive(self, df, k):
        from pyspark.sql import Window

        w = Window.partitionBy("g").orderBy(F.col("v").desc(), F.col("id").asc())
        return (
            df.filter(F.col("v").isNotNull())
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= k)
            .drop("__rn")
        )

    @staticmethod
    def _key(df):
        return sorted((r.id, r.g, r.v) for r in df.collect())

    def test_equals_naive(self, spark, vals):
        from cassandra_diff_spark.operators.stats import top_k_by_group

        got = top_k_by_group(
            vals, ["g"], "v", 25, id_col="id", lo=0.0, hi=100.0, n_bins=64
        )
        assert self._key(got) == self._key(self._naive(vals, 25))

    def test_duplicate_values_tiebreak(self, spark):
        """All values equal: the candidate set degrades to the full
        group (one bin holds everything) but the result stays exact —
        k smallest ids win the tiebreak."""
        from cassandra_diff_spark.operators.stats import top_k_by_group

        df = spark.createDataFrame(
            [(i, "x", 5.0) for i in range(30)], "id long, g string, v double"
        )
        got = top_k_by_group(
            df, ["g"], "v", 7, id_col="id", lo=0.0, hi=10.0, n_bins=16
        )
        assert sorted(r.id for r in got.collect()) == list(range(7))

    def test_out_of_range_values_still_exact(self, spark):
        """Values beyond [lo, hi) clamp into the edge bins and must stay
        candidates — the superset property holds for ANY bounds."""
        from cassandra_diff_spark.operators.stats import top_k_by_group

        rows = [(i, "x", float(i)) for i in range(50)]  # 0..49, hi=10 clamps 10..49
        df = spark.createDataFrame(rows, "id long, g string, v double")
        got = top_k_by_group(
            df, ["g"], "v", 5, id_col="id", lo=0.0, hi=10.0, n_bins=8
        )
        assert sorted(r.v for r in got.collect()) == [45.0, 46.0, 47.0, 48.0, 49.0]

    def test_k_exceeds_group(self, spark, vals):
        from cassandra_diff_spark.operators.stats import top_k_by_group

        got = top_k_by_group(
            vals, ["g"], "v", 10_000, id_col="id", lo=0.0, hi=100.0, n_bins=64
        )
        assert got.count() == 400  # every non-null row survives

    def test_window_sees_only_candidates(self, spark):
        """With discriminative bins, the windowed row count per group is
        ~k + one bin, not the group size."""
        from cassandra_diff_spark.operators.stats import top_k_by_group

        n = 5000
        df = spark.createDataFrame(
            [(i, "x", float(i % 1000)) for i in range(n)], "id long, g string, v double"
        )
        cut_bin = 1000  # n_bins such that bins are 1-wide
        got = top_k_by_group(
            df, ["g"], "v", 10, id_col="id", lo=0.0, hi=1000.0, n_bins=1000
        )
        # candidate frame = rows with bin >= bstar; reconstruct its size
        # via the operator's own intermediate: values >= 998 (k=10 ->
        # two top values of 5 copies each) -> 10 candidates exactly
        assert got.count() == 10
        assert sorted(r.v for r in got.collect()) == [998.0] * 5 + [999.0] * 5

    def test_validates_k(self, spark, vals):
        from cassandra_diff_spark.operators.stats import top_k_by_group

        with pytest.raises(ValueError):
            top_k_by_group(vals, ["g"], "v", 0, id_col="id", lo=0.0, hi=1.0)


class TestWinsorize:
    """stats.winsorize — exact-quantile clamping."""

    def test_clamps_to_exact_envelope(self, spark):
        from cassandra_diff_spark.operators.stats import winsorize

        rows = [(i, "a", float(i)) for i in range(1, 101)]  # 1..100
        rows += [(200, "a", None)]
        df = spark.createDataFrame(rows, "id long, g string, v double")
        out = {r.id: r.v_w for r in winsorize(
            df, "v", 0.10, 0.90, lo=0.0, hi=101.0, n_bins=101, by=["g"]
        ).collect()}
        # nearest-rank: q10 = 10th smallest = 10.0, q90 = 90th = 90.0
        assert out[1] == 10.0 and out[5] == 10.0 and out[10] == 10.0
        assert out[50] == 50.0
        assert out[90] == 90.0 and out[95] == 90.0 and out[100] == 90.0
        assert out[200] is None

    def test_groups_independent(self, spark):
        from cassandra_diff_spark.operators.stats import winsorize

        rows = [(i, "low", float(i % 10)) for i in range(100)]
        rows += [(1000 + i, "high", float(50 + i % 10)) for i in range(100)]
        df = spark.createDataFrame(rows, "id long, g string, v double")
        out = winsorize(df, "v", 0.05, 0.95, lo=0.0, hi=100.0, by=["g"])
        mx = {r.g: r.m for r in out.groupBy("g").agg(F.max("v_w").alias("m")).collect()}
        assert mx["low"] <= 9.0 and mx["high"] >= 58.0

    def test_validates_probs(self, spark):
        from cassandra_diff_spark.operators.stats import winsorize

        df = spark.createDataFrame([(1, 1.0)], "id long, v double")
        with pytest.raises(ValueError):
            winsorize(df, "v", 0.9, 0.1, lo=0.0, hi=1.0)


class TestFeatureScaling:
    """stats.cdf_transform / robust_scale."""

    @pytest.fixture(scope="class")
    def fdf(self, spark):
        rows = [(i, "a", float(i)) for i in range(1, 101)]
        rows += [(500, "a", None), (600, "const", 5.0), (601, "const", 5.0), (602, "const", 5.0)]
        return spark.createDataFrame(rows, "id long, g string, v double")

    def test_cdf_monotone_and_exact_ratio(self, spark, fdf):
        from cassandra_diff_spark.operators.stats import cdf_transform

        out = {r.id: r.v_cdf for r in cdf_transform(
            fdf.filter("g = 'a'"), "v", lo=0.0, hi=101.0, n_bins=101, by=["g"],
            out_col="v_cdf",
        ).collect()}
        # one-wide bins: value i sits in bin i with cum = i -> cdf = i/100
        assert out[1] == 1 / 100 and out[50] == 50 / 100 and out[100] == 1.0
        assert out[500] is None
        vals = [out[i] for i in range(1, 101)]
        assert vals == sorted(vals)

    def test_robust_scale_reference_values(self, spark, fdf):
        from cassandra_diff_spark.operators.stats import robust_scale

        out = {r.id: r.v_rs for r in robust_scale(
            fdf, "v", lo=0.0, hi=101.0, n_bins=101, by=["g"], out_col="v_rs"
        ).collect()}
        # 1..100: p25=25, p50=50, p75=75 (nearest rank) -> (x-50)/50
        assert out[50] == 0.0 and out[100] == 1.0 and out[1] == (1 - 50) / 50
        # constant group: IQR 0 -> NULL, not a divide-by-zero
        assert out[600] is None and out[500] is None


class TestWeightedQuantiles:
    """stats.weighted_quantiles_histogram — weighted median family."""

    def test_weighted_median_vs_reference(self, spark):
        from cassandra_diff_spark.operators.stats import (
            weighted_quantiles_histogram,
        )

        # values 1..10; value 9 carries half the total weight
        rows = [(float(i), 1.0) for i in range(1, 9)] + [(9.0, 8.0), (10.0, 0.0)]
        rows += [(None, 5.0), (3.0, None)]
        df = spark.createDataFrame(rows, "v double, w double")
        out = {r.p: r for r in weighted_quantiles_histogram(
            df, "v", "w", [0.5, 0.9], lo=0.0, hi=10.5, n_bins=21
        ).collect()}
        # total integer weight: (8*1 + 8) * 1000 = 16000 (zero-weight and
        # null rows excluded); rank(0.5) = 8000 -> cumulative reaches it
        # inside value 9's bin (cum through 8 is 8000... exactly 8000 at
        # value 8) -> q(0.5) = 8.0 by nearest-rank; q(0.9) -> 9.0
        assert out[0.5].n == 16000 and out[0.5].q == 8.0
        assert out[0.9].q == 9.0

    def test_unit_weights_equal_count_path(self, spark):
        from cassandra_diff_spark.operators.stats import (
            quantiles_histogram,
            weighted_quantiles_histogram,
        )

        rows = [(i % 5 and "a" or "b", float(i % 83)) for i in range(400)]
        df = spark.createDataFrame(rows, "g string, v double").withColumn(
            "one", F.lit(1.0)
        )
        probs = [0.25, 0.5, 0.75]
        a = {(r.g, r.p): r.q for r in weighted_quantiles_histogram(
            df, "v", "one", probs, lo=0.0, hi=100.0, n_bins=100,
            by=["g"], weight_scale=1,
        ).collect()}
        b = {(r.g, r.p): r.q for r in quantiles_histogram(
            df, "v", probs, lo=0.0, hi=100.0, n_bins=100, by=["g"]
        ).collect()}
        assert a == b


class TestWeightedQuantilesRefined:
    """stats.weighted_quantiles_refined — exact weighted nearest rank."""

    def _naive(self, rows, p):
        """Full weight-ordered-sort reference."""
        import math

        pos = sorted((v, w) for v, w in rows if v is not None and w and w > 0)
        total = sum(int(round(w * 1000)) for _, w in pos)
        rank = math.ceil(p * total)
        cum = 0
        for v, w in pos:
            cum += int(round(w * 1000))
            if cum >= rank:
                return v, total
        raise AssertionError

    def test_matches_full_sort_reference(self, spark):
        from cassandra_diff_spark.operators.stats import (
            weighted_quantiles_refined,
        )

        rows = [(float(i % 37) + 0.25, float(1 + (i * 13) % 9)) for i in range(300)]
        rows += [(None, 5.0), (3.0, None), (7.0, 0.0)]
        df = spark.createDataFrame(rows, "v double, w double")
        probs = [0.1, 0.5, 0.9]
        got = {r.p: (r.q, r.n) for r in weighted_quantiles_refined(
            df, "v", "w", probs, lo=0.0, hi=40.0, n_bins=16
        ).collect()}
        for p in probs:
            assert got[p] == self._naive(rows, p), p

    def test_heavy_row_pulls_the_median(self, spark):
        from cassandra_diff_spark.operators.stats import (
            weighted_quantiles_refined,
        )

        rows = [(float(i), 1.0) for i in range(1, 10)] + [(9.5, 100.0)]
        df = spark.createDataFrame(rows, "v double, w double")
        out = {r.p: r.q for r in weighted_quantiles_refined(
            df, "v", "w", [0.5], lo=0.0, hi=10.0, n_bins=10
        ).collect()}
        assert out[0.5] == 9.5  # half the mass sits on the heavy row


class TestEntropyMI:
    def test_entropy_hand_computed(self, spark):
        import math

        from cassandra_diff_spark.operators.stats import column_entropy

        df = spark.createDataFrame(
            [("x", 1), ("x", 1), ("y", 2), ("z", None)],
            "c string, d int",
        )
        out = {r["column"]: r for r in column_entropy(df, ["c", "d"]).collect()}
        # c: counts 2,1,1 over N=4
        expect_c = sum(
            round(cnt / 4 * math.log(4 / cnt) * 1e6) for cnt in (2, 1, 1)
        )
        assert out["c"].entropy_micronat == expect_c
        assert out["c"].n_values == 3 and out["c"].n_rows == 4
        # d: NULL is a category -> counts 2,1,1 as well
        assert out["d"].entropy_micronat == expect_c
        assert out["d"].n_values == 3

    def test_constant_column_zero_entropy(self, spark):
        from cassandra_diff_spark.operators.stats import column_entropy

        df = spark.createDataFrame([("k",)] * 5, "c string")
        row = column_entropy(df, ["c"]).collect()[0]
        assert row.entropy_micronat == 0 and row.n_values == 1

    def test_mi_independent_vs_dependent(self, spark):
        import math

        from cassandra_diff_spark.operators.stats import mutual_info

        # perfectly dependent: b == a -> MI == H(a) = ln 2
        dep = spark.createDataFrame(
            [("x", "x"), ("x", "x"), ("y", "y"), ("y", "y")], "a string, b string"
        )
        row = mutual_info(dep, "a", "b").collect()[0]
        assert row.mi_micronat == 2 * round(0.5 * math.log(2) * 1e6)
        assert row.n_cells == 2 and row.n_rows == 4
        # independent uniform 2x2 -> every cell term is ln(1) = 0
        ind = spark.createDataFrame(
            [("x", "p"), ("x", "q"), ("y", "p"), ("y", "q")], "a string, b string"
        )
        row = mutual_info(ind, "a", "b").collect()[0]
        assert row.mi_micronat == 0 and row.n_cells == 4
        assert row.col_a == "a" and row.col_b == "b"


class TestKSDistance:
    def _df(self, spark, vals):
        return spark.createDataFrame([(float(v),) for v in vals], "v double")

    def test_hand_computed(self, spark):
        from cassandra_diff_spark.operators.stats import ks_distance

        a = self._df(spark, [1, 1, 2, 3])
        b = self._df(spark, [3, 3, 4])
        r = ks_distance(a, b, "v", lo=0.0, hi=5.0, n_bins=5).collect()[0]
        # edges: bin1 |2*3-0|=6, bin2 |3*3-0|=9, bin3 |4*3-2*4|=4, bin4 0
        assert (r.n_a, r.n_b) == (4, 3)
        assert r.ks_micro == (1000000 * 9) // 12  # 0.75
        assert r.ks_bin == 2

    def test_identical_samples_zero(self, spark):
        from cassandra_diff_spark.operators.stats import ks_distance

        a = self._df(spark, [1, 5, 9, 3])
        b = self._df(spark, [1, 5, 9, 3, 1, 5, 9, 3])  # same shape, 2x mass
        r = ks_distance(a, b, "v", lo=0.0, hi=10.0, n_bins=10).collect()[0]
        assert r.ks_micro == 0

    def test_disjoint_samples_full_distance(self, spark):
        from cassandra_diff_spark.operators.stats import ks_distance

        a = self._df(spark, [1, 2, 3])
        b = self._df(spark, [7, 8, 9])
        r = ks_distance(a, b, "v", lo=0.0, hi=10.0, n_bins=10).collect()[0]
        assert r.ks_micro == 1000000

    def test_nulls_excluded(self, spark):
        from cassandra_diff_spark.operators.stats import ks_distance

        a = spark.createDataFrame([(1.0,), (None,)], "v double")
        b = spark.createDataFrame([(1.0,)], "v double")
        r = ks_distance(a, b, "v", lo=0.0, hi=2.0, n_bins=4).collect()[0]
        assert r.n_a == 1 and r.ks_micro == 0


class TestChi2Independence:
    def test_python_reference(self, spark):
        from cassandra_diff_spark.operators.stats import chi2_independence

        rows = (
            [("x", "u")] * 10 + [("x", "v")] * 2
            + [("y", "u")] * 3 + [("y", "v")] * 9
        )
        df = spark.createDataFrame(rows, "a string, b string")
        r = chi2_independence(df, "a", "b").collect()[0]
        # python reference, same per-cell rounding
        from collections import Counter

        c = Counter(rows)
        ca = Counter(a for a, _ in rows)
        cb = Counter(b for _, b in rows)
        n = len(rows)
        want = 0
        for (a, b), o in c.items():
            num = o * n - ca[a] * cb[b]
            want += round(num * num / (ca[a] * cb[b] * n) * 1e6)
        want += round((n - sum(ca[a] * cb[b] for (a, b) in c) / n) * 1e6)
        assert r.chi2_micro == want
        assert r.dof == 1 and r.n_rows == 24
        assert r.chi2_micro > 3_841_000  # significant at 0.05 for dof 1

    def test_independent_columns_near_zero(self, spark):
        from cassandra_diff_spark.operators.stats import chi2_independence

        # perfectly balanced 2x2 -> chi2 exactly 0
        rows = [("x", "u"), ("x", "v"), ("y", "u"), ("y", "v")] * 5
        df = spark.createDataFrame(rows, "a string, b string")
        r = chi2_independence(df, "a", "b").collect()[0]
        assert r.chi2_micro == 0 and r.dof == 1

    def test_zero_cells_counted_in_expected_mass(self, spark):
        from cassandra_diff_spark.operators.stats import chi2_independence

        # (y, u) never observed: its expected mass must still enter
        rows = [("x", "u")] * 4 + [("y", "v")] * 4 + [("x", "v")] * 2
        df = spark.createDataFrame(rows, "a string, b string")
        r = chi2_independence(df, "a", "b").collect()[0]
        from collections import Counter

        c = Counter(rows)
        ca, cb, n = Counter(a for a, _ in rows), Counter(b for _, b in rows), 10
        full = 0
        for a in ca:
            for b in cb:
                o = c.get((a, b), 0)
                e = ca[a] * cb[b] / n
                full += (o - e) ** 2 / e
        # micro value within per-cell rounding of the full-grid formula
        assert abs(r.chi2_micro - full * 1e6) <= (len(c) + 1)
        assert r.n_cells_observed == 3


class TestCramersV:
    def test_reference_value(self, spark):
        import math

        from cassandra_diff_spark.operators.stats import (
            chi2_independence,
            cramers_v,
        )

        rows = (
            [("x", "u")] * 10 + [("x", "v")] * 2
            + [("y", "u")] * 3 + [("y", "v")] * 9
        )
        df = spark.createDataFrame(rows, "a string, b string")
        chi2 = chi2_independence(df, "a", "b").collect()[0].chi2_micro
        r = cramers_v(df, "a", "b").collect()[0]
        want = round(math.sqrt(chi2 / 1e6 / (24 * 1)) * 1e3)
        assert r.v_milli == want and 0 < r.v_milli <= 1000

    def test_perfect_association_is_1000(self, spark):
        from cassandra_diff_spark.operators.stats import cramers_v

        rows = [("x", "u")] * 5 + [("y", "v")] * 5
        df = spark.createDataFrame(rows, "a string, b string")
        assert cramers_v(df, "a", "b").collect()[0].v_milli == 1000

    def test_constant_side_yields_null(self, spark):
        from cassandra_diff_spark.operators.stats import cramers_v

        df = spark.createDataFrame(
            [("x", "u"), ("x", "v")], "a string, b string"
        )
        assert cramers_v(df, "a", "b").collect()[0].v_milli is None


class TestJSNumeric:
    def test_drift_ordering_and_bounds(self, spark):
        from cassandra_diff_spark.operators.stats import js_distance_numeric

        a = spark.createDataFrame([(float(v),) for v in [1, 2, 3, 4] * 5], "v double")
        same = spark.createDataFrame([(float(v),) for v in [1, 2, 3, 4] * 3], "v double")
        shifted = spark.createDataFrame([(float(v),) for v in [2, 3, 4, 5] * 5], "v double")
        disjoint = spark.createDataFrame([(float(v),) for v in [7, 8, 9] * 5], "v double")
        kw = dict(lo=0.0, hi=10.0, n_bins=10)
        z = js_distance_numeric(a, same, "v", **kw).collect()[0].js_micronat
        s = js_distance_numeric(a, shifted, "v", **kw).collect()[0].js_micronat
        d = js_distance_numeric(a, disjoint, "v", **kw).collect()[0].js_micronat
        assert z == 0
        assert 0 < s < d
        assert abs(d - 693147) <= 7  # ln 2 up to per-bin rounding

    def test_one_sided_empty_bins_need_no_epsilon(self, spark):
        from cassandra_diff_spark.operators.stats import js_distance_numeric

        a = spark.createDataFrame([(1.0,), (1.0,), (5.0,)], "v double")
        b = spark.createDataFrame([(1.0,), (9.0,)], "v double")  # 9 only in b
        r = js_distance_numeric(a, b, "v", lo=0.0, hi=10.0, n_bins=10).collect()[0]
        assert 0 < r.js_micronat < 693150  # finite, no epsilon needed
