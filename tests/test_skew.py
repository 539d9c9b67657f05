"""Skew-safe salted join: result parity with the plain join, salt-spread
physical distribution."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cassandra_diff_spark.operators.skew import SALT_COL, salted_join


@pytest.fixture()
def skewed(spark):
    # one pathologically hot key (0) + a long tail, plus a key with no
    # match on the other side
    rows = [(0, i) for i in range(500)] + [(k, k) for k in range(1, 50)] + [(999, -1)]
    return spark.createDataFrame(rows, "k long, payload long")


@pytest.fixture()
def dim(spark):
    return spark.createDataFrame(
        [(k, f"d{k}") for k in range(50)], "k long, label string"
    )


class TestSaltedJoin:
    @pytest.mark.parametrize("salt", [1, 4, 16])
    def test_inner_equals_plain_join(self, spark, skewed, dim, salt):
        got = sorted(
            tuple(r)
            for r in salted_join(skewed, dim, ["k"], salt=salt).collect()
        )
        want = sorted(tuple(r) for r in skewed.join(dim, "k").collect())
        assert got == want and len(got) == 500 + 49

    def test_left_keeps_unmatched(self, spark, skewed, dim):
        got = salted_join(skewed, dim, ["k"], how="left", salt=8)
        assert got.filter(F.col("k") == 999).collect()[0].label is None
        assert got.count() == skewed.count()

    def test_salt_reaches_the_exchange(self, spark, skewed, dim):
        plan = (
            salted_join(skewed, dim, ["k"], salt=8)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert SALT_COL in plan  # the join distribution includes the salt

    def test_hot_key_spreads_over_salt_buckets(self, spark, skewed):
        s = skewed.withColumn(
            SALT_COL,
            F.pmod(
                F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(16)
            ),
        )
        n_buckets = (
            s.filter(F.col("k") == 0).select(SALT_COL).distinct().count()
        )
        assert n_buckets >= 12  # 500 rows of one key land in most buckets

    def test_bad_args(self, spark, skewed, dim):
        with pytest.raises(ValueError, match="how"):
            salted_join(skewed, dim, ["k"], how="full")
        with pytest.raises(ValueError, match="salt"):
            salted_join(skewed, dim, ["k"], salt=0)

    def test_map_columns_tolerated(self, spark, dim):
        df = spark.createDataFrame(
            [(1, {"a": 1}), (2, {"b": 2})],
            "k long, props map<string,int>",
        )
        got = sorted(
            (r.k, r.label) for r in salted_join(df, dim, ["k"], salt=4).collect()
        )
        assert got == [(1, "d1"), (2, "d2")]


class TestJoinExplosionProfile:
    """skew.join_explosion_profile / _summary — exact join pre-flight."""

    @pytest.fixture(scope="class")
    def sides(self, spark):
        left = spark.createDataFrame(
            [(k, i) for k in ["hot", "warm", "cold"] for i in range({"hot": 50, "warm": 5, "cold": 1}[k])]
            + [(None, 0), ("left_only", 1)],
            "k string, v long",
        )
        right = spark.createDataFrame(
            [(k, i) for k in ["hot", "warm"] for i in range({"hot": 40, "warm": 3}[k])]
            + [(None, 0), ("right_only", 1)],
            "k string, v long",
        )
        return left, right

    def test_exact_products_and_order(self, spark, sides):
        from cassandra_diff_spark.operators.skew import join_explosion_profile

        left, right = sides
        rows = join_explosion_profile(left, right, ["k"]).collect()
        assert [(r.k, r.n_left, r.n_right, r.out_rows) for r in rows] == [
            ("hot", 50, 40, 2000),
            ("warm", 5, 3, 15),
        ]
        # ground truth: profile total == actual inner-join count
        assert sum(r.out_rows for r in rows) == left.join(right, "k").count()

    def test_summary_row(self, spark, sides):
        from cassandra_diff_spark.operators.skew import join_explosion_summary

        left, right = sides
        r = join_explosion_summary(left, right, ["k"]).collect()[0]
        assert (r.matching_keys, r.total_out_rows, r.max_key_out_rows) == (2, 2015, 2000)

    def test_no_match_is_zero_not_empty(self, spark, sides):
        from cassandra_diff_spark.operators.skew import join_explosion_summary

        left, _ = sides
        other = left.filter("k = 'left_only'").select(F.col("k").alias("x"), "v") \
            .select(F.lit("nomatch").alias("k"), "v")
        r = join_explosion_summary(left, other, ["k"]).collect()[0]
        assert (r.matching_keys, r.total_out_rows, r.max_key_out_rows) == (0, 0, 0)

    def test_data_never_joins_only_count_frames(self, spark, sides):
        """The joined relations must be the POST-aggregation count
        frames: both join children contain a HashAggregate below them."""
        from cassandra_diff_spark.operators.skew import join_explosion_profile

        left, right = sides
        plan = (
            join_explosion_profile(left, right, ["k"])
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        join_pos = max(plan.find("SortMergeJoin"), plan.find("BroadcastHashJoin"), plan.find("ShuffledHashJoin"))
        assert join_pos >= 0
        # aggregates appear below (after, in tree print) the join operator
        assert plan.count("HashAggregate", join_pos) >= 2

    def test_keys_validated(self, spark, sides):
        from cassandra_diff_spark.operators.skew import (
            join_explosion_profile,
            join_explosion_summary,
        )

        left, right = sides
        with pytest.raises(ValueError):
            join_explosion_profile(left, right, [])
        with pytest.raises(ValueError):
            join_explosion_summary(left, right, [])
