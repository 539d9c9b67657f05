"""Ported decision matrices from the reference's two core test suites:

  * key-level merge-join matrix  — RangeComparatorTest.java:59-396
  * row-level zip-join matrix    — PartitionComparatorTest.java:41-197

Each case builds a tiny (source, target) DataFrame pair with a known
injected difference and asserts the 9 RangeStats counters
(RangeStats.java:31-39) exactly.
"""

from __future__ import annotations

import pytest

from cassandra_diff_spark.model import DiffStats, TableSpec
from cassandra_diff_spark.operators.diff import build_diff
from cassandra_diff_spark.functions.keys import (
    sample_predicate,
    specific_tokens_predicate,
)

NARROW = TableSpec(name="narrow1", partition_key=("pk",))  # FIXTURES.md §1
WIDE = TableSpec(name="wide1", partition_key=("pk",), clustering=("c1", "c2"))

NARROW_COLS = ["pk", "v1", "v2"]
WIDE_COLS = ["pk", "c1", "c2", "v1", "v2"]

NARROW_SCHEMA = "pk int, v1 string, v2 int"
WIDE_SCHEMA = "pk int, c1 int, c2 int, v1 string, v2 int"


def narrow_rows(keys, v2=1):
    return [(k, f"val{k}", v2) for k in keys]


def run(spark, spec, schema, src_rows, tgt_rows, align="set", **kw) -> DiffStats:
    src = spark.createDataFrame(src_rows, schema)
    tgt = spark.createDataFrame(tgt_rows, schema)
    res = build_diff(src, tgt, spec, align=align, **kw)
    return DiffStats.from_row(res.stats.collect()[0])


ALIGNS = ["set", "positional"]


# ---------------------------------------------------------------- key level
@pytest.mark.parametrize("align", ALIGNS)
class TestKeyLevelMatrix:
    def test_equal_key_sets(self, spark, align):
        # RangeComparatorTest: all keys match, all values match
        rows = narrow_rows(range(10))
        st = run(spark, NARROW, NARROW_SCHEMA, rows, rows, align)
        assert st == DiffStats(
            matched_partitions=10, matched_rows=10, matched_values=30
        )

    def test_both_empty(self, spark, align):
        st = run(spark, NARROW, NARROW_SCHEMA, [], [], align)
        assert st == DiffStats()

    def test_source_empty(self, spark, align):
        # RangeComparatorTest.java:186-211 one-side-empty fast path
        st = run(spark, NARROW, NARROW_SCHEMA, [], narrow_rows(range(5)), align)
        assert st == DiffStats(only_in_target=5)

    def test_target_empty(self, spark, align):
        st = run(spark, NARROW, NARROW_SCHEMA, narrow_rows(range(5)), [], align)
        assert st == DiffStats(only_in_source=5)

    @pytest.mark.parametrize("extra", [[0], [5], [99], [0, 5, 99]])
    def test_extra_keys_in_source(self, spark, align, extra):
        # extra keys at start / middle / end of either side (:110-163)
        common = [1, 2, 3, 4, 6, 7]
        st = run(
            spark, NARROW, NARROW_SCHEMA,
            narrow_rows(sorted(common + extra)), narrow_rows(common), align,
        )
        assert st == DiffStats(
            matched_partitions=6,
            only_in_source=len(extra),
            matched_rows=6,
            matched_values=18,
        )

    @pytest.mark.parametrize("extra", [[0], [5], [99], [0, 5, 99]])
    def test_extra_keys_in_target(self, spark, align, extra):
        common = [1, 2, 3, 4, 6, 7]
        st = run(
            spark, NARROW, NARROW_SCHEMA,
            narrow_rows(common), narrow_rows(sorted(common + extra)), align,
        )
        assert st == DiffStats(
            matched_partitions=6,
            only_in_target=len(extra),
            matched_rows=6,
            matched_values=18,
        )

    def test_fully_disjoint_interleaved(self, spark, align):
        # RangeComparatorTest.java:166-183
        st = run(
            spark, NARROW, NARROW_SCHEMA,
            narrow_rows([0, 2, 4, 6]), narrow_rows([1, 3, 5, 7]), align,
        )
        assert st == DiffStats(only_in_source=4, only_in_target=4)

    def test_value_mismatch_classification(self, spark, align):
        # RangeComparatorTest.java:369-396: value mismatch => partition
        # mismatched, row still matched
        src = narrow_rows(range(4))
        tgt = narrow_rows(range(4))
        tgt[2] = (2, "DIFFERENT", 1)
        st = run(spark, NARROW, NARROW_SCHEMA, src, tgt, align)
        assert st == DiffStats(
            matched_partitions=3,
            mismatched_partitions=1,
            matched_rows=4,
            matched_values=11,  # 4 rows x 3 cols - 1 mismatched value
            mismatched_values=1,
        )

    def test_null_vs_value_and_null_null(self, spark, align):
        # null-aware equality: PartitionComparator.java:116-133
        src = [(1, None, 1), (2, "x", None)]
        tgt = [(1, None, 1), (2, "x", 7)]
        st = run(spark, NARROW, NARROW_SCHEMA, src, tgt, align)
        assert st == DiffStats(
            matched_partitions=1,
            mismatched_partitions=1,
            matched_rows=2,
            matched_values=5,
            mismatched_values=1,
        )


# ---------------------------------------------------- token filter / sampling
class TestFiltersAndSampling:
    def test_disallowed_tokens_counted_skipped(self, spark):
        # RangeComparator.java:125-131: disallowed in-both keys => skipped
        rows = narrow_rows(range(6))
        src = spark.createDataFrame(rows, NARROW_SCHEMA)
        tgt = spark.createDataFrame(rows, NARROW_SCHEMA)
        # find two real token values to disallow
        from cassandra_diff_spark.functions.keys import token_expr

        toks = dict(
            src.select("pk", token_expr(["pk"]).alias("t")).collect()
        )
        bad = [toks[0], toks[3]]
        res = build_diff(
            src, tgt, NARROW,
            token_filter=lambda t: specific_tokens_predicate(t, bad, "REJECT"),
        )
        st = DiffStats.from_row(res.stats.collect()[0])
        assert st == DiffStats(
            matched_partitions=4, skipped_partitions=2,
            matched_rows=4, matched_values=12,
        )

    def test_only_in_keys_not_filtered(self, spark):
        # only-in-source/target counted BEFORE token filter
        # (RangeComparator.java:93-114 vs :125-131)
        src = spark.createDataFrame(narrow_rows([1, 2]), NARROW_SCHEMA)
        tgt = spark.createDataFrame(narrow_rows([2, 3]), NARROW_SCHEMA)
        res = build_diff(
            src, tgt, NARROW, token_filter=lambda t: F_false()
        )
        st = DiffStats.from_row(res.stats.collect()[0])
        assert st == DiffStats(
            skipped_partitions=1, only_in_source=1, only_in_target=1
        )

    def test_sampler_silently_excludes(self, spark):
        # sampler False => no counters at all (RangeComparator.java:137-143)
        rows = narrow_rows(range(100))
        src = spark.createDataFrame(rows, NARROW_SCHEMA)
        tgt = spark.createDataFrame(rows, NARROW_SCHEMA)
        res = build_diff(
            src, tgt, NARROW, sampler=lambda t: sample_predicate(t, 0.5, seed=42)
        )
        st = DiffStats.from_row(res.stats.collect()[0])
        total = st.matched_partitions
        assert 20 < total < 80  # DifferTest.java:74-82 distribution bound
        assert st.matched_rows == total and st.matched_values == 3 * total

    def test_sampling_deterministic(self, spark):
        rows = narrow_rows(range(100))
        src = spark.createDataFrame(rows, NARROW_SCHEMA)
        tgt = spark.createDataFrame(rows, NARROW_SCHEMA)

        def go():
            res = build_diff(
                src, tgt, NARROW,
                sampler=lambda t: sample_predicate(t, 0.3, seed=7),
            )
            return DiffStats.from_row(res.stats.collect()[0])

        assert go() == go()

    def test_sampler_fraction_validated(self, spark):
        # Differ.java:243-245 rejects p outside (0, 1]
        with pytest.raises(ValueError):
            sample_predicate(None, 0.0, 1)
        with pytest.raises(ValueError):
            sample_predicate(None, 1.5, 1)

    def test_prefilter_mode_prunes_both_sides(self, spark):
        rows = narrow_rows(range(50))
        src = spark.createDataFrame(rows, NARROW_SCHEMA)
        tgt = spark.createDataFrame(rows, NARROW_SCHEMA)
        res = build_diff(
            src, tgt, NARROW, prefilter=True,
            sampler=lambda t: sample_predicate(t, 0.4, seed=1),
        )
        st = DiffStats.from_row(res.stats.collect()[0])
        assert 0 < st.matched_partitions < 50
        assert st.only_in_source == 0 and st.only_in_target == 0


def F_false():
    from pyspark.sql import functions as F

    return F.lit(False)


# ---------------------------------------------------------------- row level
class TestRowLevelMatrix:
    """PartitionComparatorTest.java matrix — positional (parity) mode."""

    def wide_rows(self, pk, pairs, v="x"):
        return [(pk, c1, c2, f"{v}{c1}-{c2}", c1 * 10 + c2) for c1, c2 in pairs]

    def test_identical_partitions(self, spark):
        rows = self.wide_rows(1, [(1, 1), (1, 2), (2, 1)])
        st = run(spark, WIDE, WIDE_SCHEMA, rows, rows, "positional")
        assert st == DiffStats(
            matched_partitions=1, matched_rows=3, matched_values=9
        )

    def test_extra_row_at_start_fail_fast_zero_counts(self, spark):
        # PartitionComparatorTest.java:82-103: first position diverges =>
        # zero counted rows/values, partition mismatched
        common = [(2, 1), (2, 2)]
        src = self.wide_rows(1, [(1, 1)] + common)
        tgt = self.wide_rows(1, common)
        st = run(spark, WIDE, WIDE_SCHEMA, src, tgt, "positional")
        assert st == DiffStats(mismatched_partitions=1)

    def test_extra_rows_at_end_counted_then_mismatch(self, spark):
        # PartitionComparatorTest.java:106-127
        common = [(1, 1), (1, 2)]
        src = self.wide_rows(1, common + [(9, 9)])
        tgt = self.wide_rows(1, common)
        st = run(spark, WIDE, WIDE_SCHEMA, src, tgt, "positional")
        assert st == DiffStats(
            mismatched_partitions=1, matched_rows=2, matched_values=6
        )

    def test_mid_partition_insertion_misaligns_tail(self, spark):
        # positional zip semantics: divergence mid-stream stops counting
        src = self.wide_rows(1, [(1, 1), (1, 5), (2, 1), (2, 2)])
        tgt = self.wide_rows(1, [(1, 1), (2, 1), (2, 2)])
        st = run(spark, WIDE, WIDE_SCHEMA, src, tgt, "positional")
        assert st == DiffStats(
            mismatched_partitions=1, matched_rows=1, matched_values=3
        )

    def test_set_mode_realigns_after_insertion(self, spark):
        # scale mode keeps comparing re-aligned rows (documented divergence)
        src = self.wide_rows(1, [(1, 1), (1, 5), (2, 1), (2, 2)])
        tgt = self.wide_rows(1, [(1, 1), (2, 1), (2, 2)])
        st = run(spark, WIDE, WIDE_SCHEMA, src, tgt, "set")
        assert st == DiffStats(
            mismatched_partitions=1, matched_rows=3, matched_values=9
        )

    def test_one_clustering_column(self, spark):
        spec = TableSpec(name="w1", partition_key=("pk",), clustering=("c1",))
        rows = [(1, 1, "a", 10), (1, 2, "b", 20)]
        st = run(spark, spec, "pk int, c1 int, v1 string, v2 int",
                 rows, rows, "positional")
        assert st == DiffStats(
            matched_partitions=1, matched_rows=2, matched_values=6
        )

    def test_value_mismatch_with_clusterings(self, spark):
        # PartitionComparatorTest.java:171-197: value mismatch does NOT stop
        # the partition walk
        src = self.wide_rows(1, [(1, 1), (1, 2), (1, 3)])
        tgt = self.wide_rows(1, [(1, 1), (1, 2), (1, 3)])
        tgt[1] = (1, 1, 2, "CHANGED", 999)  # both regulars differ
        st = run(spark, WIDE, WIDE_SCHEMA, src, tgt, "positional")
        assert st == DiffStats(
            mismatched_partitions=1,
            matched_rows=3,
            matched_values=7,  # 3 rows x 3 regulars - 2 mismatches
            mismatched_values=2,
        )

    def test_multiple_partitions_mixed(self, spark):
        src = self.wide_rows(1, [(1, 1)]) + self.wide_rows(2, [(1, 1), (1, 2)])
        tgt = self.wide_rows(1, [(1, 1)]) + self.wide_rows(2, [(1, 1)])
        st = run(spark, WIDE, WIDE_SCHEMA, src, tgt, "positional")
        assert st == DiffStats(
            matched_partitions=1,
            mismatched_partitions=1,
            matched_rows=2,
            matched_values=6,
        )

    def test_null_clustering_values_align(self, spark):
        # clusteringsEqual treats null==null as equal
        # (PartitionComparator.java:102-114)
        rows = [(1, None, 1, "a", 1), (1, 1, 1, "b", 2)]
        st = run(spark, WIDE, WIDE_SCHEMA, rows, rows, "positional")
        assert st == DiffStats(
            matched_partitions=1, matched_rows=2, matched_values=6
        )


class TestSchemaValidation:
    def test_name_mismatch_rejected(self, spark):
        # Differ.validateTableSpecs (Differ.java:287-291)
        src = spark.createDataFrame([(1, "a")], "pk int, v1 string")
        tgt = spark.createDataFrame([(1, "a")], "pk int, v2 string")
        with pytest.raises(ValueError, match="schemas differ"):
            build_diff(src, tgt, TableSpec(name="t", partition_key=("pk",)))

    def test_missing_key_rejected(self, spark):
        src = spark.createDataFrame([(1, "a")], "pk int, v1 string")
        with pytest.raises(ValueError, match="missing"):
            build_diff(src, src, TableSpec(name="t", partition_key=("nope",)))


class TestSkewSafe:
    def test_skew_safe_same_results(self, spark):
        # hot partition: one pk with many clustering rows
        rows = [(1, c, f"v{c}", c) for c in range(200)] + [(2, 1, "a", 1)]
        tgt_rows = [r for r in rows if r[1] != 150 and r[0] != 2] + [(2, 1, "CHANGED", 1)]
        src = spark.createDataFrame(rows, WIDE_1CK_SCHEMA)
        tgt = spark.createDataFrame(tgt_rows, WIDE_1CK_SCHEMA)
        spec = TableSpec(name="hot", partition_key=("pk",), clustering=("c1",))
        normal = DiffStats.from_row(
            build_diff(src, tgt, spec, align="set").stats.collect()[0]
        )
        skew = DiffStats.from_row(
            build_diff(src, tgt, spec, align="set", skew_safe=True).stats.collect()[0]
        )
        assert normal == skew
        assert normal.mismatched_partitions == 2  # missing row + changed value


WIDE_1CK_SCHEMA = "pk int, c1 int, v1 string, v2 int"


class TestReadmeDemoParity:
    def test_readme_demo_numbers(self, spark):
        """The reference's README demo (README.md:47-61): 1,000 identical
        partitions of cassandra-stress standard1 (binary key + 5 binary
        cols) must report exactly 1,000 matched partitions, 1,000 matched
        rows and 6,000 matched values (6 counted columns/row — the
        'regular includes PK' rule, TableSpec.java:84-87)."""
        rows = [
            tuple([bytes([i % 256, i // 256])] + [f"c{j}-{i}".encode() for j in range(5)])
            for i in range(1000)
        ]
        schema = "key binary, C0 binary, C1 binary, C2 binary, C3 binary, C4 binary"
        df = spark.createDataFrame(rows, schema)
        spec = TableSpec(name="keyspace1.standard1", partition_key=("key",))
        st = DiffStats.from_row(build_diff(df, df, spec).stats.collect()[0])
        assert st == DiffStats(
            matched_partitions=1000, matched_rows=1000, matched_values=6000
        )
        assert st.all_matches


class TestRepairActions:
    """repair_actions: applying the emitted write set to the target must
    reproduce the source exactly — the round-trip property."""

    def _apply(self, tgt, repair, keys, cols):
        from pyspark.sql import functions as F

        upserts = repair.filter(F.col("op") != "delete").select(*cols)
        keep = tgt.join(repair.select(*keys), keys, "left_anti")
        return keep.select(*cols).unionByName(upserts)

    def test_roundtrip_orders(self, spark, sf_dir):
        from cassandra_diff_spark.gate import ORDERS_SPEC, orders_pair
        from cassandra_diff_spark.operators.diff import repair_actions

        src, tgt = orders_pair(spark, sf_dir)
        rep = repair_actions(src, tgt, ORDERS_SPEC)
        ops = {r["op"] for r in rep.select("op").distinct().collect()}
        assert ops == {"insert", "update", "delete"}
        fixed = self._apply(tgt, rep, ["o_orderkey"], src.columns)
        assert fixed.exceptAll(src).count() == 0
        assert src.exceptAll(fixed).count() == 0

    def test_roundtrip_clustered_events(self, spark, sf_dir):
        from cassandra_diff_spark.gate import EVENTS_SPEC, events_pair
        from cassandra_diff_spark.operators.diff import repair_actions

        src, tgt = events_pair(spark, sf_dir)
        rep = repair_actions(src, tgt, EVENTS_SPEC)
        keys = ["user_id", "event_type", "ts", "event_id"]
        fixed = self._apply(tgt, rep, keys, src.columns)
        assert fixed.exceptAll(src).count() == 0
        assert src.exceptAll(fixed).count() == 0

    def test_identical_tables_empty_repair(self, spark, sf_dir):
        from cassandra_diff_spark.gate import ORDERS_SPEC
        from cassandra_diff_spark.operators.diff import repair_actions

        o = spark.read.parquet(f"{sf_dir}/orders.parquet")
        assert repair_actions(o, o, ORDERS_SPEC).count() == 0


class TestSchemaTolerantDiff:
    def test_intersection_diff_and_exclusive_columns(self, spark, sf_dir):
        from pyspark.sql import functions as F

        from cassandra_diff_spark.gate import ORDERS_SPEC, orders_pair
        from cassandra_diff_spark.operators.diff import (
            build_diff,
            build_diff_common,
        )

        src, tgt = orders_pair(spark, sf_dir)
        plain = build_diff(src, tgt, ORDERS_SPEC).stats.collect()[0].asDict()
        res, src_only, tgt_only = build_diff_common(
            src.withColumn("a_legacy", F.lit("x")),
            tgt.withColumn("b_new", F.lit(2)),
            ORDERS_SPEC,
        )
        assert src_only == ["a_legacy"] and tgt_only == ["b_new"]
        assert res.stats.collect()[0].asDict() == plain

    def test_missing_key_still_raises(self, spark, sf_dir):
        import pytest as _pytest

        from cassandra_diff_spark.gate import ORDERS_SPEC, orders_pair
        from cassandra_diff_spark.operators.diff import build_diff_common

        src, tgt = orders_pair(spark, sf_dir)
        with _pytest.raises(ValueError, match="key columns missing"):
            build_diff_common(
                src, tgt.withColumnRenamed("o_orderkey", "renamed"), ORDERS_SPEC
            )


class TestRepairRandomized:
    """Seeded randomized round-trip: applying the repair set to any
    unique-keyed target reproduces the source exactly."""

    def _random_unique_pair(self, spark, seed: int):
        import random

        rng = random.Random(seed)
        n = rng.randint(8, 50)

        def cell(kind):
            if rng.random() < 0.15:
                return None
            if kind == "i":
                return rng.randint(0, 8)
            return rng.choice(["a", "b", "c", "dd"])

        rows = [(i // 3, i % 3, cell("i"), cell("s")) for i in range(n)]
        schema = "pk int, ck int, v int, w string"
        src = spark.createDataFrame(rows, schema)
        tgt_rows = [
            (r[0], r[1], (r[2] or 0) + 1 if rng.random() < 0.25 else r[2],
             None if rng.random() < 0.1 else r[3])
            for r in rows
            if rng.random() > 0.15
        ] + [(100 + i, 0, cell("i"), cell("s")) for i in range(rng.randint(0, 4))]
        tgt = spark.createDataFrame(tgt_rows, schema)
        return src, tgt

    @pytest.mark.parametrize("seed", [21, 22, 23, 24])
    def test_roundtrip(self, spark, seed):
        from pyspark.sql import functions as F

        from cassandra_diff_spark.model import TableSpec
        from cassandra_diff_spark.operators.diff import repair_actions

        spec = TableSpec(name="r", partition_key=("pk",), clustering=("ck",))
        src, tgt = self._random_unique_pair(spark, seed)
        rep = repair_actions(src, tgt, spec)
        keep = tgt.join(rep.select("pk", "ck"), ["pk", "ck"], "left_anti")
        fixed = keep.unionByName(
            rep.filter(F.col("op") != "delete").select(*src.columns)
        )
        assert fixed.exceptAll(src).count() == 0, seed
        assert src.exceptAll(fixed).count() == 0, seed
