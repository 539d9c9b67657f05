"""Fuzzy record linkage (operators/linkage.py)."""

import pytest
from pyspark.sql import functions as F

from cassandra_diff_spark.operators.linkage import (
    fuzzy_block_profile,
    fuzzy_dup_pairs,
)


@pytest.fixture(scope="module")
def records(spark):
    return spark.createDataFrame(
        [
            (1, "jonathan smith"),
            (2, "jonathen smith"),   # 1 edit from 1
            (3, "jonathan smyth"),   # 1 edit from 1, 2 from 2
            (4, "maria garcia"),
            (5, "mariah garcia"),    # 1 insert from 4
            (6, "completely different"),
            (7, None),
        ],
        "id long, name string",
    )


class TestFuzzyDupPairs:
    def test_finds_planted_typos(self, spark, records):
        pairs = {
            (r.id_a, r.id_b): r.edit_dist
            for r in fuzzy_dup_pairs(
                records,
                "id",
                "name",
                block_keys=[F.expr("substr(name, 1, 3)")],
                max_edit=2,
            ).collect()
        }
        assert pairs[(1, 2)] == 1 and pairs[(1, 3)] == 1 and pairs[(2, 3)] == 2
        assert pairs[(4, 5)] == 1
        assert not any(6 in p or 7 in p for p in pairs)

    def test_multi_strategy_recall_and_single_report(self, spark, records):
        """A pair caught by BOTH strategies reports once; a pair whose
        typo breaks the prefix key is recovered by the suffix key."""
        df = spark.createDataFrame(
            [(1, "xonathan smith"), (2, "jonathan smith"), (3, "jonathan smitx")],
            "id long, name string",
        )
        prefix = F.expr("substr(name, 1, 4)")
        suffix = F.expr("right(name, 4)")
        got = fuzzy_dup_pairs(
            df, "id", "name", block_keys=[prefix, suffix], max_edit=2
        ).collect()
        pairs = {(r.id_a, r.id_b): r.edit_dist for r in got}
        # (1,2): prefix differs, suffix matches; (2,3): prefix matches,
        # suffix differs; (1,3): neither matches -> not a candidate
        assert pairs == {(1, 2): 1, (2, 3): 1}
        assert len(got) == len(pairs)  # no duplicate pair rows

    def test_max_block_drops_degenerate_bucket(self, spark):
        df = spark.createDataFrame(
            [(i, f"name{i:03d}") for i in range(30)], "id long, name string"
        )
        const = F.lit("same")
        assert (
            fuzzy_dup_pairs(
                df, "id", "name", block_keys=[const], max_edit=3, max_block=10
            ).count()
            == 0
        )
        assert (
            fuzzy_dup_pairs(
                df, "id", "name", block_keys=[const], max_edit=3
            ).count()
            > 0
        )

    def test_requires_strategy(self, spark, records):
        with pytest.raises(ValueError):
            fuzzy_dup_pairs(records, "id", "name", block_keys=[], max_edit=1)


class TestBlockProfile:
    def test_sizes_and_pair_math(self, spark, records):
        prof = fuzzy_block_profile(
            records,
            block_keys=[F.expr("substr(name, 1, 3)"), F.lit("all")],
            text_col="name",
        ).collect()
        by = {(r.strat, r.block_key): (r.n, r.n_pairs) for r in prof}
        assert by[(0, "jon")] == (3, 3)
        assert by[(0, "mar")] == (2, 1)
        assert by[(1, "all")] == (6, 15)  # null name excluded


class TestLinkagePlan:
    def test_no_cartesian_and_equi_join_on_blocks(self, spark, records):
        """The candidate join must be a hash/sort-merge EQUI-join on
        (strategy, block key) — never a cartesian or BNLJ."""
        plan = fuzzy_dup_pairs(
            records,
            "id",
            "name",
            block_keys=[F.expr("substr(name, 1, 3)"), F.expr("right(name, 3)")],
            max_edit=2,
            max_block=100,
        )._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
