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


class TestTokenSortKey:
    def test_reorder_and_punctuation_invariant(self, spark):
        from cassandra_diff_spark.operators.linkage import token_sort_key

        df = spark.createDataFrame(
            [("Smith, John A.",), ("john a smith",), ("JOHN  A-SMITH",)],
            "name string",
        )
        keys = {r[0] for r in df.select(token_sort_key(F.col("name"))).collect()}
        assert keys == {"a john smith"}

    def test_sql_twin_matches(self, spark):
        import duckdb

        from cassandra_diff_spark.operators.linkage import (
            token_sort_key,
            token_sort_key_sql,
        )

        vals = ["Smith, John A.", "  Maria-Garcia ", "x", ""]
        df = spark.createDataFrame([(v,) for v in vals], "name string")
        got = [r[0] for r in df.select(token_sort_key(F.col("name"))).collect()]
        con = duckdb.connect()
        want = [
            con.sql(
                f"SELECT {token_sort_key_sql('?')}".replace("?", f"'{v}'")
            ).fetchone()[0]
            for v in vals
        ]
        assert got == want


class TestFuzzyMatchPairs:
    def test_weighted_score_and_breakdown(self, spark):
        from cassandra_diff_spark.operators.linkage import fuzzy_match_pairs

        df = spark.createDataFrame(
            [
                (1, "jonathan smith", "york"),
                (2, "jonathen smith", "york"),    # name 1 edit, city same
                (3, "jonathan smith", "kent"),    # name same, city differs
                (4, None, "york"),                # null name -> name sim 0
            ],
            "id long, name string, city string",
        )
        got = {
            (r.id_a, r.id_b): r
            for r in fuzzy_match_pairs(
                df,
                "id",
                {"name": 3, "city": 1},
                block_keys=[F.expr("substr(city, 1, 4)")],
                min_score_pct=0,
            ).collect()
        }
        r12 = got[(1, 2)]
        assert abs(r12.name_sim - 100.0 * 13 / 14) < 1e-9
        assert r12.city_sim == 100.0
        assert abs(r12.score_pct - (r12.name_sim * 3 + 100.0) / 4) < 1e-9
        # null name scores 0 on that field
        r14 = got[(1, 4)]
        assert r14.name_sim == 0.0 and r14.city_sim == 100.0
        # (1,3) not candidates: different city block
        assert (1, 3) not in got

    def test_min_score_filters(self, spark):
        from cassandra_diff_spark.operators.linkage import fuzzy_match_pairs

        df = spark.createDataFrame(
            [(1, "aaaa", "k"), (2, "aaab", "k"), (3, "zzzz", "k")],
            "id long, name string, blk string",
        )
        got = fuzzy_match_pairs(
            df,
            "id",
            {"name": 1},
            block_keys=[F.col("blk")],
            min_score_pct=70,
        ).collect()
        assert {(r.id_a, r.id_b) for r in got} == {(1, 2)}

    def test_validation(self, spark):
        from cassandra_diff_spark.operators.linkage import fuzzy_match_pairs

        df = spark.createDataFrame([(1, "a")], "id long, name string")
        with pytest.raises(ValueError):
            fuzzy_match_pairs(df, "id", {}, block_keys=[F.col("name")],
                              min_score_pct=50)
        with pytest.raises(ValueError):
            fuzzy_match_pairs(df, "id", {"name": 0},
                              block_keys=[F.col("name")], min_score_pct=50)
