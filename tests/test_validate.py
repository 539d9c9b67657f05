"""Declarative data-quality rules: fused single-pass counts, FK
anti-joins, violation sampling, and the one-scan plan property."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cassandra_diff_spark.operators.validate import (
    accepted_values,
    check_rules,
    foreign_key,
    in_range,
    not_null,
    predicate,
    regex_match,
    unique,
    violation_samples,
)


@pytest.fixture()
def facts(spark):
    return spark.createDataFrame(
        [
            (1, "a", 10.0, "x@y.com"),
            (2, "b", -5.0, "bad"),        # range violation, regex violation
            (3, None, 20.0, None),        # null cat; null email NOT a regex violation
            (3, "a", 999.0, "z@w.org"),   # dup id, hi-range violation
            (4, "zz", 1.0, "a@b.co"),     # accepted_values violation
        ],
        "id long, cat string, amt double, email string",
    )


@pytest.fixture()
def dim(spark):
    return spark.createDataFrame([(1,), (2,), (3,)], "ref_id long")


class TestCheckRules:
    def test_counts(self, spark, facts, dim):
        res = {
            r.rule: (r.violations, r.total, r["pass"])
            for r in check_rules(
                facts,
                [
                    not_null("cat"),
                    accepted_values("cat", ["a", "b"]),
                    in_range("amt", lo=0.0, hi=100.0),
                    regex_match("email", r"^[^@]+@[^@]+\.[^@]+$"),
                    unique("id"),
                    foreign_key(["id"], dim, ["ref_id"]),
                    predicate("amt_vs_id", F.col("amt") >= F.col("id"), "amt", "id"),
                ],
            ).collect()
        }
        assert res["not_null(cat)"] == (1, 5, False)
        assert res["accepted_values(cat)"] == (1, 5, False)  # null not counted
        assert res["in_range(amt)"] == (2, 5, False)
        assert res["regex_match(email)"] == (1, 5, False)  # null not counted
        assert res["unique(id)"] == (1, 5, False)
        assert res["foreign_key(id)"] == (1, 5, False)  # id=4 unmatched
        assert res["amt_vs_id"] == (2, 5, False)  # -5 < 2; 1.0 < 4

    def test_all_pass(self, spark, dim):
        df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, cat string")
        res = check_rules(
            df, [not_null("id", "cat"), unique("id"), foreign_key(["id"], dim, ["ref_id"])]
        ).collect()
        assert all(r["pass"] for r in res)
        assert all(r.total == 2 for r in res)

    def test_fk_only_rule_set(self, spark, facts, dim):
        res = check_rules(facts, [foreign_key(["id"], dim, ["ref_id"])]).collect()
        assert len(res) == 1 and res[0].violations == 1

    def test_null_fk_not_violation(self, spark, dim):
        df = spark.createDataFrame([(None,), (9,)], "id long")
        res = check_rules(df, [foreign_key(["id"], dim, ["ref_id"])]).collect()
        assert res[0].violations == 1  # only id=9; the null passes

    def test_duplicate_names_raise(self, facts):
        with pytest.raises(ValueError, match="duplicate"):
            check_rules(facts, [not_null("cat"), not_null("cat")])

    def test_single_scan_plan(self, spark, facts):
        """All row-local rules fuse into one aggregation over one scan."""
        df = check_rules(
            facts,
            [not_null("cat"), in_range("amt", lo=0.0), regex_match("email", ".*")],
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Scan ExistingRDD") <= 1

    def test_fk_respects_broadcast(self, spark, facts, dim):
        df = check_rules(facts, [foreign_key(["id"], dim, ["ref_id"])])
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


class TestViolationSamples:
    def test_samples_tagged(self, spark, facts):
        rows = violation_samples(
            facts, [not_null("cat"), in_range("amt", lo=0.0, hi=100.0)], limit=5
        ).collect()
        by_rule = {}
        for r in rows:
            by_rule.setdefault(r.rule, []).append(r.id)
        assert by_rule["not_null(cat)"] == [3]
        assert sorted(by_rule["in_range(amt)"]) == [2, 3]

    def test_limit(self, spark):
        df = spark.range(100).select(F.lit(None).cast("string").alias("c"), "id")
        rows = violation_samples(df, [not_null("c")], limit=3).collect()
        assert len(rows) == 3

    def test_no_row_local_raises(self, spark, facts, dim):
        with pytest.raises(ValueError, match="row-local"):
            violation_samples(facts, [unique("id")])
