"""Structured-data privacy operators (operators/privacy.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cassandra_diff_spark.operators.privacy import (
    k_anonymity_report,
    pseudonymize,
)


class TestPseudonymize:
    def test_joins_survive_tokenization(self, spark):
        """Equal values get equal tokens across frames — referential
        integrity is the point of DETERMINISTIC pseudonymization."""
        a = spark.createDataFrame(
            [(1, 100), (2, 200), (3, 100)], "k long, cust long"
        )
        b = spark.createDataFrame(
            [(100, "gold"), (200, "basic")], "cust long, tier string"
        )
        pa = pseudonymize(a, ["cust"], secret="s")
        pb = pseudonymize(b, ["cust"], secret="s")
        joined = pa.join(pb, "cust")
        assert joined.count() == 3
        # and the raw values are gone: tokens are 15-hex strings
        toks = [r.cust for r in pa.collect()]
        assert all(len(t) == 15 and int(t, 16) >= 0 for t in toks)
        assert len({t for t in toks}) == 2  # 100 and 200 -> two tokens

    def test_secret_rotation_changes_every_token(self, spark):
        df = spark.createDataFrame([(1, "x"), (2, "y")], "k long, v string")
        t1 = {r.k: r.v for r in pseudonymize(df, ["v"], secret="a").collect()}
        t2 = {r.k: r.v for r in pseudonymize(df, ["v"], secret="b").collect()}
        assert all(t1[k] != t2[k] for k in t1)

    def test_null_handling_modes(self, spark):
        df = spark.createDataFrame(
            [(1, None), (2, None), (3, "x")], "k long, v string"
        )
        kept = {r.k: r.v for r in pseudonymize(df, ["v"], "s").collect()}
        assert kept[1] is None and kept[2] is None and kept[3] is not None
        sent = {
            r.k: r.v
            for r in pseudonymize(df, ["v"], "s", keep_null=False).collect()
        }
        # nulls collapse into ONE token group, distinct from real values
        assert sent[1] == sent[2] and sent[1] is not None
        assert sent[1] != sent[3]

    def test_untouched_columns_and_validation(self, spark):
        df = spark.createDataFrame([(1, "x", 5)], "k long, v string, n long")
        out = pseudonymize(df, ["v"], "s").collect()[0]
        assert out.k == 1 and out.n == 5
        with pytest.raises(ValueError, match="at least one column"):
            pseudonymize(df, [], "s")
        with pytest.raises(ValueError, match="not in frame"):
            pseudonymize(df, ["missing"], "s")

    def test_map_only_plan(self, spark):
        df = spark.createDataFrame([(1, "x")], "k long, v string")
        plan = (
            pseudonymize(df, ["v"], "s")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan


class TestKAnonymity:
    def test_violations_and_null_combinations(self, spark):
        df = spark.createDataFrame(
            [("a", 1)] * 5 + [("a", 2)] * 2 + [(None, 2)] * 2 + [("b", None)],
            "q1 string, q2 long",
        )
        got = {
            (r.q1, r.q2): r.n
            for r in k_anonymity_report(df, ["q1", "q2"], k=3).collect()
        }
        # ('a', 1) x5 passes; the three rare combos (incl. null quasi
        # values as REAL combinations) violate
        assert got == {("a", 2): 2, (None, 2): 2, ("b", None): 1}

    def test_k_boundary_is_strict(self, spark):
        df = spark.createDataFrame([("a",)] * 3, "q string")
        assert k_anonymity_report(df, ["q"], k=3).count() == 0
        assert k_anonymity_report(df, ["q"], k=4).count() == 1

    def test_validation(self, spark):
        df = spark.createDataFrame([("a",)], "q string")
        with pytest.raises(ValueError, match="at least one quasi"):
            k_anonymity_report(df, [], k=3)
        with pytest.raises(ValueError, match="k must be >= 2"):
            k_anonymity_report(df, ["q"], k=1)


class TestSuppressToK:
    def test_survivors_all_meet_k(self, spark):
        from cassandra_diff_spark.operators.privacy import (
            k_anonymity_report,
            suppress_to_k,
        )

        df = spark.createDataFrame(
            [("a", 1)] * 5 + [("a", 2)] * 2 + [(None, 2)] * 2 + [("b", None)],
            "q1 string, q2 long",
        )
        out = suppress_to_k(df, ["q1", "q2"], k=3)
        assert out.count() == 5  # only the ('a', 1) group survives
        # post-condition: the audit over the survivors is empty
        assert k_anonymity_report(out, ["q1", "q2"], k=3).count() == 0

    def test_null_combination_suppressed(self, spark):
        from cassandra_diff_spark.operators.privacy import suppress_to_k

        df = spark.createDataFrame(
            [(None,), (None,), ("x",), ("x",)], "q string"
        )
        # k=3: both groups (incl. the all-null one) are rare -> all drop
        assert suppress_to_k(df, ["q"], k=3).count() == 0

    def test_non_quasi_columns_pass_through(self, spark):
        from cassandra_diff_spark.operators.privacy import suppress_to_k

        df = spark.createDataFrame(
            [(i, "g", i * 10) for i in range(4)], "id long, q string, v long"
        )
        out = suppress_to_k(df, ["q"], k=3)
        assert out.columns == ["id", "q", "v"] and out.count() == 4


class TestLDiversity:
    def test_homogeneous_group_flagged(self, spark):
        from cassandra_diff_spark.operators.privacy import l_diversity_report

        # group 'a': 4 rows, all sensitive 'flu' -> 1 distinct < 2
        # group 'b': 3 rows, two values -> passes l=2
        df = spark.createDataFrame(
            [("a", "flu")] * 4 + [("b", "flu"), ("b", "cold"), ("b", "flu")],
            "q string, s string",
        )
        got = {
            r.q: (r.n, r.n_sensitive)
            for r in l_diversity_report(df, ["q"], "s", l=2).collect()
        }
        assert got == {"a": (4, 1)}

    def test_null_sensitive_is_a_value(self, spark):
        from cassandra_diff_spark.operators.privacy import l_diversity_report

        # all-null sensitive = ONE value (flagged at l=2); a group with
        # one real value + nulls has TWO values (passes l=2)
        df = spark.createDataFrame(
            [("a", None)] * 3 + [("b", None), ("b", "x")],
            "q string, s string",
        )
        got = {
            r.q: r.n_sensitive
            for r in l_diversity_report(df, ["q"], "s", l=2).collect()
        }
        assert got == {"a": 1}
        assert l_diversity_report(df, ["q"], "s", l=3).filter(
            F.col("q") == "b"
        ).collect()[0].n_sensitive == 2

    def test_validation(self, spark):
        from cassandra_diff_spark.operators.privacy import l_diversity_report

        df = spark.createDataFrame([("a", "x")], "q string, s string")
        with pytest.raises(ValueError, match="cannot also be a quasi"):
            l_diversity_report(df, ["q", "s"], "s", l=2)
        with pytest.raises(ValueError, match="l must be >= 2"):
            l_diversity_report(df, ["q"], "s", l=1)


class TestTCloseness:
    def test_python_reference(self, spark):
        from cassandra_diff_spark.operators.privacy import t_closeness_report

        rows = (
            [("a", 1)] * 4 + [("a", 2)] * 1        # group a skews low
            + [("b", 1)] * 1 + [("b", 2)] * 2 + [("b", 3)] * 2
        )
        df = spark.createDataFrame(rows, "q string, s long")
        got = {
            r.q: (r.n, r.t_micro)
            for r in t_closeness_report(df, ["q"], "s").collect()
        }
        # reference: bands [1,2,3], N=10, k=3
        from collections import Counter

        allc = Counter(s for _, s in rows)
        bands = sorted(allc)
        N, k = len(rows), len(bands)
        for g in ("a", "b"):
            gc = Counter(s for q, s in rows if q == g)
            n = sum(gc.values())
            cumg = cumG = 0
            gaps = 0
            for band in bands:
                cumg += gc.get(band, 0)
                cumG += allc[band]
                gaps += abs(cumg * N - cumG * n)
            want = (1000000 * gaps) // ((k - 1) * n * N)
            assert got[g] == (n, want), g
        # with exactly two groups the distances are symmetric (their
        # distributions sum to the global) — both must be positive
        assert got["a"][1] > 0 and got["b"][1] > 0

    def test_group_matching_global_scores_zero(self, spark):
        from cassandra_diff_spark.operators.privacy import t_closeness_report

        # both groups have the SAME distribution as the global
        rows = [("a", 1), ("a", 2), ("b", 1), ("b", 2)]
        df = spark.createDataFrame(rows, "q string, s long")
        got = {r.q: r.t_micro for r in t_closeness_report(df, ["q"], "s").collect()}
        assert got == {"a": 0, "b": 0}

    def test_null_band_ordered_first(self, spark):
        from cassandra_diff_spark.operators.privacy import t_closeness_report

        rows = [("a", None), ("a", None), ("b", 1), ("b", 2)]
        df = spark.createDataFrame(rows, "q string, s long")
        got = {r.q: r.t_micro for r in t_closeness_report(df, ["q"], "s").collect()}
        # group a is ALL null-band (global null mass 1/2): maximally far
        assert got["a"] > 0 and got["b"] > 0

    def test_constant_sensitive_yields_null(self, spark):
        from cassandra_diff_spark.operators.privacy import t_closeness_report

        df = spark.createDataFrame([("a", 1), ("b", 1)], "q string, s long")
        rows = t_closeness_report(df, ["q"], "s").collect()
        assert all(r.t_micro is None for r in rows)  # k-1 == 0
