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

    def test_unique_witnesses_arrive_as_groups(self, spark):
        df = spark.createDataFrame(
            [(1, "a"), (1, "b"), (2, "c"), (3, "d"), (3, "e"), (3, "f")],
            "id long, v string",
        )
        rows = violation_samples(df, [unique("id")], limit=10).collect()
        got = sorted((r.id, r.v) for r in rows)
        # every row of every collided key; the unique id=2 row absent
        assert got == [(1, "a"), (1, "b"), (3, "d"), (3, "e"), (3, "f")]
        assert all(r.rule == "unique(id)" for r in rows)

    def test_unique_limit_caps_keys_not_rows(self, spark):
        df = spark.createDataFrame(
            [(k, i) for k in range(10) for i in range(3)], "id long, v long"
        )
        rows = violation_samples(df, [unique("id")], limit=2).collect()
        keys = {r.id for r in rows}
        assert len(keys) == 2  # 2 sampled keys ...
        assert len(rows) == 6  # ... each with its full colliding group

    def test_fk_orphan_rows_sampled(self, spark, facts, dim):
        rows = violation_samples(
            facts, [foreign_key(["id"], dim, ["ref_id"])], limit=5
        ).collect()
        assert [r.id for r in rows] == [4]  # the dangling key's row
        assert rows[0].rule == "foreign_key(id)"

    def test_no_rules_raises(self, spark, facts):
        with pytest.raises(ValueError, match="no rules"):
            violation_samples(facts, [])


class TestConfigDrivenValidation:
    @pytest.fixture()
    def vdirs(self, spark, sf_dir, tmp_path_factory):
        """source = pristine orders+customer; target drops some customers
        so orders-side FK breaks there."""
        base = tmp_path_factory.mktemp("vpair")
        src_dir, tgt_dir = str(base / "src"), str(base / "tgt")
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
        customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
        orders.write.parquet(f"{src_dir}/orders.parquet")
        customer.write.parquet(f"{src_dir}/customer.parquet")
        orders.write.parquet(f"{tgt_dir}/orders.parquet")
        customer.filter(F.col("c_custkey") % 7 != 0).write.parquet(
            f"{tgt_dir}/customer.parquet"
        )
        return src_dir, tgt_dir

    def _cfg_text(self, src_dir, tgt_dir, side="both"):
        return f"""
job_id: v-test
source: {{provider: parquet, options: {{path: {src_dir}}}}}
target: {{provider: parquet, options: {{path: {tgt_dir}}}}}
keyspace_tables:
  - {{name: orders, partition_key: [o_orderkey]}}
validation:
  - table: orders
    side: {side}
    rules:
      - {{kind: not_null, columns: [o_custkey]}}
      - {{kind: accepted_values, columns: [o_orderstatus], values: [O, F, P]}}
      - {{kind: expr, name: price_positive, expr: o_totalprice > 0, columns: [o_totalprice]}}
      - {{kind: unique, columns: [o_orderkey]}}
      - {{kind: foreign_key, columns: [o_custkey], ref_table: customer, ref_columns: [c_custkey]}}
"""

    def test_run_validation_both_sides(self, spark, vdirs):
        import io

        from cassandra_diff_spark.config import load_config
        from cassandra_diff_spark.job import run_validation

        src_dir, tgt_dir = vdirs
        cfg = load_config(io.StringIO(self._cfg_text(src_dir, tgt_dir)))
        rows = run_validation(spark, cfg).collect()
        assert len(rows) == 10  # 5 rules x 2 sides
        by = {(r.side, r.rule): (r.violations, r["pass"]) for r in rows}
        # pristine source: everything passes
        assert all(p for (s, _), (_, p) in by.items() if s == "source")
        # target customer table lost %7 keys -> orders FK violations there
        v, p = by[("target", "foreign_key(o_custkey)")]
        assert v > 0 and not p
        assert by[("target", "unique(o_orderkey)")] == (0, True)

    def test_cli_validate_exit_codes(self, spark, vdirs, tmp_path, capsys):
        import json as _json

        from cassandra_diff_spark.__main__ import main

        src_dir, tgt_dir = vdirs
        ok_cfg = tmp_path / "ok.yaml"
        ok_cfg.write_text(self._cfg_text(src_dir, tgt_dir, side="source"))
        assert main([str(ok_cfg), "--validate"]) == 0
        lines = [
            _json.loads(x)
            for x in capsys.readouterr().out.strip().splitlines()
        ]
        assert len(lines) == 5 and all(x["pass"] for x in lines)

        bad_cfg = tmp_path / "bad.yaml"
        bad_cfg.write_text(self._cfg_text(src_dir, tgt_dir, side="target"))
        assert main([str(bad_cfg), "--validate"]) == 1


class TestProfileTable:
    def test_profile_modes(self, spark, facts):
        from cassandra_diff_spark.operators.validate import profile_table

        rows = {r.column: r for r in profile_table(facts).collect()}
        assert rows["id"].n == 5 and rows["id"].n_distinct == 4
        assert rows["cat"].n_null == 1 and rows["cat"].n_distinct == 3
        assert rows["amt"].min_value == "-5.0"
        assert rows["amt"].mean == pytest.approx((10.0 - 5.0 + 20.0 + 999.0 + 1.0) / 5)
        assert rows["cat"].mean is None  # non-numeric
        # approx mode still produces a sane cardinality; None skips
        ap = {r.column: r for r in profile_table(facts, distinct="approx").collect()}
        assert 3 <= ap["id"].n_distinct <= 5
        no = {r.column: r for r in profile_table(facts, distinct=None).collect()}
        assert no["id"].n_distinct is None

    def test_no_expand_in_approx_plan(self, spark, facts):
        """approx mode must stay single-pass: no Expand node (the exact
        mode's count_distincts each multiply the shuffle input)."""
        from cassandra_diff_spark.operators.validate import profile_table

        plan = (
            profile_table(facts, distinct="approx")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Expand" not in plan


def test_cli_profile(spark, sf_dir, tmp_path, capsys):
    import json as _json

    from cassandra_diff_spark.__main__ import main

    cfg = tmp_path / "p.yaml"
    cfg.write_text(
        f"source: {{provider: parquet, options: {{path: {sf_dir}}}}}\n"
        f"target: {{provider: parquet, options: {{path: {sf_dir}}}}}\n"
    )
    assert main([str(cfg), "--profile", "orders", "source"]) == 0
    lines = [_json.loads(x) for x in capsys.readouterr().out.strip().splitlines()]
    cols = {x["column"] for x in lines}
    assert "o_orderkey" in cols and len(lines) == 6
    ok = next(x for x in lines if x["column"] == "o_orderkey")
    assert ok["n_null"] == 0 and ok["n"] > 0 and ok["n_distinct"] > 0


class TestNumericCorrelations:
    """validate.numeric_correlations — exact-moment Pearson matrix."""

    @pytest.fixture(scope="class")
    def ndf(self, spark):
        rows = [
            (float(i), float(2 * i + 3), float(i % 4), 7.0, None if i == 5 else float(i))
            for i in range(40)
        ]
        return spark.createDataFrame(rows, "a double, b double, c double, k double, d double")

    def test_matches_numpy(self, spark, ndf):
        import numpy as np

        from cassandra_diff_spark.operators.validate import numeric_correlations

        out = {
            (r.col_i, r.col_j): r
            for r in numeric_correlations(ndf, ["a", "b", "c"], scale=1000).collect()
        }
        assert len(out) == 6 and all(r.n == 40 for r in out.values())
        m = np.array([[float(i), float(2 * i + 3), float(i % 4)] for i in range(40)])
        q = np.round(m * 1000) / 1000.0
        exp_cov = np.cov(q, rowvar=False, bias=True)
        exp_corr = np.corrcoef(q, rowvar=False)
        names = ["a", "b", "c"]
        for i in range(3):
            for j in range(i, 3):
                r = out[(names[i], names[j])]
                assert abs(r.cov - exp_cov[i, j]) < 1e-9
                assert abs(r.corr - exp_corr[i, j]) < 1e-12

    def test_perfect_linear_and_zero_variance(self, spark, ndf):
        from cassandra_diff_spark.operators.validate import numeric_correlations

        out = {
            (r.col_i, r.col_j): r
            for r in numeric_correlations(ndf, ["a", "b", "k"]).collect()
        }
        assert out[("a", "b")].corr == 1.0  # b = 2a + 3 exactly
        assert out[("a", "k")].corr is None  # constant column -> NULL
        assert out[("k", "k")].corr is None and out[("k", "k")].cov == 0.0

    def test_listwise_deletion(self, spark, ndf):
        from cassandra_diff_spark.operators.validate import numeric_correlations

        out = numeric_correlations(ndf, ["a", "d"]).collect()
        assert all(r.n == 39 for r in out)  # the one null-d row drops everywhere

    def test_single_aggregation_scan(self, spark, ndf):
        from cassandra_diff_spark.operators.validate import numeric_correlations

        plan = (
            numeric_correlations(ndf, ["a", "b", "c"])
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert plan.count("HashAggregate") <= 4  # partial+final, one agg pair (+AQE wrap)
        assert "CartesianProduct" not in plan and "Expand" not in plan

    def test_validates_cols(self, spark, ndf):
        from cassandra_diff_spark.operators.validate import numeric_correlations

        with pytest.raises(ValueError, match="at least 2"):
            numeric_correlations(ndf, ["a"])


class TestProfileDrift:
    """validate.profile_drift — kilobyte-frame column-shape comparison."""

    def test_detects_each_drift_kind(self, spark):
        from cassandra_diff_spark.operators.validate import (
            profile_drift,
            profile_table,
        )

        ref_df = spark.createDataFrame(
            [(i, float(i), "x") for i in range(100)], "a long, b double, c string"
        )
        cur_df = spark.createDataFrame(
            # nulls in a, range excursion in b, c collapsed to one value,
            # d is NEW, and b's dtype changes to string
            [(i if i % 4 else None, str(float(i * 10)), "only", 1) for i in range(100)],
            "a long, b string, c string, d long",
        )
        d = {
            r.column: r
            for r in profile_drift(
                profile_table(cur_df), profile_table(ref_df)
            ).collect()
        }
        assert d["a"].null_ppm_ref == 0 and d["a"].null_ppm_cur == 250000
        assert d["a"].null_ppm_delta == 250000
        assert d["b"].dtype_changed and d["b"].max_changed
        assert d["c"].distinct_delta == 1 - 1 or d["c"].distinct_cur == 1
        assert d["d"].n_ref is None and d["d"].dtype_changed  # new column
        assert not d["a"].dtype_changed

    def test_identical_profiles_are_quiet(self, spark):
        from cassandra_diff_spark.operators.validate import (
            profile_drift,
            profile_table,
        )

        df = spark.createDataFrame([(i, "s") for i in range(50)], "a long, c string")
        p = profile_table(df)
        out = profile_drift(p, p).collect()
        for r in out:
            assert not r.dtype_changed and not r.min_changed and not r.max_changed
            assert r.null_ppm_delta == 0 and r.distinct_delta == 0
