"""Round-12 tests: the spearman rank-map join's size-adaptive
broadcast decision (guide §3.1) — both branches must produce
bit-identical correlations, and the knob must actually control the
join strategy."""

from __future__ import annotations

from cassandra_diff_spark import operators


class TestSpearmanSizeAdaptiveJoin:
    """`spearman_correlations` broadcasts each value->rank map when the
    measured distinct count bounds it under `broadcast_rank_map_bytes`
    (the r12 fix for Catalyst's garbage post-aggregation size estimate)
    and falls back to a shuffle join above — the branch a
    billion-distinct column takes at 100 TB, which fixture-scale gates
    never exercise. Ranks are exact on both paths, so the outputs must
    agree to the bit."""

    N = 10_000  # x all-distinct > 2 * _RANK_BUCKET_ROWS: bucketed path on

    def _frame(self, spark):
        rows = [
            (float(i) / 7.0, float(i // 3), float(i % 7)) for i in range(self.N)
        ]
        return spark.createDataFrame(rows, "x double, y double, z double")

    @staticmethod
    def _rows(df):
        return sorted(
            (r["col_i"], r["col_j"], r["n"], r["rho"]) for r in df.collect()
        )

    def test_shuffle_branch_bit_identical_to_broadcast(self, spark):
        from cassandra_diff_spark.operators.validate import spearman_correlations

        df = self._frame(spark)
        try:
            got_b = self._rows(spearman_correlations(df, ["x", "y", "z"]))
            got_s = self._rows(
                spearman_correlations(
                    df, ["x", "y", "z"], broadcast_rank_map_bytes=0
                )
            )
        finally:
            operators.release_caches()
        # exact tuple equality: same pairs, same n, same rho BITS —
        # the join strategy must never touch the exact rank machinery
        assert got_b == got_s
        assert len(got_b) == 6  # 3 columns -> i <= j pairs

    def test_knob_controls_join_strategy(self, spark):
        """The parameter's entire job is placing (or withholding) the
        broadcast hint on the rank maps: with the default cap the
        spearman plan carries no SortMergeJoin (the r12 plan claim,
        plans/r12/profile_spearman_after.txt); with the cap at 0 the
        rank-map join-backs plan as SortMergeJoin again."""
        from cassandra_diff_spark.operators.validate import spearman_correlations

        df = self._frame(spark)
        try:
            plan_b = (
                spearman_correlations(df, ["x", "y"])
                ._jdf.queryExecution().executedPlan().toString()
            )
            plan_s = (
                spearman_correlations(df, ["x", "y"], broadcast_rank_map_bytes=0)
                ._jdf.queryExecution().executedPlan().toString()
            )
        finally:
            operators.release_caches()
        assert "SortMergeJoin" not in plan_b
        assert "SortMergeJoin" in plan_s
