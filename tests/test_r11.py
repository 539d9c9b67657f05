"""Round-11 tests: prefix-sum vocab id assignment (plan invariant +
equivalence to the global row_number), sparse classifier gradients at
large d, BPE decode round-trip, batched distributed BPE."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from cassandra_diff_spark import operators


def _window_specs(df):
    plan = df._jdf.queryExecution().executedPlan().toString()
    return set(re.findall(r"windowspecdefinition\([^)]*\)", plan))


class TestVocabPrefixSumRanking:
    """vocab_from_counts' id assignment decomposes the global
    (n DESC, token ASC) row number into a _running_below prefix sum plus
    a per-n-group partitioned row_number — same ids, no unpartitioned
    WindowExec (the r9/r10 spearman invariant extended to vocab)."""

    N = 10_000  # > 2 * _RANK_BUCKET_ROWS distinct counts => bucketed path

    def _counts(self, spark):
        # every token has a DISTINCT count (the continuous regime that
        # forces split points), plus a tie block sharing one count so
        # the in-group tie-break is exercised in the same call
        base = spark.range(self.N).select(
            F.concat(F.lit("t"), F.col("id").cast("string")).alias("token"),
            (F.col("id") + 10).alias("n"),
        )
        ties = spark.range(5).select(
            F.concat(F.lit("tie"), F.col("id").cast("string")).alias("token"),
            F.lit(7).cast("long").alias("n"),
        )
        return base.unionByName(ties)

    def test_matches_global_row_number(self, spark):
        from cassandra_diff_spark.operators.vocab import vocab_from_counts

        counts = self._counts(spark)
        try:
            got = {
                r["token"]: r["token_id"]
                for r in vocab_from_counts(
                    counts, vocab_size=self.N + 5, first_id=1
                ).collect()
            }
        finally:
            operators.release_caches()
        rows = counts.collect()
        want = {
            r["token"]: i + 1
            for i, r in enumerate(
                sorted(rows, key=lambda r: (-r["n"], r["token"]))
            )
        }
        assert got == want

    def test_top_v_cut_and_first_id(self, spark):
        from cassandra_diff_spark.operators.vocab import vocab_from_counts

        counts = self._counts(spark)
        try:
            out = vocab_from_counts(
                counts, vocab_size=3, min_count=1, first_id=5
            ).collect()
        finally:
            operators.release_caches()
        got = sorted((r["token_id"], r["token"]) for r in out)
        # top-3 by n desc: t9999 (n=10009), t9998, t9997
        assert got == [(5, "t9999"), (6, "t9998"), (7, "t9997")]

    def test_no_unpartitioned_window_in_plan(self, spark):
        from cassandra_diff_spark.operators.vocab import vocab_from_counts

        counts = self._counts(spark)
        try:
            out = vocab_from_counts(counts, vocab_size=self.N + 5)
            specs = _window_specs(out)
        finally:
            operators.release_caches()
        assert specs, "expected window operators in the vocab plan"
        for s in specs:
            first = s[len("windowspecdefinition("):].split(",")[0]
            assert " ASC" not in first and " DESC" not in first, (
                f"unpartitioned window spec in vocab plan: {s}"
            )

    def test_bucketed_path_engaged(self, spark):
        """Split points must exist for the distinct-count frame, else
        the plan test is vacuous (everything in one bucket)."""
        from cassandra_diff_spark.operators.validate import _split_points

        counts = self._counts(spark)
        pts = _split_points(
            counts.select((-F.col("n")).alias("__v")), ["__v"]
        )
        assert pts["__v"]["splits"], "expected split points at 10k distinct"
