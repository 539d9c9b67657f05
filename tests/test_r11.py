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


class TestBpeRoundTrip:
    """decode(encode(x)) == whitespace-normalized x — the tokenizer
    round-trip a training pipeline verifies before shipping."""

    DOCS = [
        (0, "the cat sat on the mat"),
        (1, "  leading  and   trailing  whitespace   "),
        (2, ""),            # empty -> decodes to ''
        (3, "   \t \n "),   # whitespace-only -> ''
        (4, None),          # dropped by encode (text IS NULL)
        (5, "one"),
        (6, "répé tition répé tition unicode-ok ✓"),
        (7, "a\x01b keep\x02 also\x03bad fine"),  # marker words dropped
        (8, "the the the cat cat dog"),
    ]

    def _norm(self, t):
        import re as _re

        ws = [w for w in _re.split(r"\s+", t.strip()) if w]
        return " ".join(
            w for w in ws if not any(c in w for c in "\x01\x02\x03")
        )

    def test_roundtrip_equals_normalized(self, spark):
        from cassandra_diff_spark.operators.vocab import (
            bpe_decode_documents,
            bpe_encode_documents,
            bpe_train,
        )

        df = spark.createDataFrame(self.DOCS, "doc_id long, text string")
        merges = bpe_train(df, "text", 6)
        assert merges, "expected at least one merge on this corpus"
        enc = bpe_encode_documents(df, "doc_id", "text", merges)
        got = {
            r["id"]: r["text"]
            for r in bpe_decode_documents(enc, "id", "tokens").collect()
        }
        want = {
            i: self._norm(t) for i, t in self.DOCS if t is not None
        }
        assert got == want

    def test_roundtrip_with_zero_merges(self, spark):
        """Character-level encoding (no merges) must still decode."""
        from cassandra_diff_spark.operators.vocab import (
            bpe_decode_documents,
            bpe_encode_documents,
        )

        df = spark.createDataFrame(
            [(0, "ab ba"), (1, "xyz")], "doc_id long, text string"
        )
        enc = bpe_encode_documents(df, "doc_id", "text", [])
        got = {
            r["id"]: r["text"]
            for r in bpe_decode_documents(enc, "id", "tokens").collect()
        }
        assert got == {0: "ab ba", 1: "xyz"}


class TestBatchedDistributedBpe:
    """The r11 batched distributed loop must be byte-identical to the
    sequential single-merge loop across every dispatch boundary:
    batch_pairs=0 (forced single-merge), tiny batch_word_cap (every
    batch falls back), tiny batch_pairs (frequent flushes where created
    pairs become argmax), and the driver-local reference."""

    TEXTS = [
        "aaab aaab aaab banana banana bandana",
        "low lower lowest newer newest wide wider widest",
        "aa aa aa ab ab ba baa aab aaa",
        "the cat the hat the bat that mat",
        "xy xyz xyxy zyx zyxzyx",
    ] * 3

    @pytest.fixture(scope="class")
    def corpus(self, spark):
        return spark.createDataFrame(
            [(t,) for t in self.TEXTS], "text string"
        )

    def _strip(self, merges):
        return [m[:5] for m in merges]

    def test_all_dispatches_agree(self, spark, corpus):
        from cassandra_diff_spark.operators.vocab import bpe_train_incremental

        local = bpe_train_incremental(corpus, "text", 24)
        batched = bpe_train_incremental(
            corpus, "text", 24, driver_word_cap=0
        )
        single = bpe_train_incremental(
            corpus, "text", 24, driver_word_cap=0, batch_pairs=0
        )
        fallback = bpe_train_incremental(
            corpus, "text", 24, driver_word_cap=0, batch_word_cap=1
        )
        tiny_batches = bpe_train_incremental(
            corpus, "text", 24, driver_word_cap=0, batch_pairs=2,
            checkpoint_every=3,
        )
        assert self._strip(batched) == self._strip(local)
        assert self._strip(single) == self._strip(local)
        assert self._strip(fallback) == self._strip(local)
        assert self._strip(tiny_batches) == self._strip(local)

    def test_min_count_stop_in_batch(self, spark, corpus):
        from cassandra_diff_spark.operators.vocab import bpe_train_incremental

        local = bpe_train_incremental(corpus, "text", 64, min_count=5)
        batched = bpe_train_incremental(
            corpus, "text", 64, min_count=5, driver_word_cap=0
        )
        assert self._strip(batched) == self._strip(local)

    def test_checkpoint_fires_inside_batch_flush(self, spark, corpus):
        """Self-review finding (r11): a batch can run hundreds of
        merges, and chaining every replace before one checkpoint nests
        F.replace past what checkpoint_every exists to bound — the
        check must fire INSIDE the flush loop. NOTE: pyspark 4 session
        frames are pyspark.sql.classic.dataframe.DataFrame; patching
        pyspark.sql.DataFrame intercepts nothing."""
        from pyspark.sql.classic.dataframe import DataFrame as CDF

        from cassandra_diff_spark.operators.vocab import bpe_train_incremental

        calls = {"cp": 0}
        orig = CDF.localCheckpoint

        def spy(self_, *a, **k):
            calls["cp"] += 1
            return orig(self_, *a, **k)

        CDF.localCheckpoint = spy
        try:
            out = bpe_train_incremental(
                corpus, "text", 12, checkpoint_every=2, driver_word_cap=0
            )
        finally:
            CDF.localCheckpoint = orig
        assert len(out) == 12
        assert calls["cp"] >= len(out) // 2 - 1, (
            f"only {calls['cp']} checkpoints for {len(out)} merges at "
            "cadence 2 — the flush is chaining replaces unbounded"
        )

    def test_merge_frame_roundtrip(self, spark, corpus):
        """Tokenizer-artifact persistence: the merge list survives the
        (merge_rank, left_sym, right_sym, merged, pair_count) frame —
        the exchange format the vocab_bpe_train gate already emits."""
        from cassandra_diff_spark.operators.vocab import (
            bpe_encode_documents,
            bpe_merges_from_frame,
            bpe_merges_to_frame,
            bpe_train_incremental,
        )

        merges = bpe_train_incremental(corpus, "text", 10)
        frame = bpe_merges_to_frame(spark, merges)
        back = bpe_merges_from_frame(frame)
        assert back == [tuple(m) for m in merges]
        a = bpe_encode_documents(corpus, "text", "text", merges)
        b = bpe_encode_documents(corpus, "text", "text", back)
        assert sorted(map(tuple, a.collect())) == sorted(
            map(tuple, b.collect())
        )

    def test_stats_sampling_shape(self, spark, corpus):
        from cassandra_diff_spark.operators.vocab import bpe_train_incremental

        s: list = []
        out = bpe_train_incremental(
            corpus, "text", 12, driver_word_cap=0, stats=s, stats_every=4
        )
        ranks = [t[0] for t in s]
        assert ranks == [r for r in range(1, len(out) + 1)
                         if r == 1 or r % 4 == 0]
        assert all(len(t) == 4 and t[1] >= 1 for t in s)


class TestBpeEncodeUdf:
    """bpe_encode_documents_udf must be value-indistinguishable from
    the expression path on adversarial fixtures AND at merge counts the
    expression path handles — its whole reason to exist is the merge
    counts the expression path cannot."""

    def test_matches_expression_path_adversarial(self, spark):
        from cassandra_diff_spark.operators.vocab import (
            bpe_encode_documents,
            bpe_encode_documents_udf,
            bpe_train,
        )

        docs = TestBpeRoundTrip.DOCS + [
            (9, "nbsp joined stays one-word"),  # unicode ws: NOT \s
            (10, "tab\tsplit v\x0bsplit"),
        ]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        merges = bpe_train(df, "text", 6)
        a = sorted(
            (r["id"], tuple(r["tokens"]), r["n_tokens"])
            for r in bpe_encode_documents(df, "doc_id", "text", merges).collect()
        )
        b = sorted(
            (r["id"], tuple(r["tokens"]), r["n_tokens"])
            for r in bpe_encode_documents_udf(
                df, "doc_id", "text", merges
            ).collect()
        )
        assert a == b

    def test_greedy_kernel_equals_rank_order_replay(self, spark):
        """The fast greedy kernel (lowest-rank pair first, merge-count-
        independent) must equal the rank-order full-replay semantics on
        every word — including overlap chains like 'aaa' and merges
        whose outputs feed later merges."""
        from cassandra_diff_spark.operators.vocab import (
            _bpe_encode_word_fast,
            _bpe_encode_word_py,
            bpe_train_incremental,
        )

        df = spark.createDataFrame(
            [(t,) for t in TestBatchedDistributedBpe.TEXTS]
            + [("aaaa aaa aaaaa banana bandana",)] * 4,
            "text string",
        )
        merges = bpe_train_incremental(df, "text", 48)
        rank_of = {(m[1], m[2]): m[0] for m in merges}
        words = set()
        for (t,) in df.collect():
            words.update(t.split())
        words.update(
            ["a", "aa", "aaaa", "aaaaaaa", "xyzzy", "", "banana",
             "nanana", "bandanana", "zzz"]
        )
        for w in sorted(words):
            if not w:
                continue
            assert _bpe_encode_word_fast(w, rank_of) == \
                _bpe_encode_word_py(w, merges), f"diverged on {w!r}"

    def test_greedy_kernel_property(self, spark):
        """Hypothesis sweep of greedy == rank-order replay: random
        corpora over a tiny alphabet (maximal pair collisions and
        overlap runs), random merge counts, then encode WORDS THE
        TRAINER NEVER SAW — including characters absent from training
        (no applicable merge on either path)."""
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from cassandra_diff_spark.operators.vocab import (
            _bpe_encode_word_fast,
            _bpe_encode_word_py,
            bpe_train_incremental,
        )

        word = st.text(alphabet="abc", min_size=1, max_size=8)

        @settings(max_examples=15, deadline=None)
        @given(
            corpus=st.lists(
                st.lists(word, min_size=1, max_size=6).map(" ".join),
                min_size=1,
                max_size=8,
            ),
            n_merges=st.integers(min_value=1, max_value=12),
            probes=st.lists(
                st.text(alphabet="abcxyz", min_size=0, max_size=10),
                max_size=8,
            ),
        )
        def check(corpus, n_merges, probes):
            df = spark.createDataFrame([(t,) for t in corpus], "text string")
            merges = bpe_train_incremental(df, "text", n_merges)
            rank_of = {(m[1], m[2]): m[0] for m in merges}
            for w in {w for t in corpus for w in t.split()} | set(probes):
                if not w:
                    continue
                assert _bpe_encode_word_fast(w, rank_of) == \
                    _bpe_encode_word_py(w, merges), (w, merges)

        check()

    def test_matches_at_larger_merge_count(self, spark):
        from cassandra_diff_spark.operators.vocab import (
            bpe_encode_documents,
            bpe_encode_documents_udf,
            bpe_train_incremental,
        )

        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(TestBatchedDistributedBpe.TEXTS)],
            "doc_id long, text string",
        )
        merges = bpe_train_incremental(df, "text", 40)
        a = sorted(
            map(tuple, bpe_encode_documents(df, "doc_id", "text", merges)
                .select("id", "n_tokens").collect())
        )
        b = sorted(
            map(tuple, bpe_encode_documents_udf(df, "doc_id", "text", merges)
                .select("id", "n_tokens").collect())
        )
        assert a == b
        assert len(a) == len(TestBatchedDistributedBpe.TEXTS)


class TestClassifierBakeoff:
    def test_classifier_bakeoff_composition(self, spark):
        """Pytest replica of the pipeline_classifier_bakeoff gate: on a
        tiny planted-separable corpus, train -> score held-out -> exact
        AUC == 1.0 and the reliability diagram separates its edge bins."""
        from cassandra_diff_spark.operators.curate import (
            classifier_score,
            classifier_train,
        )
        from cassandra_diff_spark.operators.evaluate import (
            auc_exact,
            calibration_bins,
        )

        rows = [
            (
                i,
                i % 2,
                ("good solid prose qpos" if i % 2 else "junk spam qneg")
                + f" filler{i % 7} filler{i % 5}",
                i % 5 == 0,  # not %4/%2: the split must hit BOTH labels
            )
            for i in range(200)
        ]
        lab = spark.createDataFrame(
            rows, "doc_id long, y long, t2 string, is_test boolean"
        )
        try:
            model = classifier_train(
                lab.filter(~F.col("is_test")), "doc_id", "t2", "y",
                n_buckets=1024, iters=12, lr_milli=4_000,
            )
            test = lab.filter(F.col("is_test"))
            sc = classifier_score(
                test, "doc_id", "t2", model, n_buckets=1024
            ).withColumnRenamed("id", "doc_id")
            j = sc.join(test.select("doc_id", "y"), "doc_id")
            auc = auc_exact(j, "logit_u", "y").collect()[0]
            assert auc["auc_ppm"] == 1_000_000
            cal = calibration_bins(
                j.select("logit_u", (F.col("y") == 1).alias("l")),
                "logit_u", "l", n_bins=8, lo=-40_000, hi=40_000,
            ).collect()
            by_bin = {r["bin"]: r["pos_per_mille"] for r in cal}
            assert by_bin[min(by_bin)] == 0
            assert by_bin[max(by_bin)] == 1000
        finally:
            operators.release_caches()
