"""Exact substring (duplicate-span) dedup: operators/spans.py."""

from pyspark.sql import functions as F

from cassandra_diff_spark.operators import spans


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestDuplicateSpans:
    def test_cross_doc_duplicate_detected_and_merged(self, spark):
        # docs 1 and 2 share a 10-token run -> one maximal span each (k=8:
        # three overlapping hit positions 0,1,2 merge into [0, 10)).
        shared = " ".join(f"w{i}" for i in range(10))
        df = _docs(
            spark,
            [(1, shared + " tail1 only1"), (2, shared + " tail2 only2")],
        )
        out = spans.duplicate_spans(df, "doc_id", "text", k=8)
        got = {(r.doc_id, r.span_start, r.span_end, r.span_tokens) for r in out.collect()}
        assert got == {(1, 0, 10, 10), (2, 0, 10, 10)}

    def test_within_doc_repetition_counts(self, spark):
        # the same 8 tokens twice inside ONE document is a duplicate too
        run = " ".join(f"t{i}" for i in range(8))
        df = _docs(spark, [(1, run + " mid " + run)])
        out = spans.duplicate_spans(df, "doc_id", "text", k=8).collect()
        assert {(r.span_start, r.span_end) for r in out} == {(0, 8), (9, 17)}

    def test_short_docs_and_uniques_produce_nothing(self, spark):
        df = _docs(spark, [(1, "a b c"), (2, "unique tokens here nothing shared x y z")])
        assert spans.duplicate_spans(df, "doc_id", "text", k=8).count() == 0

    def test_gap_larger_than_k_splits_spans(self, spark):
        run1 = " ".join(f"a{i}" for i in range(8))
        run2 = " ".join(f"b{i}" for i in range(8))
        gap = " ".join(f"u{j}" for j in range(9))  # gap > k between hits
        df = _docs(
            spark,
            [(1, run1 + " " + gap + " " + run2), (2, run1), (3, run2)],
        )
        out = spans.duplicate_spans(df, "doc_id", "text", k=8)
        doc1 = sorted(
            (r.span_start, r.span_end) for r in out.filter("doc_id = 1").collect()
        )
        assert doc1 == [(0, 8), (17, 25)]


class TestRemoveDuplicateSpans:
    def test_canonical_occurrence_survives(self, spark):
        shared = " ".join(f"w{i}" for i in range(8))
        df = _docs(spark, [(1, shared + " tail"), (2, shared + " other")])
        out = {r.doc_id: r for r in
               spans.remove_duplicate_spans(df, "doc_id", "text", k=8).collect()}
        # doc 1 holds the least (doc_id, pos) -> untouched
        assert out[1].text_clean == shared + " tail"
        assert out[1].n_tokens == 9 and out[1].n_tokens_clean == 9
        # doc 2's copy is cut; the unshared tail survives
        assert out[2].text_clean == "other"
        assert out[2].n_tokens == 9 and out[2].n_tokens_clean == 1

    def test_fully_covered_doc_becomes_empty(self, spark):
        shared = " ".join(f"w{i}" for i in range(8))
        df = _docs(spark, [(1, shared + " x"), (2, shared)])
        out = {r.doc_id: r for r in
               spans.remove_duplicate_spans(df, "doc_id", "text", k=8).collect()}
        assert out[2].text_clean == "" and out[2].n_tokens_clean == 0

    def test_untouched_corpus_roundtrips(self, spark):
        df = _docs(spark, [(1, "all these tokens appear exactly once in corpus")])
        out = spans.remove_duplicate_spans(df, "doc_id", "text", k=8).collect()[0]
        assert out.text_clean == "all these tokens appear exactly once in corpus"

    def test_within_doc_second_copy_removed(self, spark):
        run = " ".join(f"t{i}" for i in range(8))
        df = _docs(spark, [(1, run + " mid " + run)])
        out = spans.remove_duplicate_spans(df, "doc_id", "text", k=8).collect()[0]
        assert out.text_clean == run + " mid"
        assert out.n_tokens == 17 and out.n_tokens_clean == 9


class TestPlanShape:
    def test_gram_inventory_is_map_only(self, spark):
        df = _docs(spark, [(1, "a b c d e f g h i")])
        plan = (
            spans.gram_occurrences(df, "doc_id", "text", k=8)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan
