"""BM25 keyword search: operators/search.py."""

import math

import pytest
from pyspark.sql import functions as F

from cassandra_diff_spark.operators import search


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestBM25:
    def test_hand_computed_score(self, spark):
        # corpus: 3 docs, query term 'cat' in doc 1 (tf=2, dl=4) and
        # doc 2 (tf=1, dl=2); N=3, df=2, avgdl=3
        df = _docs(
            spark,
            [(1, "cat cat dog fish"), (2, "cat bird"), (3, "dog fish emu")],
        )
        out = {r.doc_id: r.score_u for r in
               search.bm25_topk(df, "doc_id", "text", ["cat"], top_k=10).collect()}
        k1, b = 1.2, 0.75
        idf = math.log(1.0 + (3 - 2 + 0.5) / (2 + 0.5))

        def w(tf, dl):
            return round(idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * dl / 3.0))
                         * search.SCORE_SCALE)

        assert out == {1: w(2, 4), 2: w(1, 2)}

    def test_rarer_term_outranks(self, spark):
        # doc 1 hits the rare term, doc 2 the common one; equal tf/dl
        rows = [(1, "rare pad"), (2, "common pad")]
        rows += [(10 + i, "common filler") for i in range(8)]
        df = _docs(spark, rows)
        out = search.bm25_topk(df, "doc_id", "text", ["rare", "common"], top_k=2).collect()
        assert out[0].doc_id == 1  # idf(rare) > idf(common)

    def test_topk_cutoff_deterministic_on_ties(self, spark):
        # 5 identical docs tie exactly -> cutoff picks lowest ids
        df = _docs(spark, [(i, "term pad pad") for i in range(5)])
        out = search.bm25_topk(df, "doc_id", "text", ["term"], top_k=3).collect()
        assert [r.doc_id for r in out] == [0, 1, 2]

    def test_no_hits_empty(self, spark):
        df = _docs(spark, [(1, "a b c")])
        assert search.bm25_topk(df, "doc_id", "text", ["zz"], top_k=5).count() == 0

    def test_broadcast_in_plan(self, spark):
        df = _docs(spark, [(1, "a b"), (2, "b c")])
        plan = (
            search.bm25_topk(df, "doc_id", "text", ["b"], top_k=5)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastExchange" in plan


class TestRRF:
    def test_fusion_math_and_cutoff(self, spark):
        from cassandra_diff_spark.operators.search import rrf_fuse

        r1 = spark.createDataFrame(
            [(1, 1), (2, 2), (3, 3)], "id long, rank long"
        )
        r2 = spark.createDataFrame(
            [(3, 1), (1, 2), (4, 3)], "id long, rank long"
        )
        out = {r.id: r for r in rrf_fuse([r1, r2], "id", k=60, top_k=3).collect()}
        # doc 1: 1e6//61 + 1e6//62 ; doc 3: 1e6//63 + 1e6//61
        assert out[1].rrf_u == 1_000_000 // 61 + 1_000_000 // 62
        assert out[3].rrf_u == 1_000_000 // 63 + 1_000_000 // 61
        assert out[1].n_lists == 2 and out[3].n_lists == 2
        # top_k=3 keeps the two double-hitters + best single
        assert set(out) == {1, 3, 2}

    def test_single_list_and_validation(self, spark):
        from cassandra_diff_spark.operators.search import rrf_fuse, with_rank

        base = spark.createDataFrame([(7, 5), (8, 1)], "id long, v long")
        ranked = with_rank(base, "id", [F.col("v").desc(), F.col("id")])
        got = {r.id: r.rank for r in ranked.collect()}
        assert got == {7: 1, 8: 2}
        out = rrf_fuse([ranked], "id", top_k=1).collect()
        assert out[0].id == 7
        with pytest.raises(ValueError, match="at least one"):
            rrf_fuse([], "id")
