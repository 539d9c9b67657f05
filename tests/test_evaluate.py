"""Evaluation operators (operators/evaluate.py): hand-computed
references for pair P/R/F1, retrieval recall@k/MRR, Cohen's kappa, and
majority-vote label aggregation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cassandra_diff_spark.operators.evaluate import (
    cohen_kappa,
    majority_label,
    pair_metrics,
    retrieval_metrics,
)


class TestPairMetrics:
    def test_hand_computed(self, spark):
        pred = spark.createDataFrame(
            [(1, 2), (3, 4), (5, 6)], "id_1 long, id_2 long"
        )
        truth = spark.createDataFrame(
            [(1, 2), (3, 4), (7, 8)], "id_1 long, id_2 long"
        )
        r = pair_metrics(pred, truth).collect()[0]
        assert (r.tp, r.fp, r.fn) == (2, 1, 1)
        assert (r.precision_milli, r.recall_milli, r.f1_milli) == (666, 666, 666)

    def test_orientation_duplicates_and_self_pairs_normalize(self, spark):
        # (2,1) == (1,2); duplicates collapse; self-pairs dropped
        pred = spark.createDataFrame(
            [(2, 1), (1, 2), (9, 9), (3, 4)], "id_1 long, id_2 long"
        )
        truth = spark.createDataFrame([(1, 2)], "id_1 long, id_2 long")
        r = pair_metrics(pred, truth).collect()[0]
        assert (r.n_pred, r.n_truth, r.tp, r.fp, r.fn) == (2, 1, 1, 1, 0)
        assert r.recall_milli == 1000

    def test_empty_sides_yield_null_ratios(self, spark):
        empty = spark.createDataFrame([], "id_1 long, id_2 long")
        truth = spark.createDataFrame([(1, 2)], "id_1 long, id_2 long")
        r = pair_metrics(empty, truth).collect()[0]
        assert r.tp == 0 and r.fn == 1
        assert r.precision_milli is None and r.recall_milli == 0


class TestRetrievalMetrics:
    def test_hand_computed(self, spark):
        pred = spark.createDataFrame(
            [(1, 10, 1), (1, 11, 2), (1, 12, 3)],
            "query_id long, neighbor_id long, rank long",
        )
        truth = spark.createDataFrame(
            [(1, 11), (1, 13), (2, 20)], "query_id long, neighbor_id long"
        )
        r = retrieval_metrics(pred, truth, k=2).collect()[0]
        # q1: hit 11 at rank 2 of rel 2 -> recall 500, rr 500000
        # q2: nothing retrieved -> recall 0, rr 0
        assert (r.n_queries, r.sum_hits, r.sum_relevant) == (2, 1, 3)
        assert r.micro_recall_milli == 333
        assert r.macro_recall_milli == 250
        assert r.mrr_micro == 250000

    def test_k_cutoff_excludes_deep_hits(self, spark):
        pred = spark.createDataFrame(
            [(1, 10, 1), (1, 11, 5)],
            "query_id long, neighbor_id long, rank long",
        )
        truth = spark.createDataFrame(
            [(1, 11)], "query_id long, neighbor_id long"
        )
        r3 = retrieval_metrics(pred, truth, k=3).collect()[0]
        r5 = retrieval_metrics(pred, truth, k=5).collect()[0]
        assert r3.sum_hits == 0 and r3.mrr_micro == 0
        assert r5.sum_hits == 1 and r5.mrr_micro == 200000

    def test_perfect_retrieval(self, spark):
        pred = spark.createDataFrame(
            [(1, 10, 1), (2, 20, 1)],
            "query_id long, neighbor_id long, rank long",
        )
        truth = spark.createDataFrame(
            [(1, 10), (2, 20)], "query_id long, neighbor_id long"
        )
        r = retrieval_metrics(pred, truth, k=1).collect()[0]
        assert r.micro_recall_milli == 1000
        assert r.macro_recall_milli == 1000
        assert r.mrr_micro == 1000000


class TestCohenKappa:
    def test_hand_computed(self, spark):
        # counts: (x,x)=4 (x,y)=2 (y,x)=1 (y,y)=3 -> n=10 agree=7
        # ca = {x:6, y:4}, cb = {x:5, y:5}, S = 30+20 = 50
        # po=0.7 pe=0.5 kappa = 0.4
        rows = (
            [("x", "x")] * 4 + [("x", "y")] * 2 + [("y", "x")] + [("y", "y")] * 3
        )
        df = spark.createDataFrame(rows, "a string, b string")
        r = cohen_kappa(df, "a", "b").collect()[0]
        assert (r.n_items, r.n_agree, r.po_milli) == (10, 7, 700)
        assert r.pe_micro == 500000
        assert r.kappa_micro == 400000

    def test_null_is_a_category(self, spark):
        # both-null agrees; one-null disagrees
        df = spark.createDataFrame(
            [(None, None), ("x", None), ("x", "x"), (None, "x")],
            "a string, b string",
        )
        r = cohen_kappa(df, "a", "b").collect()[0]
        assert r.n_agree == 2
        # marginals: a {null:2, x:2}, b {null:2, x:2} -> S = 4+4 = 8
        # kappa = (2*4 - 8) / (16 - 8) = 0
        assert r.kappa_micro == 0

    def test_constant_raters_yield_null(self, spark):
        df = spark.createDataFrame(
            [("x", "x"), ("x", "x")], "a string, b string"
        )
        r = cohen_kappa(df, "a", "b").collect()[0]
        assert r.po_milli == 1000 and r.kappa_micro is None

    def test_perfect_agreement_with_varied_labels(self, spark):
        df = spark.createDataFrame(
            [("x", "x"), ("y", "y"), ("z", "z")], "a string, b string"
        )
        r = cohen_kappa(df, "a", "b").collect()[0]
        assert r.kappa_micro == 1000000

    def test_label_used_by_one_rater_still_feeds_pe(self, spark):
        # rater b never says 'z'; rater a's z-marginal must still meet
        # b's zero -> contributes 0, but b-only labels contribute too
        df = spark.createDataFrame(
            [("x", "x"), ("z", "x"), ("x", "w"), ("x", "x")],
            "a string, b string",
        )
        r = cohen_kappa(df, "a", "b").collect()[0]
        # n=4 agree=2; ca={x:3,z:1} cb={x:3,w:1}; S = 3*3 = 9
        # kappa = (8-9)/(16-9) = -1/7 -> -142857
        assert r.n_agree == 2
        assert r.kappa_micro == -142857

    def test_kappa_below_zero_rounding(self, spark):
        # worse-than-chance agreement rounds HALF-consistently in both
        # engines (double round discipline) — value checked exactly
        df = spark.createDataFrame(
            [("x", "y"), ("y", "x")], "a string, b string"
        )
        r = cohen_kappa(df, "a", "b").collect()[0]
        # n=2 agree=0; S = 1*1 + 1*1 = 2; kappa = (0-2)/(4-2) = -1
        assert r.kappa_micro == -1000000


class TestMajorityLabel:
    def test_majority_and_agreement(self, spark):
        df = spark.createDataFrame(
            [(1, "a"), (1, "a"), (1, "b"), (2, "c")],
            "item long, label string",
        )
        got = {r.item: r for r in majority_label(df, "item", "label").collect()}
        assert got[1].label == "a" and got[1].n_votes == 2
        assert got[1].n_total == 3 and got[1].agreement_milli == 666
        assert got[2].label == "c" and got[2].agreement_milli == 1000

    def test_tie_breaks_to_smallest_label(self, spark):
        df = spark.createDataFrame(
            [(1, "b"), (1, "a")], "item long, label string"
        )
        r = majority_label(df, "item", "label").collect()[0]
        assert r.label == "a" and r.n_votes == 1

    def test_null_votes_count_but_lose_ties(self, spark):
        df = spark.createDataFrame(
            [(1, None), (1, None), (1, "a"), (2, None), (2, "a"), (3, None)],
            "item long, label string",
        )
        got = {r.item: r for r in majority_label(df, "item", "label").collect()}
        assert got[1].label is None and got[1].n_votes == 2  # real majority
        assert got[2].label == "a"  # tie -> null loses
        assert got[3].label is None and got[3].agreement_milli == 1000


class TestCompositions:
    def test_pair_metrics_scores_lsh_against_exact(self, spark, sf_dir):
        """The intended workflow: tune LSH by scoring its pair frame
        against exact Jaccard truth on a labeled sample."""
        from cassandra_diff_spark.operators.dedup import (
            minhash_lsh_pairs,
            ngram_jaccard_pairs,
        )

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(200)
        # inject five exact near-dups (one-word prefix drop)
        dup = docs.limit(5).select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"),
            F.expr(
                "array_join(slice(split(text, ' '), 2, 100000), ' ')"
            ).alias("text"),
        )
        corpus = docs.select("doc_id", "text").unionByName(dup)
        pred = minhash_lsh_pairs(corpus, "doc_id", "text").select("id_1", "id_2")
        truth = ngram_jaccard_pairs(
            corpus, "doc_id", "text", threshold_num=4, threshold_den=5
        ).select("id_1", "id_2")
        from cassandra_diff_spark.operators.evaluate import pair_metrics

        r = pair_metrics(pred, truth).collect()[0]
        # every injected pair is >= 0.8 Jaccard; LSH must recall them all
        assert r.n_truth >= 5
        assert r.recall_milli == 1000

    def test_retrieval_metrics_matches_probe_style_recall(self, spark, sf_dir):
        """recall@k from the operator equals the hand-rolled set math
        the scale probe does."""
        from cassandra_diff_spark.operators.evaluate import retrieval_metrics
        from cassandra_diff_spark.operators.similarity import (
            brute_force_topk,
            hyperplane_lsh_topk,
        )

        embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        qs = embs.filter(F.col("vec_id") < 5)
        pred = hyperplane_lsh_topk(embs, qs, "vec_id", "embedding", k=5)
        truth = brute_force_topk(embs, qs, "vec_id", "embedding", k=1).select(
            "query_id", "neighbor_id"
        )
        r = retrieval_metrics(pred, truth, k=5).collect()[0]
        hits = {
            (x.query_id, x.neighbor_id)
            for x in pred.filter(F.col("rank") <= 5).collect()
        }
        want = [(x.query_id, x.neighbor_id) in hits for x in truth.collect()]
        assert r.sum_hits == sum(want)
        assert r.n_queries == len(want)


class TestClassMetrics:
    def _df(self, spark):
        # truth x: 3 rows (2 right), y: 2 rows (1 right, 1 -> z)
        # z never true but predicted once; one (null, x) and one (y, null)
        return spark.createDataFrame(
            [
                ("x", "x"), ("x", "x"), ("x", "y"),
                ("y", "y"), ("y", "z"),
                (None, "x"), ("y", None),
            ],
            "t string, p string",
        )

    def test_confusion_cells(self, spark):
        from cassandra_diff_spark.operators.evaluate import confusion_matrix

        got = {
            (r.truth, r.pred): r.n
            for r in confusion_matrix(self._df(spark), "t", "p").collect()
        }
        assert got == {
            ("x", "x"): 2, ("x", "y"): 1, ("y", "y"): 1,
            ("y", "z"): 1, (None, "x"): 1, ("y", None): 1,
        }

    def test_per_class_values(self, spark):
        from cassandra_diff_spark.operators.evaluate import class_metrics

        got = {
            r.label: (r.tp, r.fp, r.fn, r.precision_milli, r.recall_milli)
            for r in class_metrics(self._df(spark), "t", "p").collect()
        }
        # x: tp 2, fp 1 (null->x), fn 1 (x->y): p=666 r=666
        assert got["x"] == (2, 1, 1, 666, 666)
        # y: tp 1, fp 1 (x->y), fn 2 (y->z, y->null): p=500 r=333
        assert got["y"] == (1, 1, 2, 500, 333)
        # z: never true -> recall NULL; predicted once wrong -> p=0
        assert got["z"] == (1 - 1, 1, 0, 0, None)
        # null as a label: true once (y->null pred), predicted once
        assert got[None] == (0, 1, 1, 0, 0)

    def test_perfect_classifier(self, spark):
        from cassandra_diff_spark.operators.evaluate import class_metrics

        df = spark.createDataFrame(
            [("a", "a"), ("b", "b"), ("b", "b")], "t string, p string"
        )
        rows = class_metrics(df, "t", "p").collect()
        assert all(
            r.precision_milli == 1000 and r.recall_milli == 1000
            and r.f1_milli == 1000
            for r in rows
        )


class TestNDCG:
    def test_hand_computed(self, spark):
        import math

        from cassandra_diff_spark.operators.evaluate import ndcg_at_k

        pred = spark.createDataFrame(
            [(1, 10, 1), (1, 11, 2), (1, 12, 3), (2, 20, 1)],
            "query_id long, neighbor_id long, rank long",
        )
        truth = spark.createDataFrame(
            [(1, 11, 3), (1, 12, 1), (1, 99, 2), (2, 21, 5)],
            "query_id long, neighbor_id long, gain long",
        )
        got = {r.query_id: r for r in ndcg_at_k(pred, truth, k=3).collect()}

        def term(gain, rank):
            return round(gain * 1e6 / math.log(rank + 1))

        # q1 dcg: 11 at rank 2 (gain 3) + 12 at rank 3 (gain 1)
        dcg1 = term(3, 2) + term(1, 3)
        # q1 ideal: gains 3,2,1 at ranks 1,2,3
        idcg1 = term(3, 1) + term(2, 2) + term(1, 3)
        assert got[1].dcg_micro == dcg1 and got[1].idcg_micro == idcg1
        assert got[1].ndcg_milli == (1000 * dcg1) // idcg1
        # q2 retrieved nothing relevant
        assert got[2].dcg_micro == 0 and got[2].ndcg_milli == 0

    def test_perfect_ranking_scores_1000(self, spark):
        from cassandra_diff_spark.operators.evaluate import ndcg_at_k

        pred = spark.createDataFrame(
            [(1, 10, 1), (1, 11, 2)],
            "query_id long, neighbor_id long, rank long",
        )
        truth = spark.createDataFrame(
            [(1, 10, 5), (1, 11, 2)],
            "query_id long, neighbor_id long, gain long",
        )
        r = ndcg_at_k(pred, truth, k=2).collect()[0]
        assert r.ndcg_milli == 1000

    def test_swapped_ranking_scores_below_1000(self, spark):
        from cassandra_diff_spark.operators.evaluate import ndcg_at_k

        pred = spark.createDataFrame(
            [(1, 11, 1), (1, 10, 2)],
            "query_id long, neighbor_id long, rank long",
        )
        truth = spark.createDataFrame(
            [(1, 10, 5), (1, 11, 1)],
            "query_id long, neighbor_id long, gain long",
        )
        r = ndcg_at_k(pred, truth, k=2).collect()[0]
        assert 0 < r.ndcg_milli < 1000

    def test_nonpositive_gains_excluded(self, spark):
        from cassandra_diff_spark.operators.evaluate import ndcg_at_k

        pred = spark.createDataFrame(
            [(1, 10, 1)], "query_id long, neighbor_id long, rank long"
        )
        truth = spark.createDataFrame(
            [(1, 10, 0), (1, 11, -2)],
            "query_id long, neighbor_id long, gain long",
        )
        assert ndcg_at_k(pred, truth, k=2).count() == 0


class TestRetrievalTruthIsASet:
    def test_duplicate_relevance_rows_do_not_inflate(self, spark):
        from cassandra_diff_spark.operators.evaluate import retrieval_metrics

        pred = spark.createDataFrame(
            [(1, 10, 1)], "query_id long, neighbor_id long, rank long"
        )
        truth_dup = spark.createDataFrame(
            [(1, 10), (1, 10), (1, 10)], "query_id long, neighbor_id long"
        )
        r = retrieval_metrics(pred, truth_dup, k=1).collect()[0]
        assert r.sum_hits == 1 and r.sum_relevant == 1
        assert r.micro_recall_milli == 1000


class TestAveragePrecision:
    def test_hand_computed(self, spark):
        from cassandra_diff_spark.operators.evaluate import (
            average_precision_at_k,
        )

        # q1 hits at ranks 1 and 3 of rel {10, 12, 99}:
        # terms: 1e6*1//1 + 1e6*2//3; / min(3, k=5)
        pred = spark.createDataFrame(
            [(1, 10, 1), (1, 11, 2), (1, 12, 3)],
            "query_id long, neighbor_id long, rank long",
        )
        truth = spark.createDataFrame(
            [(1, 10), (1, 12), (1, 99), (2, 20)],
            "query_id long, neighbor_id long",
        )
        got = {
            r.query_id: r
            for r in average_precision_at_k(pred, truth, k=5).collect()
        }
        want = (1000000 * 1 // 1 + 1000000 * 2 // 3) // 3
        assert got[1].ap_micro == want
        assert got[1].n_rel == 3 and got[1].n_hits == 2
        assert got[2].ap_micro == 0 and got[2].n_hits == 0

    def test_perfect_prefix_scores_million(self, spark):
        from cassandra_diff_spark.operators.evaluate import (
            average_precision_at_k,
        )

        pred = spark.createDataFrame(
            [(1, 10, 1), (1, 11, 2)],
            "query_id long, neighbor_id long, rank long",
        )
        truth = spark.createDataFrame(
            [(1, 10), (1, 11)], "query_id long, neighbor_id long"
        )
        r = average_precision_at_k(pred, truth, k=2).collect()[0]
        assert r.ap_micro == 1000000

    def test_early_beats_late(self, spark):
        from cassandra_diff_spark.operators.evaluate import (
            average_precision_at_k,
        )

        truth = spark.createDataFrame(
            [(1, 10)], "query_id long, neighbor_id long"
        )
        early = spark.createDataFrame(
            [(1, 10, 1), (1, 11, 2)],
            "query_id long, neighbor_id long, rank long",
        )
        late = spark.createDataFrame(
            [(1, 11, 1), (1, 10, 2)],
            "query_id long, neighbor_id long, rank long",
        )
        a = average_precision_at_k(early, truth, k=2).collect()[0].ap_micro
        b = average_precision_at_k(late, truth, k=2).collect()[0].ap_micro
        assert a == 1000000 and b == 500000

    def test_denominator_capped_at_k(self, spark):
        from cassandra_diff_spark.operators.evaluate import (
            average_precision_at_k,
        )

        # 5 relevant but k=2: a perfect 2-prefix must score 1e6, not 2/5
        pred = spark.createDataFrame(
            [(1, 10, 1), (1, 11, 2)],
            "query_id long, neighbor_id long, rank long",
        )
        truth = spark.createDataFrame(
            [(1, n) for n in (10, 11, 12, 13, 14)],
            "query_id long, neighbor_id long",
        )
        r = average_precision_at_k(pred, truth, k=2).collect()[0]
        assert r.ap_micro == 1000000


class TestFleissKappa:
    def test_wikipedia_style_reference(self, spark):
        """Python reference on a small constant-panel fixture."""
        from cassandra_diff_spark.operators.evaluate import fleiss_kappa

        # 4 items x 3 raters
        data = {
            1: ["a", "a", "a"],
            2: ["a", "a", "b"],
            3: ["b", "b", "b"],
            4: ["a", "b", "c"],
        }
        rows = [(i, l) for i, ls in data.items() for l in ls]
        df = spark.createDataFrame(rows, "item long, label string")
        r = fleiss_kappa(df, "item", "label").collect()[0]
        # reference math
        from collections import Counter

        N, n = 4, 3
        pnum = sum(
            sum(c * c for c in Counter(ls).values()) - n for ls in data.values()
        )
        pbar = pnum / (N * n * (n - 1))
        marg = Counter(l for ls in data.values() for l in ls)
        tot = sum(marg.values())
        pe = sum(c * c for c in marg.values()) / tot**2
        want = round((pbar - pe) / (1 - pe) * 1e6)
        assert r.kappa_micro == want
        assert r.pbar_micro == round(pbar * 1e6)
        assert r.pe_micro == round(pe * 1e6)
        assert (r.n_items, r.n_raters, r.n_labels) == (4, 3, 3)

    def test_perfect_agreement(self, spark):
        from cassandra_diff_spark.operators.evaluate import fleiss_kappa

        rows = [(1, "a")] * 3 + [(2, "b")] * 3
        df = spark.createDataFrame(rows, "item long, label string")
        r = fleiss_kappa(df, "item", "label").collect()[0]
        assert r.kappa_micro == 1000000

    def test_constant_label_yields_null(self, spark):
        from cassandra_diff_spark.operators.evaluate import fleiss_kappa

        rows = [(1, "a")] * 3 + [(2, "a")] * 3
        df = spark.createDataFrame(rows, "item long, label string")
        r = fleiss_kappa(df, "item", "label").collect()[0]
        assert r.pbar_micro == 1000000 and r.kappa_micro is None

    def test_ragged_panel_rejected(self, spark):
        import pytest as _pytest

        from cassandra_diff_spark.operators.evaluate import fleiss_kappa

        rows = [(1, "a")] * 3 + [(2, "a")] * 2
        df = spark.createDataFrame(rows, "item long, label string")
        with _pytest.raises(ValueError, match="same number of votes"):
            fleiss_kappa(df, "item", "label")

    def test_null_votes_are_a_category(self, spark):
        from cassandra_diff_spark.operators.evaluate import fleiss_kappa

        rows = [(1, None), (1, None), (2, None), (2, None)]
        df = spark.createDataFrame(rows, "item long, label string")
        r = fleiss_kappa(df, "item", "label").collect()[0]
        assert r.n_labels == 1 and r.pbar_micro == 1000000
