"""Embedding centroids + drift (operators/embeddings.py)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from cassandra_diff_spark.operators.embeddings import (
    centroid_shift,
    embedding_centroids,
)

DIM = 4


@pytest.fixture(scope="module")
def vecs(spark):
    rows = [
        (1, "a", [1.0, 0.0, 0.0, 2.0]),
        (2, "a", [3.0, 0.0, 0.0, 0.0]),
        (3, "b", [0.0, 1.0, 1.0, 0.0]),
        (4, None, None),  # null vector excluded
    ]
    return spark.createDataFrame(
        rows, "id long, grp string, embedding array<float>"
    )


class TestCentroids:
    def test_exact_sums_and_means(self, spark, vecs):
        out = embedding_centroids(vecs, "embedding", dim=DIM, by=["grp"])
        rows = {(r.grp, r.dim): r for r in out.collect()}
        assert rows[("a", 0)].sum_q == 4000 and rows[("a", 0)].n == 2
        assert rows[("a", 0)].mean == 2.0
        assert rows[("a", 3)].sum_q == 2000 and rows[("a", 3)].mean == 1.0
        assert rows[("b", 1)].mean == 1.0
        assert len(rows) == 2 * DIM  # null-vector group dropped with its row

    def test_single_shuffle_no_explode_before_agg(self, spark, vecs):
        plan = embedding_centroids(
            vecs, "embedding", dim=DIM, by=["grp"]
        )._jdf.queryExecution().executedPlan().toString()
        # the Generate (posexplode) must run AFTER the aggregation --
        # over |groups| rows, never over the corpus
        gen = plan.index("Generate")
        agg_first = plan.index("HashAggregate")
        assert plan.count("Exchange") - plan.count("BroadcastExchange") == 1
        # plan prints top-down: the Generate sits ABOVE the aggregate
        assert gen < agg_first


class TestCentroidShift:
    def test_identical_distributions_no_shift(self, spark, vecs):
        c = embedding_centroids(vecs, "embedding", dim=DIM, by=["grp"])
        out = {r.grp: r for r in centroid_shift(c, c, by=["grp"]).collect()}
        for r in out.values():
            assert abs(r.cos_sim - 1.0) < 1e-12
            assert r.l2_shift == 0.0

    def test_matches_numpy(self, spark, vecs):
        shifted = vecs.filter(F.col("embedding").isNotNull()).select(
            "id",
            "grp",
            F.transform("embedding", lambda x: x + F.lit(0.5)).alias(
                "embedding"
            ),
        )
        cur = embedding_centroids(vecs, "embedding", dim=DIM, by=["grp"])
        ref = embedding_centroids(shifted, "embedding", dim=DIM, by=["grp"])
        got = {r.grp: r for r in centroid_shift(cur, ref, by=["grp"]).collect()}

        data = {
            "a": np.array([[1.0, 0.0, 0.0, 2.0], [3.0, 0.0, 0.0, 0.0]]),
            "b": np.array([[0.0, 1.0, 1.0, 0.0]]),
        }
        for g, m in data.items():
            ca, cb = m.mean(axis=0), (m + 0.5).mean(axis=0)
            cos = ca @ cb / np.sqrt((ca @ ca) * (cb @ cb))
            assert abs(got[g].cos_sim - cos) < 1e-9
            assert abs(got[g].l2_shift - np.linalg.norm(ca - cb)) < 1e-9

    def test_short_vectors_rejected_from_sums(self, spark):
        df = spark.createDataFrame(
            [(1, [1.0, 2.0]), (2, [1.0, 2.0, 3.0, 4.0])],
            "id long, embedding array<float>",
        )
        out = embedding_centroids(df, "embedding", dim=4).collect()
        assert all(r.n == 1 for r in out)  # the short vector is excluded


def test_fold_centroids_equals_rebuild(spark, vecs):
    from cassandra_diff_spark.operators.embeddings import fold_centroids

    h = vecs.filter(F.col("id") <= 2)
    b = vecs.filter(F.col("id") > 2)
    folded = fold_centroids(
        embedding_centroids(h, "embedding", dim=DIM, by=["grp"]),
        embedding_centroids(b, "embedding", dim=DIM, by=["grp"]),
        by=["grp"],
    )
    once = embedding_centroids(vecs, "embedding", dim=DIM, by=["grp"])
    key = lambda df: sorted(tuple(r) for r in df.collect())  # noqa: E731
    assert key(folded) == key(once)


class TestFoldGramMoments:
    def test_fold_equals_rebuild(self, spark):
        from cassandra_diff_spark.operators.embeddings import (
            covariance_from_moments,
            embedding_covariance,
            fold_gram_moments,
            gram_moments,
        )

        df = spark.createDataFrame(
            [(i, [float(i % 3) / 3, float(i % 5) / 5, 0.25]) for i in range(40)],
            "vec_id long, embedding array<double>",
        )
        whole = embedding_covariance(df, "embedding", dim=3)
        halves = [
            gram_moments(df.filter(F.col("vec_id") % 2 == p), "embedding", dim=3)
            for p in (0, 1)
        ]
        folded = covariance_from_moments(fold_gram_moments(halves))
        a = sorted(map(tuple, whole.collect()))
        b = sorted(map(tuple, folded.collect()))
        assert a == b

    def test_fold_validation(self):
        from cassandra_diff_spark.operators.embeddings import fold_gram_moments

        import pytest as _pytest

        with _pytest.raises(ValueError, match="at least one"):
            fold_gram_moments([])
