"""Product quantization ANN (operators/similarity.py pq_*)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from cassandra_diff_spark.operators.similarity import (
    brute_force_topk_pandas,
    pq_encode,
    pq_topk,
    pq_train,
)

DIM = 64


@pytest.fixture(scope="module")
def embs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


@pytest.fixture(scope="module")
def queries(spark, embs):
    # perturbed copies of corpus vectors: planted ground truth
    return embs.filter(F.col("vec_id") < 20).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.transform(
            "embedding", lambda x: x + F.lit(0.001)
        ).alias("embedding"),
    )


@pytest.fixture(scope="module")
def books(embs):
    return pq_train(
        embs, "vec_id", "embedding", dim=DIM, m=8, n_codes=16, sample_mod=1
    )


class TestPQ:
    def test_train_shape_and_determinism(self, embs, books):
        assert books.shape == (8, 16, 8)
        again = pq_train(
            embs, "vec_id", "embedding", dim=DIM, m=8, n_codes=16, sample_mod=1
        )
        assert np.array_equal(books, again)

    def test_encode_codes_in_range(self, spark, embs, books):
        enc = pq_encode(embs, "vec_id", "embedding", books, dim=DIM)
        rows = enc.collect()
        assert len(rows) == embs.count()
        for r in rows[:50]:
            assert len(r.codes) == 8
            assert all(0 <= c < 16 for c in r.codes)
            assert r.recon_n > 0

    def test_rerank_recovers_brute_force(self, spark, embs, queries, books):
        """ADC shortlist + exact rerank must equal brute force at
        rank 1 for planted near-duplicate queries."""
        enc = pq_encode(embs, "vec_id", "embedding", books, dim=DIM)
        got = pq_topk(
            enc,
            queries,
            "vec_id",
            "embedding",
            books,
            k=1,
            shortlist=50,
            corpus=embs,
        )
        hits = got.filter(
            (F.col("rank") == 1)
            & (F.col("neighbor_id") == F.col("query_id") - 1_000_000)
        ).count()
        assert hits == queries.count()
        brute = brute_force_topk_pandas(
            embs, queries, "vec_id", "embedding", k=1
        )
        key = lambda df: sorted(  # noqa: E731
            tuple(r) for r in df.filter(F.col("rank") == 1).collect()
        )
        assert key(got) == key(brute)

    def test_adc_only_mode_runs(self, spark, embs, queries, books):
        enc = pq_encode(embs, "vec_id", "embedding", books, dim=DIM)
        got = pq_topk(enc, queries, "vec_id", "embedding", books, k=3)
        per_q = got.groupBy("query_id").count().collect()
        assert all(r["count"] == 3 for r in per_q)

    def test_validation(self, embs):
        with pytest.raises(ValueError, match="divide"):
            pq_train(embs, "vec_id", "embedding", dim=DIM, m=7)


class TestIVFPQ:
    def test_rerank_recovers_brute_top1(self, spark, embs, queries, books):
        from cassandra_diff_spark.operators.similarity import ivf_pq_topk

        got = ivf_pq_topk(
            embs,
            queries,
            "vec_id",
            "embedding",
            books,
            dim=DIM,
            k=1,
            centroid_mod=16,
            n_probe=4,
            shortlist=32,
        )
        hits = got.filter(
            (F.col("rank") == 1)
            & (F.col("neighbor_id") == F.col("query_id") - 1_000_000)
        ).count()
        assert hits == queries.count()

    def test_scan_is_pruned_to_probed_lists(self, spark, embs, queries, books):
        """The codes scan must carry an isin filter on the probed-list
        union — the plan-visible proof the IVF pruning happens before
        the ADC pass."""
        from cassandra_diff_spark.operators.similarity import ivf_pq_topk

        plan = ivf_pq_topk(
            embs, queries, "vec_id", "embedding", books,
            dim=DIM, k=1, centroid_mod=16, n_probe=2, shortlist=16,
        )._jdf.queryExecution().optimizedPlan().toString()
        assert "cent_id" in plan and ("IN (" in plan or "isin" in plan.lower() or "cent_id#" in plan)


def test_ivf_pq_prebuilt_codes_equal_inline(spark, embs, queries, books, tmp_path):
    """A persisted ivf_pq_encode frame passed via codes= must give the
    same answer as the inline encode — the build-once/query-many path."""
    from cassandra_diff_spark.operators.similarity import (
        ivf_pq_encode,
        ivf_pq_topk,
    )

    p = str(tmp_path / "ivfpq_codes")
    ivf_pq_encode(
        embs, "vec_id", "embedding", books, dim=DIM, centroid_mod=16
    ).write.parquet(p)
    prebuilt = ivf_pq_topk(
        embs, queries, "vec_id", "embedding", books,
        dim=DIM, k=1, centroid_mod=16, n_probe=4, shortlist=32,
        codes=spark.read.parquet(p),
    )
    inline = ivf_pq_topk(
        embs, queries, "vec_id", "embedding", books,
        dim=DIM, k=1, centroid_mod=16, n_probe=4, shortlist=32,
    )
    key = lambda df: sorted(tuple(r) for r in df.collect())  # noqa: E731
    assert key(prebuilt) == key(inline)


def test_pq_train_rejects_inner_null_elements(spark):
    """A null ELEMENT inside a vector (top-level null_count 0) must fail
    loudly — Arrow silently converts it to NaN, which would poison every
    codebook distance."""
    import pytest
    from pyspark.sql import functions as F

    from cassandra_diff_spark.operators.similarity import pq_train

    vec = F.array(
        *[
            F.when((F.col("id") == 3) & (F.lit(d) == 1), F.lit(None)).otherwise(
                (F.col("id") % 7).cast("float") + d
            )
            for d in range(4)
        ]
    )
    df = spark.range(600).select(F.col("id").alias("vec_id"), vec.alias("embedding"))
    with pytest.raises(Exception, match="null elements"):
        pq_train(df, "vec_id", "embedding", dim=4, m=2, n_codes=4, sample_mod=1)
