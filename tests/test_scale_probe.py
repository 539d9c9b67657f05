"""Scale-banded ANN/near-dup behavior (VERDICT r2 #6).

The full 1M probe runs in bench.py (scale_probe.run_probe) and lands in
the per-round BENCH json; these tests exercise the same code path at a
CI-sized n so a regression in the wide-band layout (e.g. the band
parameters silently not reaching the key kernel — the exact bug the
probe first exposed) fails fast in pytest.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from scale_probe import PLANT_OFFSET, perturb, synth_vectors

N = 20_000
N_QUERIES = 50


@pytest.fixture(scope="module")
def planted(spark, tmp_path_factory):
    """(corpus, queries): corpus of N hash-derived vectors plus N_QUERIES
    perturbed copies whose true nearest neighbor is known by construction."""
    work = tmp_path_factory.mktemp("scale")
    synth_vectors(spark, N).write.parquet(f"{work}/corpus.parquet")
    corpus = spark.read.parquet(f"{work}/corpus.parquet")
    perturb(corpus.filter(F.col("vec_id") < N_QUERIES)).write.parquet(
        f"{work}/queries.parquet"
    )
    return corpus, spark.read.parquet(f"{work}/queries.parquet")


def _recall_at_1(df) -> float:
    hits = df.filter(
        (F.col("rank") == 1)
        & (F.col("neighbor_id") == F.col("query_id") - PLANT_OFFSET)
    ).count()
    return hits / N_QUERIES


class TestScaleBandedLsh:
    def test_wide_bands_keep_recall(self, planted):
        from cassandra_diff_spark.operators import release_caches, similarity

        corpus, queries = planted
        lsh = similarity.hyperplane_lsh_topk(
            corpus, queries, "vec_id", "embedding", k=5, n_bands=4, probe_radius=1
        )
        assert _recall_at_1(lsh) >= 0.8
        release_caches()

    def test_wide_bands_prune(self, planted, spark):
        """16-bit bands at radius 1 must touch a sub-percent candidate
        fraction — the property that makes the plan viable at 10^6+."""
        from scale_probe import _lsh_candidate_count

        from cassandra_diff_spark.operators import similarity

        corpus, queries = planted
        idx = similarity.hyperplane_lsh_index(
            corpus, "vec_id", "embedding", n_bands=4
        )
        n_cand = _lsh_candidate_count(idx, queries, n_bands=4, radius=1)
        assert n_cand / (N * N_QUERIES) < 0.01

    def test_band_layout_reaches_key_kernel(self, planted, spark):
        """4-band keys must be 16-bit-wide values (not the default 8x8
        layout): regression test for parameters silently ignored."""
        from cassandra_diff_spark.functions.vectors import quantize
        from cassandra_diff_spark.operators.similarity import hyperplane_band_keys

        corpus, _ = planted
        keys = (
            corpus.limit(2000)
            .select(
                hyperplane_band_keys(
                    quantize(F.col("embedding")), 64, 64, 4
                ).alias("keys")
            )
            .select(F.explode("keys").alias("k"))
        )
        assert keys.count() == 2000 * 4  # 4 bands, not 8
        # 8-bit keys max out at 255; a healthy 16-bit layout at this n
        # must produce keys above that
        assert keys.agg(F.max("k")).first()[0] > 255

    def test_invalid_band_split_raises(self):
        from cassandra_diff_spark.operators.similarity import hyperplane_band_keys

        with pytest.raises(ValueError, match="divide"):
            hyperplane_band_keys(F.col("x"), 64, 64, 5)


class TestScaleBandedNearPairs:
    def test_planted_pairs_found_with_wide_bands(self, planted):
        from cassandra_diff_spark.operators import release_caches
        from cassandra_diff_spark.operators.dedup import embedding_near_pairs

        corpus, queries = planted
        both = corpus.unionByName(queries)
        pairs = embedding_near_pairs(
            both, "vec_id", "embedding", min_cos=0.999, n_bands=4
        )
        found = pairs.filter(F.col("id_2") - F.col("id_1") == PLANT_OFFSET).count()
        assert found / N_QUERIES >= 0.8
        release_caches()
