"""Mergeable HLL distinct sketches (operators/sketch.py)."""

import pytest
from pyspark.sql import functions as F

from cassandra_diff_spark.operators.sketch import (
    merge_sketches,
    sketch_distinct,
    sketch_estimates,
)


@pytest.fixture(scope="module")
def orders(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/orders.parquet")


def test_merge_of_shard_sketches_equals_one_pass(spark, orders):
    """The rollup contract: union of per-shard sketches == the sketch of
    everything, estimate-for-estimate (HLL union is lossless at equal
    lg_k). This is what makes persisted per-batch sketches exact
    incremental state, not an approximation of an approximation."""
    cols = ["o_custkey", "o_orderstatus"]
    sharded = sketch_distinct(
        orders.withColumn("shard", F.col("o_orderkey") % 7),
        cols,
        by=["shard"],
    )
    merged = sketch_estimates(merge_sketches(sharded, cols), cols)
    direct = sketch_estimates(sketch_distinct(orders, cols), cols)
    assert merged.collect() == direct.collect()


def test_estimates_close_to_exact(spark, orders):
    got = sketch_estimates(
        sketch_distinct(orders, ["o_custkey"]), ["o_custkey"]
    ).first().n_distinct_o_custkey
    exact = orders.select("o_custkey").distinct().count()
    assert abs(got - exact) <= 0.05 * exact


def test_grouped_sketches(spark, orders):
    per = sketch_estimates(
        sketch_distinct(orders, ["o_custkey"], by=["o_orderstatus"]),
        ["o_custkey"],
        by=["o_orderstatus"],
    )
    rows = {r.o_orderstatus: r.n_distinct_o_custkey for r in per.collect()}
    exact = {
        r.o_orderstatus: r.n
        for r in orders.groupBy("o_orderstatus")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    assert set(rows) == set(exact)
    for k in exact:
        assert abs(rows[k] - exact[k]) <= max(2, 0.05 * exact[k])


def test_incremental_fold_in(spark, orders):
    """Day-2 batch folds into the persisted day-1 sketch without
    rescanning day 1; result == sketching both days at once."""
    d1 = orders.filter(F.col("o_orderkey") % 2 == 0)
    d2 = orders.filter(F.col("o_orderkey") % 2 == 1)
    s1 = sketch_distinct(d1, ["o_custkey"])
    s2 = sketch_distinct(d2, ["o_custkey"])
    folded = sketch_estimates(
        merge_sketches(s1.unionByName(s2), ["o_custkey"]), ["o_custkey"]
    )
    once = sketch_estimates(sketch_distinct(orders, ["o_custkey"]), ["o_custkey"])
    assert folded.collect() == once.collect()


class TestHeavyHitters:
    def test_matches_exact_groupby(self, spark):
        from cassandra_diff_spark.operators.sketch import heavy_hitters

        rows = [(i % 7,) for i in range(700)] + [(99,)] * 300
        df = spark.createDataFrame(rows, "k long").repartition(8)
        out = {r.k: r.cnt for r in heavy_hitters(df, "k", 0.2).collect()}
        assert out == {99: 300}  # 30% >= 20%; each of 0..6 is 10%

    def test_heavy_key_spread_across_partitions_still_found(self, spark):
        from cassandra_diff_spark.operators.sketch import heavy_hitters

        # heavy key interleaved with churn keys so per-partition MG
        # pressure is high; superset guarantee must still hold
        rows = []
        for i in range(2000):
            rows.append((1000,) if i % 4 == 0 else (i,))
        df = spark.createDataFrame(rows, "k long").repartition(16)
        out = {r.k for r in heavy_hitters(df, "k", 0.2).collect()}
        assert out == {1000}

    def test_share_and_threshold_edge(self, spark):
        from cassandra_diff_spark.operators.sketch import heavy_hitters

        rows = [(1,)] * 25 + [(2,)] * 24 + [(3,)] * 51
        df = spark.createDataFrame(rows, "k long")
        out = {r.k: (r.cnt, r.share_ppm) for r in heavy_hitters(df, "k", 0.25).collect()}
        # ceil(0.25*100)=25: key 1 exactly at threshold stays, key 2 misses
        assert out == {1: (25, 250000), 3: (51, 510000)}

    def test_nulls_ignored(self, spark):
        from cassandra_diff_spark.operators.sketch import heavy_hitters

        rows = [(None,)] * 80 + [(5,)] * 20
        df = spark.createDataFrame(rows, "k long")
        out = {r.k: r.cnt for r in heavy_hitters(df, "k", 0.5).collect()}
        assert out == {5: 20}  # total excludes nulls -> 20/20 = 100%

    def test_string_keys(self, spark):
        from cassandra_diff_spark.operators.sketch import heavy_hitters

        rows = [("hot",)] * 60 + [(f"cold{i}",) for i in range(40)]
        df = spark.createDataFrame(rows, "k string").repartition(4)
        out = {r.k for r in heavy_hitters(df, "k", 0.3).collect()}
        assert out == {"hot"}


class TestKeyOverlapEstimate:
    """sketch.key_overlap_estimate — inclusion-exclusion at sketch cost."""

    def test_known_overlap_accuracy(self, spark):
        from cassandra_diff_spark.operators.sketch import key_overlap_estimate

        a = spark.createDataFrame([(i,) for i in range(4000)], "k long")
        b = spark.createDataFrame([(i,) for i in range(2000, 8000)], "k long")
        r = key_overlap_estimate(a, b, "k").collect()[0]
        assert abs(r.n_intersection - 2000) <= 0.10 * 2000
        assert abs(r.n_union - 8000) <= 0.05 * 8000
        assert 180 <= r.jaccard_milli <= 320  # true 2000/8000 = 250

    def test_identical_and_disjoint(self, spark):
        from cassandra_diff_spark.operators.sketch import key_overlap_estimate

        a = spark.createDataFrame([(i,) for i in range(3000)], "k long")
        same = key_overlap_estimate(a, a, "k").collect()[0]
        assert same.jaccard_milli >= 960  # identical sets (HLL re-estimate noise)
        b = spark.createDataFrame([(i,) for i in range(100000, 103000)], "k long")
        dis = key_overlap_estimate(a, b, "k").collect()[0]
        assert dis.n_intersection <= 0.05 * dis.n_union  # ~0, clamped >= 0
        assert dis.n_intersection >= 0.0

    def test_different_column_names_and_nulls(self, spark):
        from cassandra_diff_spark.operators.sketch import key_overlap_estimate

        a = spark.createDataFrame([(1,), (2,), (None,)], "x long")
        b = spark.createDataFrame([(2,), (3,), (None,)], "y long")
        r = key_overlap_estimate(a, b, "x", "y").collect()[0]
        assert abs(r.n_union - 3) < 0.5 and abs(r.n_intersection - 1) < 0.5


class TestCountMin:
    """sketch.cm_sketch_build / fold_cm_sketches / cm_estimate."""

    @pytest.fixture(scope="class")
    def freq_df(self, spark):
        rows = [("hot",)] * 500 + [("warm",)] * 60 + [(f"k{i}",) for i in range(300)]
        rows += [(None,)]
        return spark.createDataFrame(rows, "k string")

    def test_upper_bound_and_tightness(self, spark, freq_df):
        from cassandra_diff_spark.operators.sketch import (
            cm_estimate,
            cm_sketch_build,
        )

        sk = cm_sketch_build(freq_df, "k", depth=4, width=1024)
        keys = spark.createDataFrame([("hot",), ("warm",), ("k5",)], "k string")
        est = {r.k: r.est for r in cm_estimate(sk, keys, "k", depth=4, width=1024).collect()}
        true = {"hot": 500, "warm": 60, "k5": 1}
        for k, t in true.items():
            assert est[k] >= t  # CM never undercounts
            assert est[k] <= t + 10  # 860 items over 1024 cells: tiny collision mass

    def test_fold_equals_one_shot(self, spark, freq_df):
        from cassandra_diff_spark.operators.sketch import (
            cm_sketch_build,
            fold_cm_sketches,
        )

        wm = freq_df.withColumn("h", F.crc32(F.coalesce(F.col("k"), F.lit(""))) % 3)
        parts = [
            cm_sketch_build(wm.filter(F.col("h") == i), "k", depth=3, width=256)
            for i in range(3)
        ]
        folded = fold_cm_sketches(parts)
        one = cm_sketch_build(freq_df, "k", depth=3, width=256)
        key = lambda d: sorted(tuple(r) for r in d.collect())  # noqa: E731
        assert key(folded) == key(one)

    def test_absent_key_and_cell_bound(self, spark, freq_df):
        from cassandra_diff_spark.operators.sketch import (
            cm_estimate,
            cm_sketch_build,
        )

        sk = cm_sketch_build(freq_df, "k", depth=4, width=1024)
        assert sk.count() <= 4 * 1024  # state bounded by the matrix, not keys
        keys = spark.createDataFrame([("never-seen",)], "k string")
        est = cm_estimate(sk, keys, "k", depth=4, width=1024).collect()[0].est
        assert 0 <= est <= 10  # collision mass only

    def test_validation(self, spark, freq_df):
        from cassandra_diff_spark.operators.sketch import (
            cm_sketch_build,
            fold_cm_sketches,
        )

        with pytest.raises(ValueError):
            cm_sketch_build(freq_df, "k", depth=0)
        with pytest.raises(ValueError):
            fold_cm_sketches([])


class TestBloomPrefilter:
    """sketch.bloom_build / bloom_filter_keys."""

    @pytest.fixture(scope="class")
    def keyed(self, spark):
        members = spark.createDataFrame([(i,) for i in range(0, 2000, 2)], "k long")
        probe = spark.createDataFrame(
            [(i, f"row{i}") for i in range(3000)] + [(None, "nullrow")],
            "k long, payload string",
        )
        return members, probe

    def test_no_false_negatives_and_fp_rate(self, spark, keyed):
        from cassandra_diff_spark.operators.sketch import (
            bloom_build,
            bloom_filter_keys,
        )

        members, probe = keyed
        bloom = bloom_build(members, "k", m_bits=1 << 15, k=5)
        kept = {r.k for r in bloom_filter_keys(
            probe, "k", bloom, m_bits=1 << 15, k=5
        ).collect()}
        truth = {i for i in range(0, 2000, 2)}
        assert truth <= kept            # a bloom NEVER drops a member
        fps = kept - truth
        assert len(fps) < 0.05 * 3000   # 1000 keys in 32k bits: low FP rate
        assert None not in kept

    def test_composition_with_join_stays_exact(self, spark, keyed):
        """Prefilter + join == plain join: FPs are re-checked downstream."""
        from cassandra_diff_spark.operators.sketch import (
            bloom_build,
            bloom_filter_keys,
        )

        members, probe = keyed
        bloom = bloom_build(members, "k", m_bits=4096, k=3)  # small: real FPs
        pre = bloom_filter_keys(probe, "k", bloom, m_bits=4096, k=3)
        a = sorted(tuple(r) for r in pre.join(members, "k").collect())
        b = sorted(tuple(r) for r in probe.join(members, "k").collect())
        assert a == b

    def test_sharded_builds_fold_by_bit_or(self, spark, keyed):
        from cassandra_diff_spark.operators.sketch import bloom_build

        members, _ = keyed
        parts = [
            bloom_build(members.filter(F.col("k") % 4 == m), "k", m_bits=8192, k=4)
            for m in range(4)
        ]
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        folded = u.groupBy("word").agg(F.expr("bit_or(bits)").cast("long").alias("bits"))
        one = bloom_build(members, "k", m_bits=8192, k=4)
        key = lambda d: sorted(tuple(r) for r in d.collect())  # noqa: E731
        assert key(folded) == key(one)

    def test_filter_is_map_only(self, spark, keyed, tmp_path):
        from cassandra_diff_spark.operators.sketch import (
            bloom_build,
            bloom_filter_keys,
        )

        members, probe = keyed
        bpath, ppath = str(tmp_path / "bloom"), str(tmp_path / "probe")
        bloom_build(members, "k", m_bits=8192, k=4).write.parquet(bpath)
        probe.write.parquet(ppath)
        plan = bloom_filter_keys(
            spark.read.parquet(ppath), "k", spark.read.parquet(bpath),
            m_bits=8192, k=4,
        )._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

    def test_validation(self, spark, keyed):
        from cassandra_diff_spark.operators.sketch import bloom_build

        members, _ = keyed
        with pytest.raises(ValueError):
            bloom_build(members, "k", m_bits=10)
