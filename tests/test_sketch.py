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
