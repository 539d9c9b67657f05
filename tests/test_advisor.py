"""plans/advisor.recommend_diff_strategy — evidence-driven pre-flight."""

import pytest
from pyspark.sql import functions as F

from cassandra_diff_spark.model import TableSpec
from cassandra_diff_spark.plans.advisor import recommend_diff_strategy


def _settings(out):
    return {r["setting"]: r for r in out["recommendations"]}


@pytest.fixture(scope="module")
def pair(spark, tmp_path_factory):
    """A sorted, well-overlapping pair with one hot key."""
    base = tmp_path_factory.mktemp("advisor")
    rows = [(k, k % 7, float(k)) for k in range(5000)]
    rows += [(99999, i, 1.0) for i in range(600)]  # hot key, >1% of rows
    df = spark.createDataFrame(rows, "k long, c long, v double")
    src, tgt = str(base / "src"), str(base / "tgt")
    for p in (src, tgt):
        (df.repartitionByRange(8, "k").sortWithinPartitions("k")
           .write.mode("overwrite").parquet(p))
    return src, tgt


def test_sorted_skewed_overlapping_pair(spark, pair):
    src, tgt = pair
    out = recommend_diff_strategy(
        spark, src, tgt,
        TableSpec(name="t", partition_key=("k",), clustering=("c",)),
    )
    s = _settings(out)
    assert "scan_pruning" in s          # disjoint per-file ranges detected
    assert s["skew_safe"]["value"] is True  # hot key over 1%
    assert "WARNING" not in s           # identical key sets: no overlap warning
    assert out["evidence"]["src"]["key_ranges_disjoint"]
    assert out["evidence"]["top_key_ppm"] >= 10_000


def test_disjoint_keys_warn(spark, tmp_path):
    a = spark.createDataFrame([(i,) for i in range(3000)], "k long")
    b = spark.createDataFrame([(i,) for i in range(500000, 503000)], "k long")
    pa_, pb_ = str(tmp_path / "a"), str(tmp_path / "b")
    a.write.mode("overwrite").parquet(pa_)
    b.write.mode("overwrite").parquet(pb_)
    out = recommend_diff_strategy(
        spark, pa_, pb_, TableSpec(name="t", partition_key=("k",)),
        check_skew=False,
    )
    s = _settings(out)
    assert s["WARNING"]["value"] == "keys-barely-overlap"
    assert s["align"]["value"] == "set"  # no clustering -> set path


def test_unsorted_small_pair_is_quiet(spark, tmp_path):
    df = spark.createDataFrame([(i % 97, i) for i in range(2000)], "k long, c long")
    p1, p2 = str(tmp_path / "s"), str(tmp_path / "t")
    df.repartition(6).write.mode("overwrite").parquet(p1)
    df.repartition(6).write.mode("overwrite").parquet(p2)
    out = recommend_diff_strategy(
        spark, p1, p2, TableSpec(name="t", partition_key=("k",)),
        check_overlap=False, check_skew=False,
    )
    s = _settings(out)
    assert "scan_pruning" not in s      # hash layout: ranges overlap
    assert "digest_buckets" not in s    # tiny files, digests don't pay
