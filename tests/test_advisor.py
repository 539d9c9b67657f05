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


class TestLSHBandPlan:
    def test_catch_probability_hand_math(self):
        from cassandra_diff_spark.plans.lsh import catch_probability_milli

        # b=4, r=4, s=0.8: 1 - (1 - 0.8^4)^4 = 1 - (0.5904)^4
        assert catch_probability_milli(4, 4, 800) == round(
            (1 - (1 - 0.8**4) ** 4) * 1000
        )
        assert catch_probability_milli(4, 4, 0) == 0
        assert catch_probability_milli(4, 4, 1000) == 1000

    def test_engine_default_threshold(self):
        from cassandra_diff_spark.operators.dedup import BANDS, NUM_PERM
        from cassandra_diff_spark.plans.lsh import curve_threshold_milli

        t = curve_threshold_milli(BANDS, NUM_PERM // BANDS)
        assert 700 <= t <= 715  # (1/4)^(1/4) ~ 0.707

    def test_plan_recommends_divisor_splits_best_first(self):
        from cassandra_diff_spark.plans.lsh import band_plan

        plans = band_plan(16, target_milli=700)
        assert all(16 == p.bands * p.rows for p in plans)
        # best plan's threshold is the closest to the target
        best = plans[0]
        assert all(
            abs(best.threshold_milli - 700) <= abs(p.threshold_milli - 700)
            for p in plans
        )
        # the engine default (4, 4) wins for the ~0.7 regime
        assert (best.bands, best.rows) == (4, 4)

    def test_lower_target_wants_more_bands(self):
        from cassandra_diff_spark.plans.lsh import band_plan

        loose = band_plan(16, target_milli=300)[0]
        strict = band_plan(16, target_milli=950)[0]
        assert loose.bands > strict.bands
        # and catch at target is high for the loose plan by design
        assert loose.catch_at_target_milli >= 500

    def test_validation(self):
        import pytest as _pytest

        from cassandra_diff_spark.plans.lsh import band_plan

        with _pytest.raises(ValueError):
            band_plan(1, 700)
        with _pytest.raises(ValueError):
            band_plan(16, 0)


class TestBenchRegistry:
    def test_headline_names_resolve_and_are_unique(self):
        """A typo in bench.HEADLINE would crash the driver's per-round
        benchmark before any timing lands — guard the list against the
        registry."""
        import ast
        from pathlib import Path

        from cassandra_diff_spark import gate, gate_pipeline

        tree = ast.parse(
            (Path(__file__).resolve().parent.parent / "bench.py").read_text()
        )
        names = None
        for node in ast.walk(tree):
            if (
                isinstance(node, ast.Assign)
                and getattr(node.targets[0], "id", "") == "HEADLINE"
            ):
                names = [ast.literal_eval(e) for e in node.value.elts]
        assert names, "HEADLINE list not found in bench.py"
        registry = {**gate.QUERIES, **gate_pipeline.QUERIES}
        missing = [n for n in names if n not in registry]
        assert not missing, missing
        assert len(names) == len(set(names))
