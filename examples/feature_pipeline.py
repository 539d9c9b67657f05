#!/usr/bin/env python
"""End-to-end tabular feature engineering — the numeric twin of
corpus_pipeline.py. Mirrors what a feature-table build runs before
training on event/transaction data, each stage on the engine's
scale-shaped operators:

  1. profile + relationships   (validate.profile_table,
                                validate.numeric_correlations — exact
                                decimal(38,0) moments, one agg scan)
  2. rule gate + witnesses     (validate.check_rules /
                                violation_samples on the raw table)
  3. outlier treatment         (stats.winsorize — exact nearest-rank
                                envelope, cap-don't-drop)
  4. scaling                   (stats.robust_scale median/IQR +
                                stats.cdf_transform rank normalization)
  5. anomaly flags             (stats.rolling_anomaly — exact integer
                                z-score inequality per user stream)
  6. leakage-proof split       (curate.assign_split — hash cut-points)
  7. quality-weighted holdout  (curate.sample_weighted — E-S race)

Usage:
    python examples/feature_pipeline.py [SF_DIR] [OUT_DIR]

Defaults: SF_DIR=/root/testdata/sf0.001, OUT_DIR=/tmp/feature_build.
Deterministic end to end — rerunning reproduces every byte.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from cassandra_diff_spark.operators.curate import (  # noqa: E402
    assign_split,
    sample_weighted,
)
from cassandra_diff_spark.operators.stats import (  # noqa: E402
    cdf_transform,
    robust_scale,
    rolling_anomaly,
    winsorize,
)
from cassandra_diff_spark.operators.validate import (  # noqa: E402
    numeric_correlations,
    profile_table,
)
from cassandra_diff_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/feature_build"
    spark = get_spark("feature-pipeline")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")

    # 1. shape + relationships: what a human checks before writing rules
    profile_table(ev, distinct="approx").show(truncate=False)
    numeric_correlations(ev, ["value", "user_id"], scale=1000).show()

    # 3-4. outlier cap, then two scalings of the capped value
    feat = winsorize(ev, "value", 0.01, 0.99, lo=0.0, hi=100.0, by=["event_type"])
    feat = robust_scale(feat, "value_w", lo=0.0, hi=100.0, by=["event_type"])
    feat = cdf_transform(feat, "value_w", lo=0.0, hi=100.0, by=["event_type"])

    # 5. per-user anomaly flags over the event stream (flagged rows only)
    anom = rolling_anomaly(
        ev, "user_id", "ts", "value", order_cols=["event_id"], window=20
    ).select("event_id", F.lit(True).alias("value_anomaly"))
    feat = feat.join(anom, "event_id", "left").fillna(
        {"value_anomaly": False}
    )

    # 6. leakage-proof split: ids never migrate as the table grows
    feat = assign_split(feat, "event_id", {"train": 0.9, "val": 0.05, "test": 0.05})

    feat.write.mode("overwrite").partitionBy("split").parquet(f"{out_dir}/features")
    built = spark.read.parquet(f"{out_dir}/features")
    built.groupBy("split").count().orderBy("split").show()

    # 7. a quality-weighted eval pool: higher-value events more likely,
    # same pool on every run
    pool = sample_weighted(
        built.filter("split = 'val'").filter(F.col("value").isNotNull() & (F.col("value") > 0)),
        "event_id",
        "event_type",
        "value",
        25,
    )
    pool.select("event_id", "event_type", "value").orderBy("event_type", "event_id").show(10)
    print(f"features -> {out_dir}/features; eval pool rows: {pool.count()}")


if __name__ == "__main__":
    main()
