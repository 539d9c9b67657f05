#!/usr/bin/env python
"""End-to-end labeled-data QA and release — the annotation-side twin of
corpus_pipeline.py. Mirrors what a labeling pipeline runs between "the
raters submitted votes" and "the labels ship in a training set", each
stage on the engine's scale-shaped operators:

  1. vote aggregation      (evaluate.majority_label — deterministic
                            count-DESC/label-ASC winners + agreement)
  2. rater agreement QA    (evaluate.cohen_kappa — exact integer
                            po/pe/kappa, NULL abstentions a category)
  3. model-label audit     (evaluate.confusion_matrix +
                            evaluate.class_metrics vs the majority
                            labels as golden truth)
  4. privacy release prep  (privacy.pseudonymize — keyed surrogate
                            tokens; privacy.k_anonymity_report — the
                            re-identification audit)
  5. leakage-proof split   (curate.assign_split — hash cut-points over
                            the released items)

Votes are simulated deterministically from lineitem rows (each line
item votes its l_returnflag on its order — real multi-row groups), and
a synthetic "model" predicts the flag with planted disagreement, so the
run is reproducible byte-for-byte.

Usage:
    python examples/labeling_pipeline.py [SF_DIR] [OUT_DIR]

Defaults: SF_DIR=/root/testdata/sf0.001, OUT_DIR=/tmp/label_build.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from cassandra_diff_spark.operators.curate import assign_split  # noqa: E402
from cassandra_diff_spark.operators.evaluate import (  # noqa: E402
    class_metrics,
    cohen_kappa,
    majority_label,
)
from cassandra_diff_spark.operators.privacy import (  # noqa: E402
    k_anonymity_report,
    pseudonymize,
)
from cassandra_diff_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/label_build")
    spark = get_spark("labeling-pipeline")

    votes = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        F.col("l_orderkey").alias("item"), F.col("l_returnflag").alias("label")
    )

    # 1. votes -> one label per item + agreement confidence
    labels = majority_label(votes, "item", "label").cache()
    n_items = labels.count()
    firm = labels.filter(F.col("agreement_milli") >= 667)
    print(f"items: {n_items}, firm (>=2/3 agreement): {firm.count()}")

    # 2. rater-pair agreement: first vs last vote per item (are the
    #    raters consistent enough for the batch to be usable?)
    first_last = votes.groupBy("item").agg(
        F.min_by("label", "label").alias("a"),
        F.max_by("label", "label").alias("b"),
    )
    kappa = cohen_kappa(first_last, "a", "b").collect()[0]
    print(
        f"kappa: po={kappa.po_milli} pe={kappa.pe_micro} "
        f"kappa_micro={kappa.kappa_micro}"
    )

    # 3. audit a synthetic model against the majority labels
    model = labels.select(
        "item",
        F.when(F.col("item") % 11 == 0, F.lit("R"))
        .otherwise(F.col("label"))
        .alias("pred"),
        F.col("label").alias("truth"),
    )
    per_class = class_metrics(model, "truth", "pred")
    per_class.show(truncate=False)

    # 4. release prep: pseudonymize the item key, audit quasi-identifiers
    release = pseudonymize(
        labels.select("item", "label", "agreement_milli"),
        ["item"],
        secret="release-2026-08",
    )
    risky = k_anonymity_report(
        release, ["label", "agreement_milli"], k=5
    )
    print(f"k<5 (label, agreement) combos: {risky.count()}")

    # 5. leakage-proof split of the released items
    final = assign_split(
        release, "item", {"train": 0.9, "val": 0.05, "test": 0.05}, seed=1
    )
    final.write.mode("overwrite").partitionBy("split").parquet(
        str(out / "labels")
    )
    print(f"wrote {out}/labels")
    got = {
        r.split: r.n
        for r in final.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    print(f"split sizes: {got}")


if __name__ == "__main__":
    main()
