#!/usr/bin/env python
"""End-to-end training-corpus build — the LLM-data-pipeline surface in
one runnable script. Mirrors what a real pretraining data job does,
stage by stage, each on the engine's scale-shaped operators:

  1. ingest + profile          (validate.profile_table)
  2. exact + near dedup        (dedup.exact_dedup; minhash_lsh_verified
                                -> dedup_clusters -> drop non-canonical)
  3. vocabulary + encoding     (vocab.build_vocab / encode_documents,
                                metadata passthrough via keep_cols)
  4. OOV quality drop, packing (curate.pack_sequences)
  5. eval holdout              (curate.sample_exact_k)
  6. shards + distinct sketch  (curate.write_training_shards,
                                sketch.sketch_distinct rollup)

Usage:
    python examples/corpus_pipeline.py [SF_DIR] [OUT_DIR]

Defaults: SF_DIR=/root/testdata/sf0.001, OUT_DIR=/tmp/corpus_build.
Everything is deterministic — rerunning produces byte-identical shards.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from cassandra_diff_spark.operators.curate import (  # noqa: E402
    pack_sequences,
    sample_exact_k,
    write_training_shards,
)
from cassandra_diff_spark.operators.dedup import (  # noqa: E402
    dedup_clusters,
    exact_dedup,
    minhash_lsh_verified_pairs,
)
from cassandra_diff_spark.operators.sketch import (  # noqa: E402
    merge_sketches,
    sketch_distinct,
    sketch_estimates,
)
from cassandra_diff_spark.operators.validate import profile_table  # noqa: E402
from cassandra_diff_spark.operators.vocab import (  # noqa: E402
    build_vocab,
    encode_documents,
)
from cassandra_diff_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/corpus_build"
    spark = get_spark("corpus-pipeline")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # 1. profile the raw drop
    print("== profile ==")
    profile_table(docs.select("doc_id", "lang", "source", "n_chars")).show(
        truncate=False
    )

    # 2a. exact dedup: one survivor per normalized fingerprint
    survivors = exact_dedup(docs, "doc_id", "text").select(
        F.col("keep_id").alias("doc_id")
    )
    d = docs.join(survivors, "doc_id")

    # 2b. near dedup: verified MinHash pairs -> connected components ->
    #     keep each cluster's canonical doc
    pairs = minhash_lsh_verified_pairs(d, "doc_id", "text")
    clusters = dedup_clusters(pairs.select("id_1", "id_2"))
    dups = clusters.filter(F.col("id") != F.col("cluster_id")).select(
        F.col("id").alias("doc_id")
    )
    d = d.join(dups, "doc_id", "left_anti")
    print(f"after dedup: {d.count()} docs")

    # 3-4. vocabulary over the deduped corpus, map-only encode
    vocab = build_vocab(d, "text", vocab_size=1000, min_count=2)
    enc = encode_documents(
        d, "doc_id", "text", vocab, keep_cols=["lang", "source"]
    )

    # 5. vocabulary-coverage quality drop + greedy packing per language
    kept = enc.filter(F.col("n_oov") * 2 < F.col("n_tokens"))
    packed = pack_sequences(
        kept.select("doc_id", "lang", "n_tokens"),
        "doc_id",
        "n_tokens",
        capacity=2048,
        group_col="lang",
    )
    print(f"packed: {packed.count()} docs into "
          f"{packed.groupBy('lang', 'bin').count().count()} bins")

    # 6. deterministic eval holdout: exactly 20 docs per language
    holdout = sample_exact_k(kept, "doc_id", "lang", 20)
    print(f"holdout: {holdout.count()} docs")

    # 7a. training shards (deterministic hash assignment)
    train = kept.join(holdout.select("doc_id"), "doc_id", "left_anti")
    write_training_shards(
        train.join(d.select("doc_id", "text"), "doc_id"),
        f"{out}/shards",
        "doc_id",
        n_shards=8,
    )

    # 7b. per-shard distinct sketches, rolled up — the incremental
    #     cardinality state the NEXT drop folds into without a rescan
    sk = sketch_distinct(
        train.withColumn("shard", F.col("doc_id") % 8),
        ["lang", "source"],
        by=["shard"],
    )
    sk.write.mode("overwrite").parquet(f"{out}/sketches")
    sketch_estimates(
        merge_sketches(spark.read.parquet(f"{out}/sketches"),
                       ["lang", "source"]),
        ["lang", "source"],
    ).show()
    print(f"done -> {out}")


if __name__ == "__main__":
    main()
