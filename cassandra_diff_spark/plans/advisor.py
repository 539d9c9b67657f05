"""Diff-strategy advisor: the pre-flight that picks HOW to diff a pair
before paying for it.

At 100 TB the difference between the right and wrong plan is the job:
a colocated/bucketed diff is exchange-free, a digest-pruned recurring
diff reads percent-scale dirty slices, a token-sorted layout prunes
files in the scan, a hot partition key serializes one task unless the
shuffle is widened, and two tables whose key sets barely overlap mean
the SPEC is wrong — no plan rescues diffing the wrong keys.

The advisor consults only kilobyte-scale evidence, all of it built
from this engine's own pre-flight operators:

* :func:`~cassandra_diff_spark.operators.bucketed.parquet_stats_manifest`
  — distributed footer scan: sizes and per-file key ranges;
* :func:`~cassandra_diff_spark.operators.sketch.key_overlap_estimate`
  — HLL inclusion-exclusion: do the key sets even overlap;
* :func:`~cassandra_diff_spark.plans.splits.key_skew_report`
  — heaviest partition keys, share in ppm.

Nothing here reads data rows except the sketch pass (one narrow-column
scan per side); everything else is parquet footers. The output is a
plain dict — a planning artifact for humans and the CLI, not a
DataFrame — with ``evidence`` (what was measured) and
``recommendations`` (setting, value, reason) the job config can apply
directly (``align`` / ``skew_safe`` / ``digest_buckets`` /
``snapshot_path`` / scan pruning).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from cassandra_diff_spark.model import TableSpec

#: top-key share above which the pk-only shuffle is considered skewed
SKEW_PPM = 10_000  # 1%
#: per-side bytes above which two-phase digest pruning starts paying
DIGEST_BYTES = 256 * 1024 * 1024


def _side_evidence(spark: SparkSession, path: str, key: str) -> dict:
    from cassandra_diff_spark.operators.bucketed import parquet_stats_manifest

    man = parquet_stats_manifest(spark, path, columns=[key]).collect()
    files = {}
    for r in man:
        files[r["file"]] = (
            r["n_bytes"],
            r["n_rows"],
            r["min_value"],
            r["max_value"],
        )
    def _num(s):
        # manifest stringifies min/max for a uniform schema; the layout
        # check needs numeric order — non-numeric keys report not-sorted
        try:
            return float(s)
        except (TypeError, ValueError):
            return None

    ranges = sorted(
        (mn, mx)
        for (_, _, mn_s, mx_s) in files.values()
        for mn, mx in [(_num(mn_s), _num(mx_s))]
        if mn is not None and mx is not None
    )
    disjoint = len(ranges) > 1 and all(
        ranges[i][1] < ranges[i + 1][0] for i in range(len(ranges) - 1)
    )
    return {
        "n_files": len(files),
        "total_bytes": sum(b for (b, _, _, _) in files.values()),
        "total_rows": sum(n for (_, n, _, _) in files.values()),
        "key_ranges_disjoint": disjoint,
    }


def recommend_diff_strategy(
    spark: SparkSession,
    src_path: str,
    tgt_path: str,
    spec: TableSpec,
    *,
    snapshot_path: Optional[str] = None,
    check_overlap: bool = True,
    check_skew: bool = True,
) -> dict:
    """Pre-flight a diff pair and return ``{"evidence": ..,
    "recommendations": [{"setting", "value", "reason"}, ..]}``.

    Only the first partition-key column drives layout/overlap/skew
    evidence (it is the token driver); pass the real spec so clustering
    presence can steer ``align``.
    """
    key = spec.partition_key[0]
    src = spark.read.parquet(src_path)
    tgt = spark.read.parquet(tgt_path)
    ev: dict = {
        "src": _side_evidence(spark, src_path, key),
        "tgt": _side_evidence(spark, tgt_path, key),
    }
    recs: list[dict] = []

    def rec(setting, value, reason):
        recs.append({"setting": setting, "value": value, "reason": reason})

    # --- key-set overlap: is the spec even right?
    if check_overlap:
        from cassandra_diff_spark.operators.sketch import key_overlap_estimate

        o = key_overlap_estimate(src, tgt, key).collect()[0]
        ev["overlap"] = {
            "n_src_keys": o["n_a"],
            "n_tgt_keys": o["n_b"],
            "jaccard_milli": o["jaccard_milli"],
        }
        smaller = max(min(o["n_a"], o["n_b"]), 1.0)
        if o["n_intersection"] < 0.5 * smaller:
            rec(
                "WARNING",
                "keys-barely-overlap",
                f"estimated key intersection {o['n_intersection']:.0f} is "
                f"under half the smaller side ({smaller:.0f}) — check "
                f"partition_key={spec.partition_key!r} before diffing; no "
                "plan rescues the wrong join key",
            )

    # --- skew: does one partition key dominate?
    if check_skew:
        from cassandra_diff_spark.plans.splits import key_skew_report

        top = key_skew_report(src, list(spec.partition_key), top_n=1).collect()
        top_ppm = int(top[0]["ppm"]) if top else 0
        ev["top_key_ppm"] = top_ppm
        if top_ppm >= SKEW_PPM and spec.clustering:
            rec(
                "skew_safe",
                True,
                f"hottest partition key holds {top_ppm} ppm of rows "
                f"(>= {SKEW_PPM}): shuffle on pk+clustering so it spreads "
                "across tasks instead of serializing into one",
            )

    # --- layout: token-sorted files prune in the scan
    if ev["src"]["key_ranges_disjoint"] and ev["tgt"]["key_ranges_disjoint"]:
        rec(
            "scan_pruning",
            "token-range",
            f"both sides' per-file [{key}] ranges are pairwise disjoint "
            "(token-sorted layout): split prefilters will prune files via "
            "parquet min/max stats — keep prefilter=True and size splits "
            "to the file grain",
        )

    # --- recurring economics: digests + snapshots
    big = max(ev["src"]["total_bytes"], ev["tgt"]["total_bytes"])
    if big >= DIGEST_BYTES:
        rec(
            "digest_buckets",
            4096,
            f"largest side is {big} bytes (>= {DIGEST_BYTES}): two-phase "
            "digest pruning compares kilobyte digest vectors first and "
            "re-reads only dirty buckets",
        )
        rec(
            "snapshot_path",
            snapshot_path or "<set a path>",
            "persist digest snapshots so tomorrow's run diffs against "
            "tonight's digests without rescanning the unchanged side",
        )
    if not spec.clustering:
        rec(
            "align",
            "set",
            "no clustering columns: the single-shuffle set alignment is "
            "the scale path (positional alignment exists for reference "
            "parity on clustered tables)",
        )
    return {"evidence": ev, "recommendations": recs}
