"""CLI entry point — the engine's `spark-submit DiffJob <config.yaml>`
(reference: DiffJob.main, DiffJob.java:60-71).

    python -m cassandra_diff_spark <config.yaml> [--rerun]
                                   [--splits-per-table N]
                                   [--mid-split-chunks N]
                                   [--continue-on-error]
                                   [--serve [PORT]]
                                   [--drift-report TABLE JOB_A JOB_B]
                                   [--repair TABLE OUT_PATH]
                                   [--plan TABLE N_SPLITS]

Prints one JSON line per table with the 9 RangeStats counters, then a
job summary line; exit code 0 iff every table fully matches
(RangeStats.allMatches semantics, RangeStats.java:180-198).

``--drift-report`` skips running a job and instead compares two prior
runs' persisted digest snapshots of TABLE (requires the config's
``snapshot_path`` + jobs run with ``digest_buckets``): one JSON line
with buckets / dirty_buckets / dirty_rows_est per side, zero table
scans.
"""

from __future__ import annotations

import argparse
import json
import sys

from cassandra_diff_spark.config import load_config
from cassandra_diff_spark.job import run_job
from cassandra_diff_spark.model import STAT_FIELDS
from cassandra_diff_spark.session import get_spark


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="cassandra_diff_spark")
    ap.add_argument("config", help="YAML job configuration file")
    ap.add_argument("--rerun", action="store_true", help="reprocess completed units")
    ap.add_argument("--splits-per-table", type=int, default=1)
    ap.add_argument(
        "--mid-split-chunks", type=int, default=1,
        help="journal a resume watermark every 1/N of each split (ST2)",
    )
    ap.add_argument("--continue-on-error", action="store_true")
    ap.add_argument(
        "--serve", type=int, nargs="?", const=8089, default=None, metavar="PORT",
        help="after the job, serve the journal's REST API on PORT",
    )
    ap.add_argument(
        "--drift-report", nargs=3, metavar=("TABLE", "JOB_A", "JOB_B"),
        default=None,
        help="compare two runs' digest snapshots of TABLE (no job run)",
    )
    ap.add_argument(
        "--profile", nargs=2, metavar=("TABLE", "SIDE"), default=None,
        help=(
            "print TABLE's column-statistics profile (one JSON line per "
            "column) from the given side (source|target) — no diff job "
            "run; distinct counts use the single-pass HLL++ mode"
        ),
    )
    ap.add_argument(
        "--validate", action="store_true",
        help=(
            "run the config's declarative data-quality rules instead of "
            "a diff job: one JSON line per (table, side, rule); exit 1 "
            "if any rule fails"
        ),
    )
    ap.add_argument(
        "--advise", metavar="TABLE", default=None,
        help="pre-flight a table pair: layout/overlap/skew evidence + "
             "recommended diff settings (kilobyte-scale checks only)",
    )
    ap.add_argument(
        "--plan", nargs=2, metavar=("TABLE", "N_SPLITS"), default=None,
        help=(
            "print TABLE's data-driven balanced split ranges (near-equal "
            "row counts from the source's token histogram) as JSON lines "
            "— no diff job run"
        ),
    )
    ap.add_argument(
        "--repair", nargs=2, metavar=("TABLE", "OUT_PATH"), default=None,
        help=(
            "write the insert/update/delete reconciliation set that makes "
            "the target identical to the source for TABLE to OUT_PATH as "
            "parquet (no diff job run); prints per-op counts"
        ),
    )
    ap.add_argument(
        "--compact-journal", type=int, nargs="?", const=64, default=None,
        metavar="TARGET_MB",
        help=(
            "compact the journal's per-event append files into TARGET_MB "
            "files per table (default 64) and exit — run between jobs, "
            "never concurrently with one; prints {table: n_files}"
        ),
    )
    args = ap.parse_args(argv)

    cfg = load_config(args.config)
    spark = get_spark("cassandra-diff-spark-job")

    if args.compact_journal is not None:
        from cassandra_diff_spark.journal import Journal, compact

        j = Journal(spark, cfg.metadata_options.path, cfg.retry_options)
        print(json.dumps(compact(j, target_mb=args.compact_journal)))
        return 0

    if args.drift_report is not None:
        from cassandra_diff_spark.job import table_drift_report

        table, job_a, job_b = args.drift_report
        out = {}
        for side in ("source", "target"):
            row = table_drift_report(
                spark, cfg, table, job_a, job_b, side=side
            ).collect()[0]
            out[side] = row.asDict()
        print(json.dumps({"table": table, "job_a": job_a, "job_b": job_b, **out}))
        return 0
    if args.profile is not None:
        from cassandra_diff_spark.operators.validate import profile_table
        from cassandra_diff_spark.sources.provider import get_provider

        table, side = args.profile
        if side not in ("source", "target"):
            print(f"profile side must be source|target, got {side}", file=sys.stderr)
            return 2
        sc = cfg.source if side == "source" else cfg.target
        df = get_provider(sc.provider, sc.options).read_table(spark, table)
        for r in profile_table(df, distinct="approx").collect():
            print(json.dumps(r.asDict()))
        return 0
    if args.validate:
        from cassandra_diff_spark.job import run_validation

        rows = run_validation(spark, cfg).collect()
        all_pass = True
        for r in rows:
            print(json.dumps(r.asDict()))
            all_pass = all_pass and r["pass"]
        return 0 if all_pass else 1
    if args.advise is not None:
        from cassandra_diff_spark.model import TableSpec
        from cassandra_diff_spark.plans.advisor import recommend_diff_strategy
        from cassandra_diff_spark.sources.catalog import table_config_for

        table = args.advise
        tcfg = table_config_for(cfg, table)
        if tcfg is None:
            print(f"no key roles configured for table {table}", file=sys.stderr)
            return 2
        if cfg.source.provider != "parquet" or cfg.target.provider != "parquet":
            print("--advise needs parquet path providers on both sides", file=sys.stderr)
            return 2
        spec = TableSpec(
            name=table,
            partition_key=tcfg.partition_key,
            clustering=tcfg.clustering,
        )
        out = recommend_diff_strategy(
            spark,
            f"{cfg.source.options['path']}/{table}.parquet",
            f"{cfg.target.options['path']}/{table}.parquet",
            spec,
            snapshot_path=cfg.snapshot_path,
        )
        print(json.dumps(out, default=str, indent=2))
        return 0
    if args.plan is not None:
        from cassandra_diff_spark.model import TableSpec
        from cassandra_diff_spark.plans.splits import balanced_splits
        from cassandra_diff_spark.sources.catalog import table_config_for
        from cassandra_diff_spark.sources.provider import get_provider

        table, n_splits = args.plan[0], int(args.plan[1])
        tcfg = table_config_for(cfg, table)
        if tcfg is None:
            print(f"no key roles configured for table {table}", file=sys.stderr)
            return 2
        src = get_provider(cfg.source.provider, cfg.source.options).read_table(
            spark, table
        )
        for s in balanced_splits(
            src, list(tcfg.partition_key), n_splits, cfg.buckets
        ):
            print(
                json.dumps(
                    {
                        "split_number": s.split_number,
                        "bucket": s.bucket,
                        "start": s.start,
                        "end": s.end,
                    }
                )
            )
        return 0
    if args.repair is not None:
        from pyspark.sql import functions as F

        from cassandra_diff_spark.model import TableSpec
        from cassandra_diff_spark.operators.diff import repair_actions
        from cassandra_diff_spark.sources.catalog import table_config_for
        from cassandra_diff_spark.sources.provider import get_provider

        table, out_path = args.repair
        tcfg = table_config_for(cfg, table)
        if tcfg is None:
            print(f"no key roles configured for table {table}", file=sys.stderr)
            return 2
        spec = TableSpec(
            name=table,
            partition_key=tcfg.partition_key,
            clustering=tcfg.clustering,
        )
        src = get_provider(cfg.source.provider, cfg.source.options).read_table(
            spark, table
        )
        tgt = get_provider(cfg.target.provider, cfg.target.options).read_table(
            spark, table
        )
        rep = repair_actions(src, tgt, spec)
        rep.write.mode("overwrite").parquet(out_path)
        counts = {
            r["op"]: r["n"]
            for r in spark.read.parquet(out_path)
            .groupBy("op")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        print(json.dumps({"table": table, "path": out_path, "ops": counts}))
        return 0
    result = run_job(
        spark,
        cfg,
        splits_per_table=args.splits_per_table,
        mid_split_chunks=args.mid_split_chunks,
        rerun=args.rerun,
        continue_on_error=args.continue_on_error,
    )
    for table, st in sorted(result.stats.items()):
        print(json.dumps({"table": table, **{f: getattr(st, f) for f in STAT_FIELDS}}))
    print(
        json.dumps(
            {
                "job_id": result.job_id,
                "tables": len(result.stats),
                "all_matches": result.all_matches,
            }
        )
    )
    if args.serve is not None:
        import threading

        from cassandra_diff_spark.http_api import start_server

        _, port = start_server(spark, cfg.metadata_options.path, args.serve)
        print(f"serving diff API on http://127.0.0.1:{port}", file=sys.stderr)
        threading.Event().wait()
    return 0 if result.all_matches else 1


if __name__ == "__main__":
    sys.exit(main())
