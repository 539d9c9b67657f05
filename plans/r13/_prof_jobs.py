"""Round-13 job-timeline profiler (guide §1.1/§7.1): run one gate and
dump its Spark job/stage timeline from the UI REST API — job count,
per-job wall time, gaps (driver-side serial time), and per-stage task
parallelism. This is the evidence tool for serial-stage-chain floors
(profile_spearman, classifier_train, the dedup ratio-1 pair).

Usage:
    python plans/r13/_prof_jobs.py <gate_name> [reps]
    SPARK_GRAFT_SF_DIR=... (default sf0.1)
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from cassandra_diff_spark import gate, gate_pipeline  # noqa: E402
from cassandra_diff_spark.session import get_spark  # noqa: E402

ALL_QUERIES = gate_pipeline.ensure_stream_wrapped(
    {**gate.QUERIES, **gate_pipeline.QUERIES}
)


def _rest(spark, path):
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app}{path}") as r:
        return json.loads(r.read())


def main() -> None:
    name = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("cds-r13-prof", extra_conf={"spark.ui.enabled": "true"})
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    spark.range(0, 32, 1, 32).mapInPandas(lambda it: it, "id long").count()
    from cassandra_diff_spark import operators

    fn = ALL_QUERIES[name]
    for rep in range(reps):
        jobs_before = {j["jobId"] for j in _rest(spark, "/jobs")}
        spark.sparkContext.setJobDescription(f"r13-prof:{name}:rep{rep}")
        t0 = time.perf_counter()
        try:
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            wall = time.perf_counter() - t0
        finally:
            operators.release_caches()
            spark.catalog.clearCache()
        jobs = [
            j for j in _rest(spark, "/jobs") if j["jobId"] not in jobs_before
        ]
        jobs.sort(key=lambda j: j["jobId"])
        print(f"\n=== {name} rep{rep}: wall {wall:.3f}s, {len(jobs)} jobs ===")
        prev_end = None
        fmt = "%Y-%m-%dT%H:%M:%S.%f"

        def ts(s):
            return time.mktime(time.strptime(s[:-3], fmt)) + float("0." + s[20:23])

        for j in jobs:
            t_sub = ts(j["submissionTime"])
            t_end = ts(j["completionTime"]) if "completionTime" in j else t_sub
            gap = (t_sub - prev_end) if prev_end is not None else 0.0
            prev_end = t_end
            print(
                f"  job {j['jobId']:4d} dur {t_end - t_sub:7.3f}s gap {gap:7.3f}s "
                f"tasks {j['numCompletedTasks']:4d} stages {len(j['stageIds'])}"
            )
    spark.stop()


if __name__ == "__main__":
    main()
