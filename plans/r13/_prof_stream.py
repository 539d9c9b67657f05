"""Round-13 streaming-progress profiler (VERDICT r12 #4): run a
streaming gate with a StreamingQueryListener attached and dump every
trigger's durationMs breakdown plus the stateOperators custom metrics
(commit vs lookup split) — the evidence base for the stateful addBatch
floor work.

Usage:
    python plans/r13/_prof_stream.py <gate_name> [reps]
    SPARK_GRAFT_SF_DIR=... (default sf0.1)
    SPARK_GRAFT_STATE_PROVIDER=rocksdb  (optional A/B lever)
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from pyspark.sql.streaming import StreamingQueryListener  # noqa: E402

from cassandra_diff_spark import gate, gate_pipeline  # noqa: E402
from cassandra_diff_spark.session import get_spark  # noqa: E402

ALL_QUERIES = gate_pipeline.ensure_stream_wrapped(
    {**gate.QUERIES, **gate_pipeline.QUERIES}
)


class Capture(StreamingQueryListener):
    def __init__(self):
        self.progress = []

    def onQueryStarted(self, event):
        pass

    def onQueryProgress(self, event):
        self.progress.append(json.loads(event.progress.json))

    def onQueryIdle(self, event):
        pass

    def onQueryTerminated(self, event):
        pass


def main() -> None:
    name = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("cds-r13-prof-stream")
    prov = os.environ.get("SPARK_GRAFT_STATE_PROVIDER")
    if prov == "rocksdb":
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming."
            "state.RocksDBStateStoreProvider",
        )
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    spark.range(0, 32, 1, 32).mapInPandas(lambda it: it, "id long").count()
    from cassandra_diff_spark import operators

    cap = Capture()
    spark.streams.addListener(cap)
    fn = ALL_QUERIES[name]
    for rep in range(reps):
        cap.progress.clear()
        t0 = time.perf_counter()
        try:
            df = fn(spark, sf_dir)
            n = df.count()
            wall = time.perf_counter() - t0
        finally:
            operators.release_caches()
            spark.catalog.clearCache()
        print(f"\n=== {name} rep{rep}: wall {wall:.3f}s rows {n} "
              f"triggers {len(cap.progress)} provider={prov or 'default'} ===")
        for p in cap.progress:
            d = p.get("durationMs", {})
            rows = p.get("numInputRows")
            line = (
                f"  batch {p.get('batchId')}: rows {rows:>7} "
                f"addBatch {d.get('addBatch', 0):>6} "
                f"plan {d.get('queryPlanning', 0):>5} "
                f"wal {d.get('walCommit', 0):>4} "
                f"off {d.get('commitOffsets', 0):>4} "
                f"getBatch {d.get('getBatch', 0):>4} "
                f"latestOffset {d.get('latestOffset', 0):>4} "
                f"trigger {d.get('triggerExecution', 0):>6}"
            )
            print(line)
            for so in p.get("stateOperators", []):
                cm = so.get("customMetrics", {})
                print(
                    f"    state[{so.get('operatorName')}] keys "
                    f"{so.get('numTotalStateRows')} commitMs "
                    f"{so.get('commitTimeMs')} updateMs "
                    f"{so.get('allUpdatesTimeMs')} removeMs "
                    f"{so.get('allRemovalsTimeMs')} "
                    + " ".join(f"{k}={v}" for k, v in sorted(cm.items()) if v)
                )
    spark.stop()


if __name__ == "__main__":
    main()
