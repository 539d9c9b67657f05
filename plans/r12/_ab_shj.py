"""Round-12 A/B: allow shuffled-hash joins (guide §3.1 / §9) vs baseline.

Variant B sets, at runtime inside the same session:
  spark.sql.join.preferSortMergeJoin=false        (static planner may pick SHJ
                                                   when its size conditions hold)
  spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold=64m
                                                  (AQE rewrites SMJ->SHJ at
                                                   runtime when EVERY post-
                                                   shuffle partition fits)

Both are size-guarded decisions: at 100 TB an oversized build side keeps
SortMergeJoin, so this is strategy selection, not a local[32] tune.

Interleaved within one session (A,B,A,B per gate, 3 noop reps each leg,
cache hygiene between reps) so machine drift cancels — the methodology the
continuation session used on this degradation-prone sandbox.

Usage: python plans/r12/_ab_shj.py <gate> [<gate> ...]
"""

from __future__ import annotations

import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from cassandra_diff_spark import gate, gate_pipeline  # noqa: E402
from cassandra_diff_spark.session import get_spark  # noqa: E402

ALL_QUERIES = gate_pipeline.ensure_stream_wrapped(
    {**gate.QUERIES, **gate_pipeline.QUERIES}
)

#: SPARK_GRAFT_SHJ_VARIANT=aqe  -> B sets only the AQE runtime rewrite
#:   (measured post-shuffle partition sizes guard the hash build — the
#:   safe form at 100 TB where static estimates after opaque UDFs lie)
#: SPARK_GRAFT_SHJ_VARIANT=full -> B additionally flips the static
#:   planner preference (guide §9 baseline)
_VARIANT = os.environ.get("SPARK_GRAFT_SHJ_VARIANT", "aqe")
CONFS = {
    "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold": ("0", "64m"),
}
if _VARIANT == "full":
    CONFS["spark.sql.join.preferSortMergeJoin"] = ("true", "false")


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("cds-r12-ab-shj")
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    spark.range(0, 32, 1, 32).mapInPandas(lambda it: it, "id long").count()
    gate._stage_bucketed_lineitem_pair(
        spark, sf_dir, f"/tmp/cds_gate_bucketed_{Path(sf_dir).name}"
    )
    from cassandra_diff_spark import operators

    results: dict[str, dict[str, list[float]]] = {}
    plans: dict[str, dict[str, str]] = {}
    for name in names:
        fn = ALL_QUERIES[name]
        results[name] = {"A": [], "B": []}
        plans[name] = {}
        for leg in ("A", "B", "A", "B"):
            idx = 0 if leg == "A" else 1
            for k, vals in CONFS.items():
                spark.conf.set(k, vals[idx])
            spark.sparkContext.setJobDescription(f"ab-shj:{name}:{leg}")
            for _ in range(3):
                t0 = time.perf_counter()
                try:
                    df = fn(spark, sf_dir)
                    df.write.format("noop").mode("overwrite").save()
                    results[name][leg].append(time.perf_counter() - t0)
                    if leg not in plans[name]:
                        plans[name][leg] = df._sc._jvm.PythonSQLUtils.explainString(
                            df._jdf.queryExecution(), "formatted"
                        )
                finally:
                    operators.release_caches()
                    spark.catalog.clearCache()
        a, b = results[name]["A"], results[name]["B"]
        pa = plans[name].get("A", "")
        pb = plans[name].get("B", "")
        print(
            f"{name}: A(median {statistics.median(a):.3f} of {[round(t,2) for t in a]}) "
            f"B(median {statistics.median(b):.3f} of {[round(t,2) for t in b]}) "
            f"SMJ A={pa.count('SortMergeJoin')} B={pb.count('SortMergeJoin')} "
            f"SHJ A={pa.count('ShuffledHashJoin')} B={pb.count('ShuffledHashJoin')}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
