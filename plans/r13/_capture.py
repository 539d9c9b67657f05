"""Round-13 measurement harness: capture .explain("formatted") and a
noop-sink timing for named gate queries (guide §1.1/§1.4/§1.5).

Usage:
    python plans/r13/_capture.py before diff_stats_orders profile_spearman ...
    python plans/r13/_capture.py after  profile_spearman
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 ... (default sf0.1)

Writes plans/r13/<name>_<tag>.txt containing the formatted plan plus the
noop-sink wall time (median of 3, caches released between reps — the
bench's hygiene rules). Streaming gates (drained to a memory table) have
no single final plan; for them we record the drained-frame plan and the
end-to-end drain time.
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

OUT_DIR = Path(__file__).resolve().parent


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("cds-r13-capture")
    # same warm-up as bench.py: JVM, parquet footers, Arrow workers
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    spark.range(0, 32, 1, 32).mapInPandas(lambda it: it, "id long").count()
    gate._stage_bucketed_lineitem_pair(
        spark, sf_dir, f"/tmp/cds_gate_bucketed_{Path(sf_dir).name}"
    )
    from cassandra_diff_spark import operators

    for name in names:
        fn = ALL_QUERIES[name]
        spark.sparkContext.setJobDescription(f"r13-capture:{name}")
        ts = []
        plan = None
        for _ in range(3):
            t0 = time.perf_counter()
            try:
                df = fn(spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                ts.append(time.perf_counter() - t0)
                if plan is None:
                    plan = df._sc._jvm.PythonSQLUtils.explainString(
                        df._jdf.queryExecution(), "formatted"
                    )
            finally:
                operators.release_caches()
                spark.catalog.clearCache()
        med = statistics.median(ts)
        out = OUT_DIR / f"{name}_{tag}.txt"
        out.write_text(
            f"# {name} [{tag}] sf_dir={sf_dir}\n"
            f"# noop-sink seconds: median {med:.3f} of "
            f"{[round(t, 3) for t in ts]}\n\n{plan}\n"
        )
        print(f"{name}: {med:.3f}s -> {out.name}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
