"""Driver contract for the spark-graft builder (PySpark target).

Thin wrapper over :mod:`cassandra_diff_spark.gate`, the oracle-paired query
registry. The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from cassandra_diff_spark import gate, gate_pipeline  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full 9-counter diff of the wide (clustered) lineitem pair,
    positional fail-fast parity mode, at sf0.001."""
    sf_dir = "/root/testdata/sf0.001"
    narrow = gate.QUERIES["diff_stats_orders"](spark, sf_dir)
    wide = gate.QUERIES["diff_stats_lineitem"](spark, sf_dir)
    return narrow.unionByName(wide)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {**gate.QUERIES, **gate_pipeline.QUERIES}


def oracle_sql() -> dict[str, str]:
    return {**gate.ORACLES, **gate_pipeline.ORACLES}
