"""cassandra_diff_spark — a PySpark-native table-diff / analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of apache/cassandra-diff (reference: /root/reference), plus the
operators a large-scale training-data pipeline needs (dedup, similarity
search, text analysis, multimodal plumbing).

Design stance (see SURVEY.md):
  * DataFrame/SQL declarative plans; Catalyst + AQE pick physical strategy.
  * The reference's hand-rolled streaming merge join (RangeComparator.java)
    and async comparison pool (ComparisonExecutor.java) are replaced by a
    single full-outer join + aggregation pipeline.
  * Designed for a 1000-executor / 100 TB cluster; tested on local[32].
"""

from cassandra_diff_spark.model import TableSpec, DiffStats, STAT_FIELDS
from cassandra_diff_spark.operators.diff import (
    DiffResult,
    build_diff,
    build_diff_common,
    repair_actions,
)

__all__ = [
    "TableSpec",
    "DiffStats",
    "STAT_FIELDS",
    "build_diff",
    "build_diff_common",
    "repair_actions",
    "DiffResult",
]

__version__ = "0.1.0"
