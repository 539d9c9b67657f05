"""Schema-level set operations and table-list resolution.

Reference parity:
  * auto-discovery = intersect both sides' table sets, minus system
    keyspaces and disallowed keyspaces (Schema.java:21-50, 61-68;
    DiffJob.java:104-116)
  * intersect / difference set ops (Schema.java:44-50, 73-75 — J4/O6)
  * keyspace disallow filter (JobConfiguration.filteredKeyspaceTables,
    JobConfiguration.java:54-63 — P6)
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from cassandra_diff_spark.config import JobConfig, TableConfig
from cassandra_diff_spark.sources.provider import SourceProvider, get_provider

#: reference filters these fixed keyspaces (Schema.java:21-23)
SYSTEM_KEYSPACES = {
    "system",
    "system_schema",
    "system_auth",
    "system_distributed",
    "system_traces",
}


def intersect_tables(source: list[str], target: list[str]) -> list[str]:
    """J4: common tables of both sides (commutative — SchemaTest.java:39-57)."""
    return sorted(set(source) & set(target))


def difference_tables(source: list[str], target: list[str]) -> list[str]:
    """O6: symmetric difference (Schema.java:73-75)."""
    return sorted(set(source) ^ set(target))


def _keyspace_of(table: str) -> str:
    return table.split(".", 1)[0] if "." in table else ""


def filter_disallowed(tables: list[str], disallowed: tuple[str, ...]) -> list[str]:
    """P6: drop system + configured keyspaces (union of both filters,
    Schema.java:61-68)."""
    banned = SYSTEM_KEYSPACES | set(disallowed)
    return [t for t in tables if _keyspace_of(t) not in banned]


def resolve_tables(
    spark: SparkSession, cfg: JobConfig
) -> tuple[list[str], SourceProvider, SourceProvider]:
    """Table-list resolution (DiffJob.java:104-116): explicit list
    (filtered) or auto-discovery by schema intersection."""
    src = get_provider(cfg.source.provider, cfg.source.options)
    tgt = get_provider(cfg.target.provider, cfg.target.options)
    if cfg.keyspace_tables is not None:
        names = [t.name for t in cfg.keyspace_tables]
        names = filter_disallowed(names, cfg.disallowed_keyspaces)
    else:
        names = intersect_tables(src.list_tables(spark), tgt.list_tables(spark))
        names = filter_disallowed(names, cfg.disallowed_keyspaces)
    return names, src, tgt


def table_config_for(cfg: JobConfig, name: str) -> TableConfig | None:
    for t in cfg.keyspace_tables or ():
        if t.name == name:
            return t
    return None
