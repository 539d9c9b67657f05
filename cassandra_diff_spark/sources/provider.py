"""Pluggable source providers — the engine's analog of the reference's
reflective ClusterProvider factory (common/.../ClusterProvider.java:27-45,
ContactPointsClusterProvider.java:26-79).

A provider maps (table name -> DataFrame) for one side of the diff.
Selected by name from JobConfig.source/target; third parties register via
:func:`register_provider` (same extension-point shape as the reference's
``impl:`` class-name config).
"""

from __future__ import annotations

from typing import Callable, Dict, Protocol

from pyspark.sql import DataFrame, SparkSession


class SourceProvider(Protocol):
    def read_table(self, spark: SparkSession, table: str) -> DataFrame: ...

    def list_tables(self, spark: SparkSession) -> list[str]: ...


_REGISTRY: Dict[str, Callable[[dict], "SourceProvider"]] = {}


def register_provider(name: str, factory: Callable[[dict], "SourceProvider"]) -> None:
    _REGISTRY[name] = factory


def get_provider(name: str, options: dict) -> "SourceProvider":
    """Reference: ClusterProvider.getProvider(conf, identifier)."""
    if name not in _REGISTRY:
        raise ValueError(f"unknown source provider {name!r}; known: {sorted(_REGISTRY)}")
    return _REGISTRY[name](options)


class ParquetSourceProvider:
    """Reads ``{path}/{table}.parquet``; the default file-based side."""

    def __init__(self, options: dict):
        self.path = options["path"]

    def read_table(self, spark: SparkSession, table: str) -> DataFrame:
        return spark.read.parquet(f"{self.path}/{table}.parquet")

    def list_tables(self, spark: SparkSession) -> list[str]:
        import os

        return sorted(
            f[: -len(".parquet")]
            for f in os.listdir(self.path)
            if f.endswith(".parquet")
        )


class FormatSourceProvider:
    """Any Spark-native batch file format at ``{path}/{table}.{ext}`` —
    ``orc`` / ``json`` / ``csv`` out of the box (plus ``avro`` when its
    package is on the classpath): the migration sides a real diff often
    has ("the legacy export is CSV, the new lake is parquet").

    Options besides ``path``/``format``/``schema`` pass straight through
    to the DataFrameReader (``header``, ``delimiter``, ...). CSV and
    JSON are schema-on-read: give ``schema`` (a DDL string) for
    type-exact diffs — inferred types can disagree with the typed side
    and surface as spurious value mismatches, which is a property of
    the FORMAT, not the diff.
    """

    def __init__(self, options: dict):
        self.path = options["path"]
        self.fmt = options["format"]
        self.schema = options.get("schema")
        self.reader_options = {
            k: v
            for k, v in options.items()
            if k not in ("path", "format", "schema")
        }

    def read_table(self, spark: SparkSession, table: str) -> DataFrame:
        r = spark.read.format(self.fmt).options(**self.reader_options)
        if self.schema:
            r = r.schema(self.schema)
        return r.load(f"{self.path}/{table}.{self.fmt}")

    def list_tables(self, spark: SparkSession) -> list[str]:
        import os

        suffix = f".{self.fmt}"
        return sorted(
            f[: -len(suffix)]
            for f in os.listdir(self.path)
            if f.endswith(suffix)
        )


class CatalogSourceProvider:
    """Reads from the Spark catalog (``database`` option); auto-discovery
    via spark.catalog.listTables (reference Schema.java:27-38)."""

    def __init__(self, options: dict):
        self.database = options.get("database", "default")

    def read_table(self, spark: SparkSession, table: str) -> DataFrame:
        return spark.table(f"{self.database}.{table}")

    def list_tables(self, spark: SparkSession) -> list[str]:
        return sorted(t.name for t in spark.catalog.listTables(self.database))


class CassandraSourceProvider:
    """Cassandra connector source — requires the spark-cassandra-connector
    jar on the classpath (not present in this container; import-gated).

    With the connector, reads use its native token-range scans and filter
    pushdown (the connector subsumes the reference's hand-rolled
    token-window CQL, DiffCluster.java:214-251).

    Two-cluster diffs (the reference's whole point) work from ONE
    SparkSession because connection settings are passed PER READ, not
    session-wide: any ``spark.cassandra.*`` key in ``options`` (plus the
    ``contact_points``/``port`` shortcuts, named as in the reference's
    ContactPointsClusterProvider config) is forwarded to the reader, so
    source and target providers can point at different clusters.

    Credentials follow the reference's env-var convention
    (README.md "Environment variables"):
    ``diff.cluster.<identifier>.cql_user`` / ``..cql_password``, with
    ``identifier`` taken from options (default ``source``). Explicit
    ``username``/``password`` options win over the environment.
    """

    def __init__(self, options: dict):
        import os

        self.keyspace = options["keyspace"]
        self.options = options
        ident = options.get("identifier", "source")
        conn = {
            k: str(v)
            for k, v in options.items()
            if k.startswith("spark.cassandra.")
        }
        if "contact_points" in options:
            conn["spark.cassandra.connection.host"] = str(options["contact_points"])
        if "port" in options:
            conn["spark.cassandra.connection.port"] = str(options["port"])
        user = options.get("username") or os.environ.get(
            f"diff.cluster.{ident}.cql_user"
        )
        password = options.get("password") or os.environ.get(
            f"diff.cluster.{ident}.cql_password"
        )
        if user:
            conn["spark.cassandra.auth.username"] = user
        if password:
            conn["spark.cassandra.auth.password"] = password
        self.conn = conn

    def read_table(self, spark: SparkSession, table: str) -> DataFrame:
        try:
            return (
                spark.read.format("org.apache.spark.sql.cassandra")
                .options(keyspace=self.keyspace, table=table, **self.conn)
                .load()
            )
        except Exception as e:  # pragma: no cover - connector not in image
            raise RuntimeError(
                "cassandra source requires the spark-cassandra-connector jar "
                "on the classpath"
            ) from e

    def list_tables(self, spark: SparkSession) -> list[str]:
        """Auto-discovery from cluster metadata: the connector's view of
        ``system_schema.tables`` filtered to this keyspace (reference:
        Schema.java:27-38 reads the same system table via the driver).
        Requires the connector jar; without it the underlying
        ``format(...).load()`` fails and is re-raised with context."""
        try:
            df = (
                spark.read.format("org.apache.spark.sql.cassandra")
                .options(keyspace="system_schema", table="tables", **self.conn)
                .load()
            )
            rows = (
                df.filter(df.keyspace_name == self.keyspace)
                .select("table_name")
                .collect()
            )
        except Exception as e:
            raise RuntimeError(
                "cassandra table discovery requires the "
                "spark-cassandra-connector jar on the classpath"
            ) from e
        return sorted(f"{self.keyspace}.{r.table_name}" for r in rows)


register_provider("parquet", ParquetSourceProvider)
register_provider("orc", lambda o: FormatSourceProvider({**o, "format": "orc"}))
register_provider("csv", lambda o: FormatSourceProvider({**o, "format": "csv"}))
register_provider("json", lambda o: FormatSourceProvider({**o, "format": "json"}))
register_provider("catalog", CatalogSourceProvider)
register_provider("cassandra", CassandraSourceProvider)
