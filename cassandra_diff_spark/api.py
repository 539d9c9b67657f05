"""Read-side metadata query surface — the 13 REST endpoints of the
reference api-server (DiffJobsResource.java:60-201, DBService.java:166-339)
as DataFrame functions over the journal tables.

The reference fans out one async query per (table, bucket) and merges
client-side (DBService.java:201-247) because Cassandra lacks server-side
aggregation; here each endpoint is a single Spark query — the fan-out and
the four manual index tables disappear (J5: plain predicates on
job_summary replace index lookups).

Each function returns a DataFrame (call ``.toJSON()`` for the REST
shapes, README.md:66-96); an HTTP shim would be a thin layer on top.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cassandra_diff_spark.journal import Journal
from cassandra_diff_spark.model import STAT_FIELDS


class JournalQueries:
    def __init__(self, spark: SparkSession, journal_path: str):
        self.spark = spark
        self.journal = Journal(spark, journal_path)

    def _read(self, name: str) -> DataFrame:
        df = self.journal._read(name)
        if df is None:
            raise FileNotFoundError(f"journal table {name} does not exist yet")
        return df

    # ------------------------------------------------------------- jobs

    def running_jobs(self) -> list[str]:
        """GET /jobs/running (DiffJobsResource.java:60-66): one entry per
        held per-job mutex marker."""
        return self.journal.running_job_ids()

    def running_job_summaries(self) -> DataFrame:
        """GET /jobs/running (DiffJobsResource.java:67-72): full summary
        rows for currently-running jobs. A fresh journal with no jobs yet
        returns an EMPTY frame, not 404 — reference parity
        (DiffJobsResource returns an empty list)."""
        from cassandra_diff_spark.journal import JOB_SUMMARY_SCHEMA

        ids = self.running_jobs()
        df = self.journal._read("job_summary")
        if df is None:
            return self.spark.createDataFrame([], JOB_SUMMARY_SCHEMA)
        return df.filter(F.col("job_id").isin(ids)) if ids else df.limit(0)

    def recent_jobs(self, limit: int = 10) -> DataFrame:
        """GET /jobs/recent (DiffJobsResource.java:77-92). The reference's
        widening 30/60/90-day window loop collapses to orderBy+limit over
        the date-partitioned summary (O4)."""
        return self._read("job_summary").orderBy(F.col("start").desc()).limit(limit)

    def job_summary(self, job_id: str) -> DataFrame:
        """GET /jobs/{id} (DiffJobsResource.java:94-99)."""
        return self._read("job_summary").filter(F.col("job_id") == job_id)

    def job_results(self, job_id: str) -> DataFrame:
        """GET /jobs/{id}/results (DiffJobsResource.java:101-106):
        per-table 9-counter stats."""
        return (
            self._read("job_results")
            .filter(F.col("job_id") == job_id)
            .select("table", *STAT_FIELDS)
            .orderBy("table")
        )

    def job_status(self, job_id: str) -> DataFrame:
        """GET /jobs/{id}/status (% complete): completed units per table —
        the derived counter view (A6) vs the planned split count."""
        summary = self.job_summary(job_id).select("job_id", "splits").limit(1)
        done = self.journal.completed_count(job_id)
        return done.join(summary, "job_id").select(
            "qualified_table_name", "completed", F.col("splits").alias("total_planned")
        )

    # -------------------------------------------------------- mismatches

    def mismatches(self, job_id: str) -> DataFrame:
        """GET /jobs/{id}/mismatches (DiffJobsResource.java:108-117)."""
        return (
            self._read("mismatches")
            .filter(F.col("job_id") == job_id)
            .orderBy("qualified_table_name", "token")
        )

    # ------------------------------------------------------------ errors

    def error_summary(self, job_id: str) -> DataFrame:
        """GET /jobs/{id}/errors/summary — count per table (A7,
        DBService.java:122-128: the client-side Map.merge becomes a
        groupBy)."""
        return (
            self._read("task_errors")
            .filter(F.col("job_id") == job_id)
            .groupBy("qualified_table_name")
            .agg(F.count("*").cast("long").alias("error_count"))
        )

    def error_ranges(self, job_id: str) -> DataFrame:
        """GET /jobs/{id}/errors/ranges (DiffJobsResource.java:139-149)."""
        return (
            self._read("task_errors")
            .filter(F.col("job_id") == job_id)
            .select("qualified_table_name", "bucket", "split")
            .orderBy("qualified_table_name", "split")
        )

    def error_details(self, job_id: str) -> DataFrame:
        """GET /jobs/{id}/errors/detail — per-token detail with
        source-cluster attribution (DBService.java:264-285)."""
        return (
            self._read("partition_errors")
            .filter(F.col("job_id") == job_id)
            .orderBy("qualified_table_name", "token")
        )

    # -------------------------------------------- index-replacement scans

    def jobs_started_between(self, start_date: str, end_date: str = "9999-12-31") -> DataFrame:
        """GET /jobs/by-start-date/{after}[/{before}]
        (DiffJobsResource.java:143-163; replaces the day+hour fan-out of
        DBService.java:287-297). One-arg form = open upper bound."""
        return self._read("job_summary").filter(
            (F.col("start_date") >= start_date) & (F.col("start_date") <= end_date)
        )

    def jobs_by_source_cluster(self, name: str) -> DataFrame:
        """GET /jobs/sourceCluster/{name} (J5 index table replaced by a
        predicate)."""
        return self._read("job_summary").filter(F.col("source_cluster_name") == name)

    def jobs_by_target_cluster(self, name: str) -> DataFrame:
        return self._read("job_summary").filter(F.col("target_cluster_name") == name)

    def jobs_by_keyspace(self, keyspace: str) -> DataFrame:
        """GET /jobs/keyspace/{ks}: match against the job's table list."""
        return self._read("job_summary").filter(
            F.col("keyspace_tables").contains(keyspace)
        )

    # ------------------------------------------------------------- health

    def health(self) -> dict:
        """GET /__health (HealthResource.java:36-47)."""
        try:
            ok = os.path.isdir(self.journal.path)
            return {"status": "healthy" if ok else "unhealthy"}
        except Exception:  # noqa: BLE001
            return {"status": "unhealthy"}
