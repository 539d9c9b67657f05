"""End-to-end HTTP surface: run a real job into a journal, serve it, and
curl every endpoint of the reference REST API
(DiffJobsResource.java:46-201 + HealthResource.java) through the shim.
"""

from __future__ import annotations

import json
import urllib.request

import pytest

from cassandra_diff_spark.http_api import start_server
from cassandra_diff_spark.journal import Journal


@pytest.fixture(scope="module")
def served(spark, sf_dir, tmp_path_factory):
    from tests.test_job_layer import make_cfg
    from cassandra_diff_spark.job import run_job
    from pyspark.sql import functions as F

    base = tmp_path_factory.mktemp("httpapi")
    src_dir, tgt_dir = str(base / "src"), str(base / "tgt")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    orders.write.parquet(f"{src_dir}/orders.parquet")
    orders.filter(F.col("o_orderkey") % 97 != 0).write.parquet(f"{tgt_dir}/orders.parquet")
    jdir = str(base / "journal")
    run_job(spark, make_cfg(src_dir, tgt_dir, jdir, job_id="http-job"))
    j = Journal(spark, jdir)
    j.record_error("http-job", 0, "orders", 0, token=777,
                   error="read timeout", error_source="SOURCE")
    j.try_acquire_running("live-job")  # a concurrently-running job
    server, port = start_server(spark, jdir, port=0)
    yield f"http://127.0.0.1:{port}"
    server.shutdown()


def get(base, path):
    with urllib.request.urlopen(base + path) as r:
        return r.status, json.loads(r.read())


class TestEndpoints:
    def test_health(self, served):
        assert get(served, "/__health") == (200, {"status": "healthy"})

    def test_running(self, served):
        assert get(served, "/jobs/running/id") == (200, ["live-job"])
        # live-job has no summary row (never init'ed) -> empty summaries
        assert get(served, "/jobs/running") == (200, [])

    def test_job_summary_and_recent(self, served):
        code, rows = get(served, "/jobs/recent")
        assert code == 200 and rows[0]["job_id"] == "http-job"
        code, rows = get(served, "/jobs/http-job")
        assert code == 200 and len(rows) == 1
        assert json.loads(rows[0]["keyspace_tables"]) == ["orders"]

    def test_results_shape(self, served):
        code, rows = get(served, "/jobs/http-job/results")
        assert code == 200 and rows[0]["table"] == "orders"
        assert rows[0]["only_in_source"] > 0
        assert set(rows[0]) >= {"matched_partitions", "mismatched_values"}

    def test_status(self, served):
        code, rows = get(served, "/jobs/http-job/status")
        assert code == 200
        assert rows[0]["completed"] == 1 and rows[0]["total_planned"] == 1

    def test_mismatches(self, served):
        code, rows = get(served, "/jobs/http-job/mismatches")
        assert code == 200 and len(rows) > 0
        assert rows[0]["mismatch_type"] in {"ONLY_IN_SOURCE", "ONLY_IN_TARGET", "VALUES"}

    def test_errors_detail_summary_ranges(self, served):
        code, rows = get(served, "/jobs/http-job/errors")
        assert code == 200 and rows[0]["error_source"] == "SOURCE"
        code, rows = get(served, "/jobs/http-job/errors/summary")
        assert code == 200 and rows[0]["error_count"] == 1
        code, rows = get(served, "/jobs/http-job/errors/ranges")
        assert code == 200 and rows[0]["split"] == 0

    def test_index_scans(self, served):
        assert len(get(served, "/jobs/by-source-cluster/parquet")[1]) == 1
        assert get(served, "/jobs/by-source-cluster/cassandra")[1] == []
        assert len(get(served, "/jobs/by-target-cluster/parquet")[1]) == 1
        assert len(get(served, "/jobs/by-keyspace/orders")[1]) == 1
        assert get(served, "/jobs/by-keyspace/nope")[1] == []

    def test_by_start_date(self, served):
        assert len(get(served, "/jobs/by-start-date/2000-01-01")[1]) == 1
        assert len(get(served, "/jobs/by-start-date/2000-01-01/2100-01-01")[1]) == 1
        assert get(served, "/jobs/by-start-date/2999-01-01")[1] == []

    def test_unknown_endpoint_404(self, served):
        with pytest.raises(urllib.error.HTTPError) as e:
            get(served, "/nope")
        assert e.value.code == 404

    def test_missing_journal_table_404(self, spark, tmp_path):
        server, port = start_server(spark, str(tmp_path / "empty_journal"), port=0)
        try:
            with pytest.raises(urllib.error.HTTPError) as e:
                get(f"http://127.0.0.1:{port}", "/jobs/recent")
            assert e.value.code == 404
        finally:
            server.shutdown()
