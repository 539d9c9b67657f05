"""Skip-gated Cassandra-connector integration test (VERDICT r2 #8).

The build container has neither the spark-cassandra-connector jar nor a
Cassandra to talk to, so the live half of this module SKIPS unless both
are present (set CDS_CASSANDRA_TEST=1 after `examples/cassandra_e2e/
docker-compose.yaml` is up and the connector jar is on the classpath —
see examples/cassandra_e2e/run_e2e.sh for the full recipe).

What ALWAYS runs here is the provider's option-plumbing contract: the
per-read connection dict that makes two-cluster diffs possible from one
SparkSession (reference: one DiffCluster per side,
DiffCluster.java:110-140) is pure Python and fully testable without a
cluster.
"""

from __future__ import annotations

import os

import pytest

from cassandra_diff_spark.sources.provider import (
    CassandraSourceProvider,
    get_provider,
)

LIVE = os.environ.get("CDS_CASSANDRA_TEST") == "1"


class TestConnectionOptionPlumbing:
    def test_contact_points_and_port_become_connector_options(self):
        p = CassandraSourceProvider(
            {"keyspace": "ks", "contact_points": "10.0.0.5", "port": 9043}
        )
        assert p.conn["spark.cassandra.connection.host"] == "10.0.0.5"
        assert p.conn["spark.cassandra.connection.port"] == "9043"

    def test_two_providers_carry_distinct_clusters(self):
        src = get_provider(
            "cassandra",
            {"keyspace": "ks", "contact_points": "src-host", "port": 9042},
        )
        tgt = get_provider(
            "cassandra",
            {"keyspace": "ks", "contact_points": "tgt-host", "port": 9043},
        )
        assert src.conn["spark.cassandra.connection.host"] == "src-host"
        assert tgt.conn["spark.cassandra.connection.host"] == "tgt-host"
        assert src.conn != tgt.conn

    def test_reference_env_var_credentials(self, monkeypatch):
        """README 'Environment variables': diff.cluster.<id>.cql_user."""
        monkeypatch.setenv("diff.cluster.target.cql_user", "envuser")
        monkeypatch.setenv("diff.cluster.target.cql_password", "envpass")
        p = CassandraSourceProvider({"keyspace": "ks", "identifier": "target"})
        assert p.conn["spark.cassandra.auth.username"] == "envuser"
        assert p.conn["spark.cassandra.auth.password"] == "envpass"

    def test_explicit_credentials_win_over_env(self, monkeypatch):
        monkeypatch.setenv("diff.cluster.source.cql_user", "envuser")
        p = CassandraSourceProvider(
            {"keyspace": "ks", "username": "optuser", "password": "optpass"}
        )
        assert p.conn["spark.cassandra.auth.username"] == "optuser"

    def test_passthrough_spark_cassandra_keys(self):
        p = CassandraSourceProvider(
            {"keyspace": "ks", "spark.cassandra.input.fetch.sizeInRows": 5000}
        )
        assert p.conn["spark.cassandra.input.fetch.sizeInRows"] == "5000"

    def test_read_without_jar_raises_with_guidance(self, spark):
        p = CassandraSourceProvider({"keyspace": "ks"})
        with pytest.raises(RuntimeError, match="spark-cassandra-connector"):
            p.read_table(spark, "t")


@pytest.mark.skipif(
    not LIVE, reason="needs connector jar + live clusters (CDS_CASSANDRA_TEST=1)"
)
class TestLiveTwoClusterDiff:
    """The run_e2e.sh flow as a pytest: identical stress data on both
    clusters must fully match (reference README.md FINISHED line)."""

    def test_stress_tables_match(self, spark, tmp_path):
        import dataclasses

        from cassandra_diff_spark.config import load_config
        from cassandra_diff_spark.job import run_job

        cfg = load_config(
            os.path.join(
                os.path.dirname(__file__), "..", "examples", "cassandra_e2e", "job.yaml"
            )
        )
        cfg = dataclasses.replace(
            cfg,
            metadata_options=dataclasses.replace(
                cfg.metadata_options, path=str(tmp_path / "journal")
            ),
        )
        result = run_job(spark, cfg, splits_per_table=4)
        st = result.stats["standard1"]
        assert st.matched_partitions == 1000
        assert st.matched_rows == 1000
        assert st.matched_values % st.matched_rows == 0
        assert st.mismatched_values == 0
        assert result.all_matches
