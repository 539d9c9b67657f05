"""YAML job configuration — same surface as the reference's
JobConfiguration (common/.../JobConfiguration.java:33-110, loaded by
YamlJobConfiguration.java:34-57), adapted to Spark sources.

Keys carried over: keyspace_tables (None => auto-discovery), splits,
buckets, rate_limit, specific_tokens (+ mode), disallowed_keyspaces,
partition_sampling_probability, reverse_read_probability, job_id,
metadata_options, retry_options, plus per-side source configs replacing
the reference's cluster configs (S6: pluggable provider by name).
"""

from __future__ import annotations

import uuid
from dataclasses import dataclass, field
from typing import Optional

import yaml


@dataclass(frozen=True)
class SourceConfig:
    """One side's data source (reference: ClusterProvider impl + contact
    points, ContactPointsClusterProvider.java:26-79). ``provider`` selects
    a registered SourceProvider (sources/provider.py); ``options`` are
    provider-specific (e.g. path for parquet, keyspace/contact points for
    a Cassandra connector)."""

    provider: str = "parquet"
    options: dict = field(default_factory=dict)


@dataclass(frozen=True)
class RetryOptions:
    """Reference: ExponentialRetryStrategyProvider.java:32-121."""

    impl: str = "exponential"  # or "none"
    base_delay_ms: int = 1000
    total_delay_ms: int = 1_800_000


@dataclass(frozen=True)
class MetadataOptions:
    """Journal location (replaces the metadata keyspace,
    JobMetadataDb.java:493-652)."""

    path: str = "/tmp/cds_journal"
    ttl_seconds: int = 31_536_000  # localconfig.yaml:29


@dataclass(frozen=True)
class TableConfig:
    name: str
    partition_key: tuple[str, ...]
    clustering: tuple[str, ...] = ()


@dataclass(frozen=True)
class ValidationRuleConfig:
    """One declarative data-quality rule (operators/validate.py) in YAML
    form. ``kind`` ∈ {not_null, accepted_values, in_range, regex_match,
    expr, unique, foreign_key}; ``expr`` rules carry a SQL boolean
    expression that must hold per row (``expr: "o_totalprice >= 0"``).
    ``foreign_key`` references another table read through the SAME
    side's provider."""

    kind: str
    columns: tuple = ()
    values: tuple = ()
    lo: Optional[float] = None
    hi: Optional[float] = None
    pattern: Optional[str] = None
    expr: Optional[str] = None
    name: Optional[str] = None
    ref_table: Optional[str] = None
    ref_columns: tuple = ()


@dataclass(frozen=True)
class ValidationConfig:
    """Rules for one table; ``side`` picks which cluster's copy is
    checked (``source`` / ``target`` / ``both``)."""

    table: str
    rules: tuple
    side: str = "both"


@dataclass(frozen=True)
class JobConfig:
    source: SourceConfig
    target: SourceConfig
    keyspace_tables: Optional[tuple[TableConfig, ...]] = None  # None => discover
    disallowed_keyspaces: tuple[str, ...] = ()
    splits: int = 10_000  # YamlJobConfiguration.java:35
    buckets: int = 100  # YamlJobConfiguration.java:38
    rate_limit: int = 10_000  # localconfig.yaml:13 (advisory for file sources)
    specific_tokens: tuple[int, ...] = ()
    specific_tokens_mode: str = "ACCEPT"  # SpecificTokens.java modes
    partition_sampling_probability: float = 1.0
    reverse_read_probability: float = 0.0  # order-invariance check rate
    job_id: str = ""
    align: str = "set"
    skew_safe: bool = False  # shuffle on pk+clustering for hot partitions
    # digest-pruned two-phase diff (operators/digest.py): 0 disables; >0 =
    # bucket count for the phase-1 content digests. Ignored (with a
    # warning) when sampling/token filters are active — those change which
    # keys are visible, which the digest credit can't reproduce.
    digest_buckets: int = 0
    # declare pk(+clustering) unique per row (ALWAYS true for data read
    # from Cassandra — the CQL primary key is the row identity; file
    # sources opt in knowingly): lets the digest path derive clean-bucket
    # credit from the collected digests instead of a distinct-count scan
    digest_unique_keys: bool = False
    # column-granular digest pruning (operators/digest.column_prune_diff):
    # phase 2 reads only pk + the drifted columns of value-dirty buckets.
    # Requires digest_buckets > 0, align="set", AND digest_unique_keys
    # (per-column digests are unsound under duplicate full keys — the
    # job falls back to the whole-row digest path with a warning if the
    # declaration is missing).
    digest_columns: bool = False
    # persisted per-table digest snapshots (operators/digest.py snapshot
    # store): None disables; a path + digest_buckets > 0 makes run_job
    # write both sides' bucket digests there (zero extra scans — reused
    # from phase 1) keyed by job_id, for cross-run drift_report queries.
    snapshot_path: Optional[str] = None
    # declarative data-quality rules (operators/validate.py) run by
    # `--validate` / job.run_validation: per-table, per-side rule sets;
    # empty tuple disables
    validation: tuple = ()
    metadata_options: MetadataOptions = field(default_factory=MetadataOptions)
    retry_options: RetryOptions = field(default_factory=RetryOptions)

    def resolved_job_id(self) -> str:
        # reference generates a UUID when absent (DiffJob.java:224)
        return self.job_id or str(uuid.uuid4())


def load_config(path_or_stream) -> JobConfig:
    """Load YAML (reference: YamlJobConfiguration.load)."""
    if hasattr(path_or_stream, "read"):
        raw = yaml.safe_load(path_or_stream)
    else:
        with open(path_or_stream) as f:
            raw = yaml.safe_load(f)
    return parse_config(raw or {})


def parse_config(raw: dict) -> JobConfig:
    tables = None
    if raw.get("keyspace_tables") is not None:
        tables = tuple(
            TableConfig(
                name=t["name"],
                partition_key=tuple(t["partition_key"]),
                clustering=tuple(t.get("clustering", ())),
            )
            for t in raw["keyspace_tables"]
        )
    return JobConfig(
        source=SourceConfig(**raw.get("source", {})),
        target=SourceConfig(**raw.get("target", {})),
        keyspace_tables=tables,
        disallowed_keyspaces=tuple(raw.get("disallowed_keyspaces", ())),
        splits=int(raw.get("splits", 10_000)),
        buckets=int(raw.get("buckets", 100)),
        rate_limit=int(raw.get("rate_limit", 10_000)),
        specific_tokens=tuple(int(t) for t in raw.get("specific_tokens", ())),
        specific_tokens_mode=raw.get("specific_tokens_mode", "ACCEPT"),
        partition_sampling_probability=float(
            raw.get("partition_sampling_probability", 1.0)
        ),
        reverse_read_probability=float(raw.get("reverse_read_probability", 0.0)),
        job_id=raw.get("job_id", ""),
        align=raw.get("align", "set"),
        skew_safe=bool(raw.get("skew_safe", False)),
        digest_buckets=int(raw.get("digest_buckets", 0)),
        digest_unique_keys=bool(raw.get("digest_unique_keys", False)),
        digest_columns=bool(raw.get("digest_columns", False)),
        snapshot_path=raw.get("snapshot_path"),
        validation=tuple(
            ValidationConfig(
                table=v["table"],
                side=v.get("side", "both"),
                rules=tuple(
                    ValidationRuleConfig(
                        kind=r["kind"],
                        columns=tuple(r.get("columns", ())),
                        values=tuple(r.get("values", ())),
                        lo=r.get("lo"),
                        hi=r.get("hi"),
                        pattern=r.get("pattern"),
                        expr=r.get("expr"),
                        name=r.get("name"),
                        ref_table=r.get("ref_table"),
                        ref_columns=tuple(r.get("ref_columns", ())),
                    )
                    for r in v.get("rules", ())
                ),
            )
            for v in raw.get("validation", ())
        ),
        metadata_options=MetadataOptions(**raw.get("metadata_options", {})),
        retry_options=RetryOptions(**raw.get("retry_options", {})),
    )
