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


#: Names with no GREEN row in any driver CORRECTNESS file yet (the driver
#: caps how many entries it checks per round, in registration order).
#: These go FIRST so the next capped run checks them; previously-covered
#: entries follow ROTATED by round so every oracle-paired entry lands a
#: fresh driver row at least every other round (r4 lesson: a static mid
#: order left the same 27 tail entries driver-unchecked round after
#: round); declared rows-only entries last.
_NEEDS_DRIVER_ROW = [
    # new in round 5 — no driver row exists yet
    "validate_orders",
    "profile_orders",
    "key_scan_sorted_layout",
    "events_quantiles_binned",
    "events_interval_overlap",
    "dedup_containment",
    "curate_chunks",
    "events_collapse_bursts",
    "events_point_in_time_scd2",
    "cdc_latest_state_stream",
    "cdc_latest_state",
    "cdc_scd2_intervals",
    "cdc_apply_changelog",
    "events_asof_attribution",
    "events_asof_chunked",
    "events_interval_attribution",
    "events_resample_locf",
    "diff_stats_lineitem_bucketed_digest",
    "diff_stats_orders_digest_cols",
    "diff_stats_events_digest_cols",
    "dedup_semantic",
    "diff_stats_orders_digest_sparse",
    "text_url_parts",
    "curate_domain_cap",
    "curate_shuffle",
    "curate_shards",
    "dedup_minhash_stream",
    "diff_repair_orders",
    "curate_training_corpus",
    "dedup_cluster_best",
    "curate_token_budget",
    "diff_stats_orders_schema_drift",
    "balanced_splits_orders",
    "key_skew_lineitem",
]


def _checked_last_round() -> set[str]:
    """Names that got a driver row in the LATEST CORRECTNESS file."""
    import json

    here = Path(__file__).resolve().parent
    files = sorted(here.glob("CORRECTNESS_r*.json"))
    if not files:
        return set()
    try:
        return set(json.loads(files[-1].read_text()))
    except Exception:  # a malformed file must not break the gate
        return set()


def _ordered(merged: dict) -> dict:
    oracles = {**gate.ORACLES, **gate_pipeline.ORACLES}
    first = [n for n in _NEEDS_DRIVER_ROW if n in merged]
    checked = _checked_last_round()
    mid = sorted(n for n in merged if n in oracles and n not in first)
    # self-maintaining round-robin: whatever the capped driver run missed
    # last round goes to the head this round
    mid = [n for n in mid if n not in checked] + [n for n in mid if n in checked]
    last = [n for n in merged if n not in oracles and n not in first]
    return {n: merged[n] for n in first + mid + last}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _ordered({**gate.QUERIES, **gate_pipeline.QUERIES})


def oracle_sql() -> dict[str, str]:
    return {**gate.ORACLES, **gate_pipeline.ORACLES}
