"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric", "value", "unit", "queries", "sf"}.

The headline set covers the engine's spine: both diff modes (narrow set /
wide positional), scan+dedup key scan, aggregation/join/window analytics,
and the events time-series queries.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from cassandra_diff_spark import gate, gate_pipeline  # noqa: E402
from cassandra_diff_spark.session import get_spark  # noqa: E402

ALL_QUERIES = gate_pipeline.ensure_stream_wrapped(
    {**gate.QUERIES, **gate_pipeline.QUERIES}
)

HEADLINE = [
    "diff_stats_orders",
    "diff_stats_lineitem",
    "diff_mismatch_orders",
    "key_scan_orders",
    "split_assignment",
    "q1_pricing_summary",
    "q3_top_unshipped",
    "q6_forecast_revenue",
    "q12_shipmode",
    "top_orders_per_customer",
    "events_by_hour",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash_pairs",
    "ann_cosine_topk",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "dedup_embedding_cosine",
    "text_stats",
    "pipeline_clean_corpus",
    # round-5 additions: the flagship scale paths get trend lines
    "diff_stats_orders_digest",
    "diff_stats_lineitem_bucketed",
    "dedup_minhash_incremental",
    "diff_stats_orders_digest_sparse",
    "dedup_semantic",
    "events_asof_attribution",
    "cdc_latest_state",
    "validate_orders",
    "events_quantiles_binned",
    "curate_chunks",
    "key_scan_sorted_layout",
    "dedup_containment",
    # round-6 additions
    "events_asof_stream",
    "events_interval_stream",
    "dedup_containment_incremental",
    "events_quantiles_refined",
    "validate_samples_orders",
    "lineitem_salted_join",
    "key_scan_zorder_layout",
    "compact_orders_roundtrip",
    "events_merge_intervals",
    "events_time_weighted_avg",
    "dedup_containment_clusters",
    "manifest_token_layout",
    "pipeline_corpus_neardup",
    "events_sessions_stream",
    "events_asof_stream_forward",
    "vocab_encode_documents",
    "linkage_fuzzy_customers",
    "events_quantiles_binned_stream",
    "curate_sample_exact_k",
    "pipeline_tokenize_pack",
    "sketch_distinct_orders",
    "events_outlier_fences",
    "linkage_weighted_customers",
    "validate_orders_stream",
    "embedding_centroids",
    "text_url_canonical",
    "curate_strip_boilerplate",
    "events_funnel",
    "multimodal_decode_mp3",
    "ann_pq_topk",
    "ann_ivf_pq_topk",
    "events_hop_counts",
    "multimodal_pixels_bmp",
    "multimodal_samples_wav",
    "linkage_block_profile",
    "diff_stats_orders_orc",
    "vocab_hash_embed",
    "events_cohort_retention",
    "pipeline_image_triage",
    "dedup_duplicate_spans",
    "search_bm25",
    "text_lm_score",
    "events_rolling_anomaly",
    "events_heavy_hitters",
    "embedding_covariance",
    "curate_sample_weighted",
    "events_quantiles_incremental",
    "validate_correlations",
    "join_profile_lineitem",
    "text_strip_html",
    "curate_split",
    "events_top_k",
    "vocab_tfidf_embed",
    "events_winsorized",
    "events_cdf_transform",
    "events_robust_scale",
    "events_top_users",
    "graph_pagerank",
    "embedding_random_project",
    "sketch_overlap_keys",
    "text_scripts",
    "sketch_cm_user_counts",
    "bloom_prefilter_orders",
    "events_rolling_anomaly_stream",
    "sketch_cm_stream",
    "bloom_stream_prefilter",
    "lineitem_weighted_quantiles",
    "profile_drift_orders",
    "embedding_mahalanobis",
    "events_interval_coverage",
    "events_gap_report",
    "lineitem_weighted_quantiles_refined",
    # round-6 session-4 additions
    "cdc_snapshot_delta",
    "diff_kway_orders",
    "diff_kway_repair",
    "curate_mix_to_target",
    "profile_entropy",
    "profile_mutual_info",
    "embedding_covariance_fold",
    "dedup_canonical_url",
    "multimodal_image_ahash",
    "multimodal_audio_energy",
    "search_hybrid_rrf",
    "text_novelty",
    "pipeline_hard_negatives",
    "curate_split_neardup",
    "vocab_pmi",
    "eval_pair_metrics",
    "eval_retrieval_lsh",
    "eval_kappa_orders",
    "eval_majority_label",
    "text_novelty_incremental",
    "privacy_pseudonymize",
    "privacy_k_anonymity",
    "eval_majority_label_stream",
    "curate_contamination_stream",
    "eval_class_metrics",
    "eval_ndcg_lsh",
    "eval_map_lsh",
    "vocab_js_drift",
    "vocab_pmi_incremental",
    "vocab_js_drift_stream",
    "curate_gopher_flags",
    "curate_dup_lines",
    "curate_dup_ngrams",
    "dedup_exact_incremental",
    "privacy_suppress",
    "text_mojibake",
    "eval_class_metrics_stream",
    "pipeline_corpus_delta",
    "privacy_l_diversity",
    "events_ks_value",
    "key_scan_hive_layout",
    "profile_chi2",
    "profile_cramers_v",
    "events_js_value",
    "eval_fleiss_kappa",
    "privacy_t_closeness",
    "vocab_bpe_train",
    "vocab_bpe_encode",
    "multimodal_image_dhash",
    # round-8 additions
    "vocab_bpe_train_incremental",
    "dedup_prefix_jaccard",
    "events_transition_matrix",
    "events_decayed_counts",
    "events_transition_stream",
    "ann_ivf_kmeans_topk",
    "embedding_pca_project",
    # round-9 additions
    "events_decayed_counts_incremental",
    "events_sequence_loglik",
    "curate_classifier_score",
    "curate_cluster_sample",
    "curate_phrase_blocklist",
    "profile_spearman",
    "profile_kendall",
    "profile_theils_u",
    "eval_calibration",
    "vocab_encode_join",
    "vocab_tfidf_join",
    "curate_cell_exact_k",  # r9 gate, missed in the r9 block
    # round-10 additions
    "profile_kendall_binned",
    "events_decayed_counts_stream",
    "curate_classifier_train",
    "eval_auc",
    "eval_calibration_stream",
    # round-11 additions
    "vocab_bpe_roundtrip",
    "pipeline_classifier_bakeoff",
    "vocab_bpe_encode_udf",
    # round-12 additions: the unigram tokenizer family
    "vocab_unigram_roundtrip",
    "vocab_unigram_encode_stats",
]

#: fresh-session control set (VERDICT r10 #1): the flagship diffs are
#: re-timed at the END in a NEW JVM/session, after the main loop's
#: session has been stopped — the r10 driver artifact showed +51%/3x
#: "regressions" that isolated re-runs proved were pure in-session
#: contention (175+ queries and the BPE probes sharing one JVM). The
#: control block is the contention-free trend line: a real regression
#: moves BOTH numbers; contention moves only the in-session ones.
CONTROL = [
    "diff_stats_orders",
    "diff_stats_lineitem",
    "diff_mismatch_orders",
    "diff_stats_orders_digest",
    "diff_stats_lineitem_bucketed",
    # r12 (VERDICT r11 #6): the expensive NON-streaming tail — its
    # in-session medians swing 2-3x on identical code (dedup_semantic
    # 0.69->1.94 s across r11 runs), so without control entries these
    # had no contention-free trend line at all. Streaming twins stay
    # out: their cost is the trigger floor, which contention barely
    # moves.
    "dedup_containment",
    "profile_spearman",
    "curate_classifier_train",
    "diff_stats_orders_digest_sparse",
]

#: timed repetitions per query; the recorded number is the MEDIAN (the
#: r10 lesson: a single timing inherits whatever the session was doing)
N_REPS = 3


def machine_health() -> dict:
    """Machine-health probe (VERDICT r12 #3/#6): identical code has
    measured 177-642 s across runs of this bench because the box cycles
    through degraded phases (hypervisor steal, throttled clock). Emit
    the evidence WITH the numbers so a sick run is machine-flagged
    instead of judge-inferred: a fixed pure-Python spin loop (ms;
    ~0.2-0.3 s on this box healthy, 2-4x that degraded), the 1-minute
    load average at launch, and steal% over a 100 ms /proc/stat window.
    Additions-only to the bench contract — the timing methodology and
    the one-line JSON keys it extends are untouched."""
    t0 = time.perf_counter()
    x = 0
    for i in range(2_000_000):
        x += i * i
    spin_ms = round((time.perf_counter() - t0) * 1000.0, 1)
    try:
        load1 = round(os.getloadavg()[0], 2)
    except OSError:
        load1 = None
    steal_pct = None
    try:
        def _cpu():
            with open("/proc/stat") as fh:
                parts = fh.readline().split()[1:]
            vals = [int(v) for v in parts]
            steal = vals[7] if len(vals) > 7 else 0
            return steal, sum(vals)
        s0, t0v = _cpu()
        time.sleep(0.1)
        s1, t1v = _cpu()
        if t1v > t0v:
            steal_pct = round(100.0 * (s1 - s0) / (t1v - t0v), 2)
    except (OSError, ValueError, IndexError):
        pass
    return {"spin_ms": spin_ms, "load1": load1, "steal_pct": steal_pct}


def _time_query(spark, fn, sf_dir, reps=N_REPS):
    """Median-of-reps timing of one gate callable; each rep re-executes
    the full query (build + count) and releases operator caches after,
    so no rep inherits its predecessor's cache but each still benefits
    from its own."""
    import statistics

    from cassandra_diff_spark import operators

    ts, n = [], 0
    for _ in range(reps):
        t0 = time.perf_counter()
        try:
            df = fn(spark, sf_dir)
            n = df.count()
            ts.append(time.perf_counter() - t0)
        finally:
            # cache hygiene even when the rep RAISES (r4 lesson): a
            # failed query's tracked caches must not leak into every
            # subsequent query's timings
            operators.release_caches()
            spark.catalog.clearCache()
    return round(statistics.median(ts), 3), ts, n


def run_control() -> None:
    """--control mode: executed as a SUBPROCESS in a fresh JVM after the
    main bench session has been stopped. Prints one JSON line with the
    median-of-3 warm timings (one untimed warm-up run each) of the
    CONTROL queries."""
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("cds-bench-control")
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    spark.range(0, 32, 1, 32).mapInPandas(lambda it: it, "id long").count()
    # explicit harness-side staging (VERDICT r12 #2), scoped to the
    # fixtures the CONTROL queries actually resolve — the control run
    # is the budget-bound leg (the pytest live guard's subprocess), so
    # it must not pay cold-staging for ~20 fixtures it never reads
    gate_pipeline.FIXTURES["bucketed_pairs"](spark, sf_dir)
    from cassandra_diff_spark import operators

    # reps override for CALLERS of --control only (the pytest live
    # guard passes 2 to fit the driver's suite budget; its 2x-of-history
    # gate is insensitive to median-of-2 vs median-of-3). The bench's
    # own history-recorded control stays at N_REPS — main() never sets
    # this, and --control runs don't append to BENCH_HISTORY.
    reps = int(os.environ.get("SPARK_GRAFT_CONTROL_REPS", str(N_REPS)))
    out: dict[str, float] = {}
    for name in CONTROL:
        fn = ALL_QUERIES[name]
        try:
            fn(spark, sf_dir).count()  # warm-up run, untimed
            operators.release_caches()
            spark.catalog.clearCache()
            out[name], _, _ = _time_query(spark, fn, sf_dir, reps=reps)
        except Exception as e:
            out[name] = -1.0
            print(f"# control {name}: FAILED {e}", file=sys.stderr)
    print(json.dumps({"control": out, "machine": machine_health()}))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(Path(sf_dir).name.removeprefix("sf") or "0.1")
    health_launch = machine_health()
    spark = get_spark("cds-bench")

    # warm the JVM + parquet footers + Arrow Python workers so per-query
    # numbers measure the queries, not session/daemon startup (on a real
    # cluster executors and their python daemons are long-running)
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    spark.range(0, 32, 1, 32).mapInPandas(
        lambda it: it, "id long"
    ).count()
    # pre-stage EVERY /tmp gate fixture (VERDICT r12 #2): each gate
    # measures the RECURRING operator over an existing layout/fixture —
    # one-time staging writes (bucketed layouts, micro-batch slices,
    # persisted incremental state) are setup, not the operator under
    # test, and must never land inside a timed rep
    gate_pipeline.stage_fixtures(spark, sf_dir)

    from cassandra_diff_spark import operators

    timings: dict[str, float] = {}
    reps_detail: dict[str, list] = {}
    errors: dict[str, str] = {}
    for name in HEADLINE:
        fn = ALL_QUERIES[name]
        try:
            # median of N_REPS consecutive runs (VERDICT r10 #1): one
            # timing inherits whatever the shared session happens to be
            # doing; the median is stable against one contended rep.
            # Cache hygiene BETWEEN reps and queries (r4 lesson) lives
            # in _time_query.
            med, ts, n = _time_query(spark, fn, sf_dir)
        except Exception as e:  # one broken query must not zero the bench
            errors[name] = f"{type(e).__name__}: {e}"[:500]
            print(f"# {name}: FAILED {errors[name]}", file=sys.stderr)
            continue
        timings[name] = med
        reps_detail[name] = [round(t, 3) for t in ts]
        print(
            f"# {name}: {med:.3f}s median of "
            f"{[f'{t:.2f}' for t in ts]} ({n} rows)",
            file=sys.stderr,
        )

    total = round(sum(timings.values()), 3)
    health = {"launch": health_launch, "end": machine_health()}
    out = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "machine": health,
    }
    if errors:
        out["errors"] = errors

    # 1M-vector scale probe of the ANN / near-dup paths: planted-neighbor
    # recall + candidate-set fraction at scale-tuned banding (the evidence
    # that the bucketed paths prune, not just that they are correct at
    # sf0.1). SPARK_GRAFT_SCALE_N=0 skips; see scale_probe.py.
    scale_n = int(os.environ.get("SPARK_GRAFT_SCALE_N", "1000000"))
    if scale_n:
        try:
            from scale_probe import run_probe

            out["scale_probe"] = run_probe(spark, scale_n)
        except Exception as e:  # the headline line must survive a probe failure
            out["scale_probe"] = {"error": f"{type(e).__name__}: {e}"}

    # fresh-session control re-timing (VERDICT r10 #1): stop this
    # session first — the control subprocess gets its own JVM on a
    # quiet machine, so its numbers are contention-free by construction
    # and a real flagship regression moves BOTH the in-session medians
    # and the control block.
    control = None
    try:
        spark.stop()
        import subprocess

        r = subprocess.run(
            [sys.executable, str(Path(__file__).resolve()), "--control"],
            capture_output=True, text=True, timeout=1200,
        )
        for line in reversed(r.stdout.strip().splitlines()):
            line = line.strip()
            if line.startswith("{"):
                control = json.loads(line).get("control")
                break
        if control is None:
            control = {"error": f"no control JSON (rc={r.returncode})"}
    except Exception as e:  # the bench line must survive a control failure
        control = {"error": f"{type(e).__name__}: {e}"[:200]}
    out["control"] = control
    out["reps"] = reps_detail

    # The driver keeps only a ~2 KB stdout tail and parses the LAST JSON
    # line (r6 lesson: one giant line with 150 per-query timings + the full
    # scale probe overflowed the capture and BENCH_r06 recorded parsed:null).
    # Emit the full detail FIRST (and persist it to BENCH_LOCAL.json for
    # humans), then a short summary line guaranteed to fit the tail window.
    print(json.dumps(out))
    try:
        Path(__file__).resolve().parent.joinpath("BENCH_LOCAL.json").write_text(
            json.dumps(out, indent=1)
        )
        # durable per-query record: the driver's BENCH artifact keeps only
        # a ~2 KB stdout tail, which cannot carry ~180 per-query timings
        # (r6: one giant line overflowed the capture and parsed:null).
        # Appending every run to a TRACKED jsonl keeps round-over-round
        # per-query regressions auditable from the repo alone.
        with Path(__file__).resolve().parent.joinpath(
            "BENCH_HISTORY.jsonl"
        ).open("a") as fh:
            try:
                import subprocess

                rev = subprocess.run(
                    ["git", "-C", str(Path(__file__).resolve().parent),
                     "rev-parse", "--short", "HEAD"],
                    capture_output=True, text=True, timeout=10,
                ).stdout.strip() or None
            except Exception:
                rev = None
            fh.write(json.dumps({
                "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
                "rev": rev,
                "value": total, "sf": sf, "queries": timings,
                "control": control,
                "machine": health,
                "errors": errors or None,
            }) + "\n")
    except OSError:
        pass
    top = dict(sorted(timings.items(), key=lambda kv: -kv[1])[:20])
    summary = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "sf": sf,
        "n_queries": len(timings),
        "n_errors": len(errors),
        # top-20 fits the driver's tail window; the FULL map is in
        # BENCH_HISTORY.jsonl (tracked) and BENCH_LOCAL.json
        "top20": top,
        "control": control,
        "reps_per_query": N_REPS,
        "detail": "BENCH_HISTORY.jsonl",
        "machine": health,
    }
    probe = out.get("scale_probe")
    if isinstance(probe, dict):
        summary["probe_recall1_min"] = min(
            (v for k, v in probe.items() if k.endswith("recall_at_1")), default=None
        )
    print(json.dumps(summary))


if __name__ == "__main__":
    if "--control" in sys.argv:
        run_control()
    else:
        main()
