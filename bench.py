#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE compact JSON line (<=1500 chars — the driver records only a
~2k stdout tail, which round 5's full 160-entry map overflowed):
    {"metric": "...", "value": N, "unit": "sec", "core16": N,
     "n_queries": N, "sf": ..., "queries": {<core16 only>}}
The full per-query map goes to stderr and BENCH_DETAIL.json.

Each query is executed twice and the best wall time kept (first run pays
JVM/codegen warmup; the engine's steady-state cost is what matters at
cluster scale).  ``value`` = sum of per-query best times, excluding
session startup.  ``core16`` = sum over the FIXED original 16-query set
recorded in BENCH_r01 — the round-over-round comparable number (the
headline total grows with coverage, so totals across rounds measure
breadth, not speed).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: The headline set: flagship parity query + one per heavy operator
#: family (agg, star join, window, explode, formatter) — extended as
#: extension operators land.
#: The stable cross-round metric (``core16`` in the output JSON): the
#: EXACT query set recorded in BENCH_r01, frozen by NAME — a positional
#: slice would silently change meaning if a query were ever inserted
#: near the top of HEADLINE.
CORE16 = (
    "variant_report",
    "q1_pricing_summary",
    "join_star_revenue",
    "window_topk_per_group",
    "explode_tokens",
    "fmt_duration_hms",
    "dedup_minhash_lsh",
    "knn_cosine_topk",
    "text_quality_score",
    "stream_session_windows",
    "join_asof_attribution",
    "q3_shipping_priority",
    "update_bloom_prefilter",
    "join_range_binned",
    "contamination_check",
    "split_train_val_test",
)

HEADLINE = [
    "variant_report",
    "q1_pricing_summary",
    "join_star_revenue",
    "window_topk_per_group",
    "explode_tokens",
    "fmt_duration_hms",
    "dedup_minhash_lsh",
    "knn_cosine_topk",
    "text_quality_score",
    "stream_session_windows",
    "join_asof_attribution",
    "q3_shipping_priority",
    "update_bloom_prefilter",
    "join_range_binned",
    "contamination_check",
    "split_train_val_test",
    # round-3 breadth (VERDICT r1 item 6): remaining heavy families so
    # round-over-round regressions are visible per-query
    "dedup_simhash_pairs",
    "dedup_components",
    "q5_local_supplier_revenue",
    "q18_large_volume_customer",
    "window_range_frame",
    "text_metrics",
    "pack_sequences",
    # round-4 additions: distributed global rank, JVM-side chunk
    # generator, the pure scan-and-aggregate TPC-H shape, and the
    # time-series family (grid fill + funnel)
    "shuffle_global_order",
    "chunk_sliding_tokens",
    "q6_forecast_revenue",
    "resample_forward_fill",
    "funnel_conversion",
    # round-4 additions: the decorrelation-heavy TPC-H shapes (argmin
    # self-join + double EXISTS self-join), the corpus-statistics
    # layer, and the clustering / semantic-dedup flagships
    "q2_min_cost_supplier",
    "q21_waiting_supplier",
    "tfidf_top_terms",
    "unigram_logprob_score",
    "vocab_bigrams",
    "kmeans_clusters",
    "kmeans_clusters_arrow",
    "dedup_semantic",
    "dedup_incremental_minhash",
    "variant_json_path",
    "quality_expectations",
    "curation_pipeline",
    # round-5 additions: sub-document dedup (content-defined chunking +
    # containment), incremental label maintenance, vocab encoding
    "chunk_content_defined",
    "dedup_chunks",
    "doc_containment",
    "dedup_components_incremental",
    "encode_tokens",
    "pq_adc_topk",
    # round-5 late additions: compressed-ANN composition, release CDC,
    # and tokenizer training
    "ivf_adc_topk",
    "corpus_diff",
    "bpe_merges",
    "sessionize_events",
    "pagerank_copurchase",
    "dedup_jaccard_prefix",
    "bm25_search",
    "hybrid_rrf_search",
    "frequent_brand_pairs",
    "ewma_event_values",
    "trend_event_values",
    "dedup_edit_distance",
    "markov_transitions",
    "peak_concurrency",
    "skyline_pareto",
    "chi_square_independence",
    "triangle_count",
    "khop_reach",
    "gini_revenue",
    "entropy_by_source",
    "ab_test_proportions",
    "funnel_time_to_convert",
    "seasonal_dow_profile",
    "session_paths_top",
    "heavy_hitters_cms",
    "correlation_matrix",
    "rolling_median_values",
    "outlier_iqr_events",
    "degree_distribution",
    "text_ngram_novelty",
    "dedup_lsh_recall",
    "stream_cms_heavy_hitters",
    "distinctive_terms_logodds",
    "skew_key_report",
    "ma_crossover_signal",
    "customer_ltv_deciles",
    "supplier_hhi_by_brand",
    "window_rank_functions",
    "phrase_search_positional",
    "sample_weighted_aes",
    "scd2_point_snapshot",
    "rolling_active_users",
    "referential_integrity_audit",
    "frequent_brand_triples",
    "audience_overlap",
    "wau_hll_rollup",
    "twap_event_values",
    "rfm_segments",
    "psi_value_drift",
    "benford_first_digit",
    "sequence_gap_audit",
    "weighted_median_price",
    "attribution_multi_touch",
    "topk_diverse_docs",
    "wow_growth_report",
    "activity_streaks",
    "winsorized_mean_value",
    "feature_hashing",
    "percentiles_approx_sketch",
    "pca_project_2d",
    "nb_lang_confusion",
    "vocab_oov_rate",
    "item_item_recs",
    "forecast_backtest_mae",
    "label_propagation",
    "abc_classification",
    "max_drawdown_value",
    "rebalance_classes",
    "mixture_interleave",
    "ann_ndcg_eval",
    "quantile_normalize",
    "nb_margin_calibration",
    # round-5 final batch: audience-similarity matrix, tokenizer
    # fertility, change-point / graph-shape diagnostics
    "brand_affinity_jaccard",
    "bpe_fertility",
    "cusum_changepoint",
    "centroid_cosine_matrix",
    "degree_assortativity",
    "seasonal_decompose_dow",
    "kaplan_meier_conversion",
    "lorenz_curve",
    "markov_entropy_rate",
    "term_pmi_top",
    "repeat_purchase_interval",
    "text_zipf_fit",
    "discount_quantity_corr",
    "nation_trade_balance",
    "fulfillment_latency",
    "embedding_outlier_counts",
    "term_burstiness_top",
    "seasonal_residual_outliers",
    "dedup_source_matrix",
    "functional_dependency_audit",
    "simpson_diversity_by_source",
    "collocation_pmi_bigrams",
    "reach_curve_daily",
    "k_anonymity_audit",
    "user_feature_matrix",
    "sample_neyman_allocation",
    "stream_reach_curve",
    "burst_hours_scan",
    "sample_negative_brands",
    "state_occupancy_share",
    "class_separability",
    "region_nation_share",
    "return_rate_wilson",
    "price_volume_decomposition",
    "weekend_welch_ttest",
    "basket_size_histogram",
    "lang_mismatch_audit",
    "embedding_norm_profile",
    "shingle_df_histogram",
    "repeat_revenue_share_monthly",
    "lsh_threshold_sweep",
    "spend_decile_mobility",
    "padding_waste_by_bucket",
    "revenue_variance_ratio",
    "logistic_return_model",
    "dow_revenue_anova",
    "multimodal_audio_windows",
    "knn_ivf_filtered_topk",
    "poisson_quantity_model",
    "ab_test_power",
    # round-7 additions: lake schema evolution + CDC apply, ANN recall
    # audit, directed association rules, lead-lag CCF
    "merge_schema_evolution",
    "merge_cdc_apply",
    "adc_recall_audit",
    "association_rules_confidence",
    "ccf_click_purchase",
    "graph_peeling_profile",
    "mrl_prefix_recall",
    "stream_cdc_apply",
    "l_diversity_audit",
    "arrow_byte_stats",
    "stratified_kfold_assign",
    "stream_late_data_drop",
    "dedup_cluster_size_histogram",
    "span_dedup_crossdoc",
    "record_linkage_blocking",
    "zorder_skipping_audit",
    "t_closeness_audit",
    "theil_sen_trend",
    "dsir_importance_weights",
    "poisson_bootstrap_ci",
    "conformal_interval_coverage",
    "calibration_return_model",
    "multimodal_frame_dedup",
    "hilbert_skipping_audit",
    "stream_scd2_enrich",
    "horvitz_thompson_total",
    "hits_hubs_authorities",
    "packing_efficiency_compare",
    "ivf_nprobe_tradeoff",
    # round-9 additions
    "knn_shapley_values",
    "linkpred_resource_allocation",
    "mann_kendall_trend",
    "fdr_bh_correction",
    "heaps_law_fit",
    "domain_cap_sample",
    "embedding_mmd_drift",
    "stream_left_outer_join",
    "join_cardinality_estimate",
    "rank_biased_overlap",
    "quantile_treatment_effect",
    "stream_chained_windows",
    "cohens_kappa_langid",
    # round-10 additions
    "kendall_tau_daily",
    "cuped_adjusted_ab",
    "partition_pruning_audit",
    "compaction_bin_plan",
    "topk_churn_weekly",
    "cms_width_tradeoff",
    "fairness_parity_audit",
    "truncation_waste_curve",
    "stream_stateful_sessions",
    "bloom_fpr_audit",
    "mcnemar_test",
    "shuffle_mixing_audit",
    # round-11 additions
    "did_revenue_estimate",
    "ipw_ate_stratified",
    "fleiss_kappa_ratings",
    "group_holdout_split",
    "target_encode_kfold",
    "mutual_info_features",
    "theil_inequality_decomposition",
    "kmv_distinct_intersect",
    "stream_dynamic_gap_sessions",
    "coreset_kcenter_greedy",
    "stream_full_outer_join",
    "edge_triangle_support",
]

REPEATS = 2


def _git_short_head() -> str | None:
    import subprocess

    try:
        return subprocess.run(
            ["git", "-C", str(Path(__file__).resolve().parent), "rev-parse",
             "--short", "HEAD"],
            capture_output=True,
            text=True,
            check=True,
            timeout=10,
        ).stdout.strip()
    except Exception:
        return None


def _git_code_head() -> str | None:
    """Short hash of the last commit touching code paths — delegates to
    tools/phases_io.current_commit so the pathspec lives in ONE place
    (ADVICE r9: a second hardcoded copy here could silently diverge)."""
    try:
        from tools.phases_io import current_commit

        return current_commit()
    except Exception:
        return None


def _cpu_ticks() -> tuple[int, int] | None:
    """(steal_ticks, total_ticks) from the aggregate /proc/stat cpu
    line — the hypervisor-steal counter this host is known to suffer
    (PLANS.md §bench-method)."""
    try:
        with open("/proc/stat") as fh:
            parts = fh.readline().split()
        vals = [int(v) for v in parts[1:]]
        steal = vals[7] if len(vals) > 7 else 0
        return steal, sum(vals)
    except (OSError, ValueError, IndexError):
        return None


def _box_state(before: tuple[int, int] | None) -> dict:
    """Machine-computed contention evidence for the bench record
    (VERDICT r9 item 3): steal-tick delta across the run + 1-minute
    loadavg, and a ``contended`` flag when steal >1% or load >2x
    cores — mirroring the ``stale`` policy on phase provenance, so a
    contended record self-flags instead of relying on prose."""
    import os

    state: dict = {}
    after = _cpu_ticks()
    if before and after and after[1] > before[1]:
        steal_pct = 100.0 * (after[0] - before[0]) / (after[1] - before[1])
        state["steal_pct"] = round(steal_pct, 2)
    try:
        state["loadavg_1m"] = round(os.getloadavg()[0], 2)
    except OSError:
        pass
    cores = os.cpu_count() or 1
    state["contended"] = bool(
        state.get("steal_pct", 0.0) > 1.0
        or state.get("loadavg_1m", 0.0) > 2.0 * cores
    )
    return state


def main() -> None:
    from video_metadata_db_spark.plans import QUERIES
    from video_metadata_db_spark.session import get_spark

    ticks_before = _cpu_ticks()
    spark = get_spark("vmdb-bench")
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]

    per_query: dict[str, float] = {}
    for name in HEADLINE:
        fn = QUERIES.get(name)
        if fn is None:
            continue  # not yet implemented this round
        best = float("inf")
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            # noop sink materializes EVERY column (count() would let
            # Catalyst prune the projections we're trying to measure)
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        per_query[name] = round(best, 3)
        print(f"# {name}: {best:.3f}s", file=sys.stderr)

    total = round(sum(per_query.values()), 3)
    missing_core = [n for n in CORE16 if n not in per_query]
    assert not missing_core, f"core16 queries absent from this run: {missing_core}"
    core16 = round(sum(per_query[n] for n in CORE16), 3)
    # Full per-query map goes to stderr + BENCH_DETAIL.json; the final
    # stdout line must stay compact (the driver keeps only a ~2k tail of
    # stdout — round 5's 160-entry map overflowed it and the round's
    # bench was recorded as parsed:null).
    box = _box_state(ticks_before)
    detail = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "core16": core16,
        "queries": per_query,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "box": box,
    }
    # Phase-split measurements (tools/ann_phases.py +
    # tools/components_phases.py write PHASES.json): queries whose
    # registered form prices a one-time premise/index build carry their
    # steady-state phase cost here, next to the headline number.
    # The tools stamp a provenance block (tools/phases_io.py); if the
    # split was measured on a different commit than this bench run, the
    # embedded copy is marked stale instead of silently riding along
    # (ADVICE r7).
    phases_path = Path(__file__).resolve().parent / "PHASES.json"
    if phases_path.exists():
        try:
            phases = json.loads(phases_path.read_text())
        except (OSError, ValueError):
            phases = None
        if isinstance(phases, dict):
            prov = phases.get("provenance")
            if isinstance(prov, dict):
                prov["bench_commit"] = _git_short_head()
                # compare against the last commit touching CODE paths
                # (tools/phases_io.CODE_PATHS): committing the
                # measurement artifact or docs must not stale the
                # measurement — only a code change can.  Unknown origin
                # (no recorded commit, or no git here) is stale, same
                # policy as the pre-provenance branch.
                code_head = _git_code_head()
                prov["stale"] = (
                    not prov.get("commit")
                    or not code_head
                    or prov["commit"] != code_head
                )
            else:
                # pre-provenance PHASES.json: unknown origin → stale
                phases["provenance"] = {"commit": None, "stale": True}
            detail["phases"] = phases
    print(json.dumps(detail), file=sys.stderr)
    try:
        Path(__file__).resolve().parent.joinpath("BENCH_DETAIL.json").write_text(
            json.dumps(detail, indent=1) + "\n"
        )
    except OSError:
        pass  # detail file is best-effort; the stdout line is the record
    compact = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "core16": core16,
        "n_queries": len(per_query),
        "sf": detail["sf"],
        "box": box,
        "queries": {n: per_query[n] for n in CORE16},
    }
    line = json.dumps(compact)
    if len(line) > 1500:  # belt-and-braces: never overflow the driver tail
        compact.pop("queries")
        line = json.dumps(compact)
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
