"""Plan audit: dump formatted physical plans for the headline queries into
PLANS.md — the diffable record of the plan shapes we accept.

tests/test_plan_quality.py asserts the invariants (pushdown, pruning,
broadcast, codegen, no cartesian); this artifact keeps the full plans
reviewable so a regression shows up as a readable diff, not just a red
test.

Usage: python tools/explain_audit.py [sf_dir]
"""

from __future__ import annotations

import contextlib
import io
import sys

sys.path.insert(0, "/root/repo")

from dbt_glue_spark.plans.catalog import SPECS
from dbt_glue_spark.session import get_spark

AUDITED = [
    "flagship_revenue_by_nation",
    "pricing_summary",
    "revenue_forecast",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q7_nation_volume",
    "q8_market_share",
    "q17_small_quantity_revenue",
    "q21_waiting_suppliers",
    "order_priority_count",
    "window_top_orders_per_customer",
    "ext_exact_dedup",
    "ext_minhash_lsh_pairs",
    "ext_knn_bruteforce",
    "ext_kmv_distinct_users",
    "ext_kmv_distinct_tokens",
    "ext_embedding_near_dup",
    "ext_simhash_pairs",
    "ext_quality_filter",
    "ext_pii_scan",
    "ext_dedup_keep_one",
    "ext_curation_pipeline",
    "ext_contamination_pairs",
    "ext_dup_clusters",
    "ext_bm25_search",
    "ext_tfidf_top_terms",
    "ext_countmin_tokens",
    "ext_bloom_prune",
    "ext_shard_packing",
    "ext_corpus_shuffle",
    "ext_quality_classifier",
    "ext_mixture_weights",
    "ext_minhash_incremental",
    "ext_span_dedup",
    "ext_embedding_outliers",
    "q20_excess_shipments",
    "asof_join_forward_next_purchase",
    "mat_backfill_partitions",
    "recursive_month_spine",
    "funnel_view_click_purchase",
    "retention_cohorts",
    "ext_lm_score",
    "ext_wordpiece_doc_stats",
    "ext_mmr_rerank",
    "ext_knn_quantized",
    "ext_corpus_diff",
    "asof_join_bucketed_clicks",
    "ext_dsir_weights",
    "ext_ngram_dup_fraction",
    "ext_random_projection",
    "ext_power_iteration_pc1",
    "ext_source_overlap",
    "ext_key_skew_orders",
    "ext_training_sequences",
    "ext_span_corruption",
    "ext_vocab_coverage",
    "ext_join_size_estimate",
    "ext_hard_negatives",
    "ext_kmv_source_overlap",
    "ext_label_separation",
    "ext_distribution_drift",
    "ext_encoding_audit",
    "unpivot_order_measures",
    "ext_winsorize_prices",
    "ext_dup_cluster_sizes",
    "ext_rank_agreement_rbo",
    "ext_rrf_fusion",
    "ext_ndcg_bm25",
    "ext_query_expansion",
    "ext_langid_confusion",
    "ext_embedding_dim_audit",
    "ext_top_tokens_per_lang",
    "ext_classifier_eval",
    "ext_classifier_calibration",
    "ext_edit_distance_verify",
    "ext_average_precision",
    "ext_correlation_matrix",
    "ext_chi2_independence",
    "event_transition_matrix",
    "event_activity_heatmap",
    "last_touch_attribution",
    "rfm_segments",
    # round-8 promotions
    "ext_exact_substring_spans",
    "ext_ledger_compaction",
    "ext_cusum_changepoints",
    "ext_sorted_neighborhood",
    "ext_interval_overlap_join",
    # round-10 promotions: crawl/URL tier, mixture tier, quality flags,
    # nonfinite audits, SFT/chat tier (r10 verdict "What's wrong #1")
    "ext_url_dedup",
    "ext_url_frontier_ledger",
    "ext_domain_caps",
    "ext_domain_quality_agg",
    "ext_token_budget_alloc",
    "ext_epoch_repeat_plan",
    "ext_temperature_mixture",
    "ext_quality_threshold_sweep",
    "ext_curriculum_stages",
    "ext_gopher_quality_flags",
    "ext_tokenizer_fertility",
    "ext_nonfinite_audit",
    "ext_nonfinite_sanitize",
    "ext_line_dedup",
    "ext_dedup_keep_best",
    "ext_cluster_keep_best",
    "ext_chat_turn_validation",
    "ext_chat_response_dedup",
    "ext_chat_truncation_plan",
    "ext_chat_render",
    "ext_preference_pair_audit",
    "ext_preference_length_bias",
    "streaming_url_frontier",
    "streaming_chat_response_dedup",
    # round-11 promotions: multimodal-dedup tier + privacy censuses
    "ext_image_dhash_dedup",
    "ext_image_near_dup_pairs",
    "ext_image_dup_clusters",
    "ext_video_near_dup",
    "ext_video_scene_changes",
    "ext_video_keyframes",
    "ext_audio_fingerprint_pairs",
    "ext_audio_snippet_match",
    "ext_media_decode_audit",
    "ext_media_data_card",
    "ext_k_anonymity",
    "ext_l_diversity",
    "streaming_image_frontier",
    # round-12 promotions: cross-modal pair tier
    "ext_caption_consistency",
    "ext_caption_spam",
    "ext_paired_keep_best",
    "ext_modality_mixture_card",
    "ext_paired_contamination",
    "ext_pair_completeness",
    "ext_pair_alignment",
    "streaming_mixture_monitor",
    "streaming_pair_frontier",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("plan-audit")
    specs = SPECS()
    import datetime

    stamp = datetime.date.today().isoformat()
    out = [
        "# PLANS — formatted physical plans of the headline queries",
        "",
        f"Generated by `tools/explain_audit.py {sf_dir}` on {stamp} "
        f"(round 12 HEAD: catalog 292 — includes the round-11 "
        f"multimodal-dedup promotions and the round-12 cross-modal "
        f"pair promotions).",
        "",
        "Invariants asserted in",
        "`tests/test_plan_quality.py`; this file is the human-reviewable record.",
        "Look for: `PushedFilters` (predicate pushdown), `ReadSchema` (column",
        "pruning), `BroadcastHashJoin` (dimension joins), absence of",
        "`CartesianProduct`.",
        "",
    ]
    for name in AUDITED:
        df = specs[name].fn(spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain(mode="formatted")
        out.append(f"## {name}")
        out.append("")
        doc = specs[name].doc.strip()
        if doc:
            out.append(doc)
            out.append("")
        out.append("```")
        out.append(buf.getvalue().rstrip())
        out.append("```")
        out.append("")
    with open("/root/repo/PLANS.md", "w") as f:
        f.write("\n".join(out))
    print(f"PLANS.md written ({len(AUDITED)} plans)")


if __name__ == "__main__":
    main()
