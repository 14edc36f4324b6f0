"""Per-query shuffle/spill accounting over the flagship queries —
the measured evidence behind SCALE.md's shuffle-minimization claims.

Runs each query to a noop sink at the given SF with the Spark UI's
REST status API enabled, and attributes stage-level shuffle
read/write and disk-spill bytes to the query via snapshot deltas
(queries run sequentially in one application). Writes SHUFFLE.md.

Usage: python scripts/shuffle_report.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import urllib.request

sys.path.insert(0, ".")

os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

from pyspark.sql import SparkSession  # noqa: E402

# flagship set: one per operator family, cheap enough to run at sf0.01
QUERIES = [
    # fifth continuation
    "pyds_feed_scan",
    "text_repetition_metrics",
    "users_activity_similarity",
    "emb_truncated_recall",
    "orders_holt_forecast",
    "ts_dtw_pairs",
    "orders_snapshot_diff",
    "orders_monthly_spine_recursive",
    "events_props_variant",
    "orders_lateral_top3",
    "tpch_q2_min_cost_supplier",
    "tpch_q21_sole_blamed_supplier",
    "value_p95_sketch_rollup_1h",
    "event_metrics_1m",
    "performance_metrics_5m",
    "session_metrics",
    "session_metrics_bucketed",  # round-9 two-phase skew-resilient twin
    "serving_event_pivot",
    "events_sliding_window_5m1m",
    "asof_purchase_attribution",
    "tpch_q3_shipping_priority",
    "tpch_q9_product_profit",
    "tpch_q13_order_distribution",
    "tpch_q17_small_quantity",
    "top_customers_per_nation",
    "dedup_exact",
    "dedup_minhash_lsh_3gram",
    "dedup_semantic_clustered",
    # round-8 additions
    "dedup_jaccard_prefix_filtered",
    "dedup_jaccard_prefix_bounded",  # round-10 planted-cluster corpus
    "dedup_edit_distance_banded",
    "dedup_duplicate_spans",
    "dedup_span_removal",
    "lineitem_zorder_skipping",
    "sim_cosine_topk",
    "text_stats",
    "text_pii_redaction",
    "text_tfidf_top_terms",
    "text_gopher_flags",
    "emb_quantize_int8",
    "sample_docs_hash",
    "sample_docs_quota",
    "pack_token_budget",
    "events_cohort_retention",
    "text_dup_ngram_fraction",
    "text_unigram_logprob",
    "text_normalize",
    "events_distinct_users_bitmap",
    "events_decayed_engagement",
    "events_rate_limited",
    "sessions_max_concurrency_daily",
    "basket_rules_lift",
    "attribution_linear_credit",
    "pipeline_curation_full",
    "events_error_slo_5m",
    "events_user_streaks",
    "orders_rolling_aov_28d",
    "events_survival_curve",
    "suppliers_nation_hhi",
    "events_value_mad_outliers",
    "value_drift_trailing7",
    "event_counts_salted",
    "funnel_view_click_purchase",
    "events_sliding_window_paned",
    "lineitem_spend_point_in_time",
    "orders_market_basket",
    "events_user_paths",
    "emb_random_projection",
    "events_value_histogram",
    # round 4: connector paths + capped verifiers
    "jdbc_metrics_roundtrip",
    "feed_keyed_roundtrip",
    "dedup_tokenset_jaccard",
    # round 10
    "customers_record_linkage_fs",
    "customers_record_linkage_multipass",
    "basket_graph_communities_lpa",
    "docs_epoch_shuffle",
    "text_bpe_encode_tokens",
    "text_bpe_encode_tokens_kernel",
    "customers_record_linkage_em",
    "customers_blocking_quality",
    # round 11
    "docs_lsh_blocking_quality",
    "sample_docs_temperature_mix",
    "split_docs_group_aware",
    "split_docs_dedup_aware",
    "docs_token_budget_apportionment",
    "docs_curriculum_order",
    "tpch_q22_recent_idle_customers",
    "multimodal_image_channel_stats",
    "docs_lsh_recall_audit",
    "dedup_keep_best_survivors",
    # round 12
    "dedup_incremental_minhash",
    "dedup_incremental_components",
    "multimodal_audio_channel_stats",
    "multimodal_video_frame_stats",
]


def stage_totals(api: str, app_id: str) -> tuple[int, int, int]:
    with urllib.request.urlopen(f"{api}/applications/{app_id}/stages") as r:
        stages = json.load(r)
    rd = sum(s.get("shuffleReadBytes", 0) for s in stages)
    wr = sum(s.get("shuffleWriteBytes", 0) for s in stages)
    sp = sum(s.get("diskBytesSpilled", 0) for s in stages)
    return rd, wr, sp


def fmt(b: int) -> str:
    if b == 0:
        return "0"
    for unit in ("B", "KiB", "MiB", "GiB"):
        if b < 1024:
            return f"{b:.1f} {unit}" if unit != "B" else f"{b} B"
        b /= 1024
    return f"{b:.1f} TiB"


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = (
        SparkSession.builder.appName("rtap-shuffle-report")
        .master(f"local[{os.environ['SPARK_GRAFT_CPUS']}]")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4050")
        .config("spark.ui.retainedStages", "5000")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from realtime_analytics_pipeline_spark import registry
    from realtime_analytics_pipeline_spark.session import tune_session

    tune_session(spark)
    api = "http://localhost:4050/api/v1"
    app_id = spark.sparkContext.applicationId

    rows = []
    base = stage_totals(api, app_id)
    for name in QUERIES:
        registry.QUERIES[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        cur = stage_totals(api, app_id)
        rows.append((name, *[c - b for c, b in zip(cur, base)]))
        base = cur
        print(f"  {name}: read={fmt(rows[-1][1])} write={fmt(rows[-1][2])}"
              f" spill={fmt(rows[-1][3])}", flush=True)

    lines = [
        "# SHUFFLE — measured per-query shuffle/spill "
        f"({os.path.basename(sf_dir)}, noop sink)",
        "",
        "Stage-level byte deltas from the Spark status API while each",
        "flagship query materializes end-to-end. This is the evidence",
        "for the shuffle-budget claims in SCALE.md: map-only passes",
        "(redaction, gopher flags, quantization, hash sampling) move",
        "ZERO shuffle bytes; everything else shuffles its declared",
        "aggregation/join keys and nothing more. Spill ≠ 0 would mean",
        "partitions outgrew executor memory at this SF.",
        "",
        "| query | shuffle read | shuffle write | disk spill |",
        "|---|---|---|---|",
    ]
    for name, rd, wr, sp in rows:
        lines.append(f"| {name} | {fmt(rd)} | {fmt(wr)} | {fmt(sp)} |")
    lines.append("")
    with open("SHUFFLE.md", "w") as f:
        f.write("\n".join(lines))
    print("wrote SHUFFLE.md")


if __name__ == "__main__":
    main()
