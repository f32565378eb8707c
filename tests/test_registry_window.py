"""The driver's correctness gate hash-checks exactly the first 50
registered queries. This suite pins the window's composition so a
refactor can't silently push an oracle-bearing query family out of
driver verification again (round-1 lesson: the whole dedup/ANN family
registered past the window and got no CORRECTNESS rows)."""

from __future__ import annotations

from hadoop_project_spark.plans import all_queries

WINDOW = 50

# Queries that MUST be driver-verified: the unique in-window
# representative of an operator family (dedup, ANN, multimodal,
# correlated subqueries, session windows, approx bounds) or of a
# SURVEY §2 row.
MUST_VERIFY = {
    "word_count",
    "word_count_filtered",
    "two_leg_conversion",
    "pricing_summary",
    "regional_revenue",
    "big_spender_segments",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash_signatures",
    "dedup_simhash_pairs",
    "dedup_ngram_jaccard",
    "dedup_clusters",
    "ann_topk_bruteforce",
    "ann_topk_lsh_verified",
    "embedding_neardup_pairs",
    "multimodal_features",
    "events_session_window_batch",
    "events_sessionization_batch",
    "orders_with_late_items",
    "small_qty_part_revenue",
    "bulk_share_suppliers",
    "approx_distinct_users_daily",
    "approx_price_percentiles",
    "corpus_quality_by_lang",
    "docs_source_groups",
    "csv_roundtrip_word_count",
    "partitioned_parquet_roundtrip",
    "bucketed_join_roundtrip",
    "doc_chunks_overlap",
    "sequence_packing",
}


def test_window_has_no_oracle_less_queries():
    specs = list(all_queries().values())[:WINDOW]
    missing = [s.name for s in specs if s.oracle is None]
    assert not missing, f"oracle-less queries inside the driver window: {missing}"


def test_must_verify_queries_inside_window():
    window_names = set(list(all_queries())[:WINDOW])
    out = MUST_VERIFY - window_names
    assert not out, f"must-verify queries outside the driver window: {out}"


def test_exiled_queries_are_redundant_variants():
    """Everything past the window is either oracle-less-by-design
    (iterative / approximate-recall queries) or a relational variant
    whose operator row is covered by an in-window query."""
    qs = all_queries()
    outside = list(qs)[WINDOW:]
    coverage = {
        # exiled name -> in-window query covering the same operator row
        "customers_without_orders": "big_spender_segments",  # J4 anti/semi
        "most_valuable_order": "latest_event_per_user",  # A13 argmax
        "order_fanout_stats": "approx_distinct_users_daily",  # distinct agg
        "orders_cube": "orders_grouping_sets",  # grouping analytics
        "events_top_users": "shipping_priority_topk",  # top-k
        "part_popularity": "regional_revenue",  # J3 broadcast join
        "daily_activity_full_outer": "supplier_nation_balance",  # join+agg
        "user_event_gaps": "order_rank_stats",  # O2 secondary sort window
        "repeat_buyers_intersect": "never_urgent_buyers_except",  # setop
        "activity_feed_monthly": "never_urgent_buyers_except",  # setop/union
        "events_sliding_hourly": "events_hourly_rollup",  # time windows
        "price_histogram": "lineitem_global_minmax",  # A10 two-pass
        "qty_price_correlation": "price_percentiles_by_priority",  # stats agg
        # oracle-verified by tests/test_oracle_parity.py every CI run;
        # ANN family's in-window representative is the LSH pipeline
        "ann_topk_ivf": "ann_topk_lsh_verified",
        # composite of in-window-verified stages (lang/quality/dedup/
        # window budget); oracle runs in every CI pass
        "training_data_mix": "corpus_quality_by_lang",
        "multimodal_frame_samples": "multimodal_features",
        "multimodal_audio_windows": "multimodal_features",
        # reshape family; the in-window pivot rep is priority_month_matrix
        "lineitem_measures_unpivot": "priority_month_matrix",
        # argmin-per-group; in-window argmax rep + Q17/Q20 correlated reps
        "cheapest_supplier_per_part": "latest_event_per_user",
        # corpus-governance family (oracles run every CI pass); gram-join
        # machinery's in-window rep is the jaccard dedup query, scan-stage
        # text scoring's rep is the quality rollup
        "decontaminate_ngram": "dedup_ngram_jaccard",
        "source_overlap_matrix": "dedup_ngram_jaccard",
        "doc_repetition_stats": "corpus_quality_by_lang",
        "docs_hash_sample": "docs_source_groups",
        # displaced to make room for the roundtrip sink/source anchors:
        # join-back-to-agg shape is covered by the Q4/Q17 correlated reps
        "orders_above_customer_avg": "small_qty_part_revenue",
        # token-count stats roll up inside the in-window quality rollup
        "doc_token_stats": "corpus_quality_by_lang",
        # distinct-count agg embedded in the approx bounds oracle
        "exact_distinct_users_daily": "approx_distinct_users_daily",
        # distributed ranking; in-window window-function rep
        "customer_value_deciles": "order_rank_stats",
        # layout-sink family; in-window write-path rep
        "zorder_roundtrip": "partitioned_parquet_roundtrip",
        # R4 salting equivalence; in-window keyed-agg rep
        "events_user_rollup_salted": "events_hourly_rollup",
        # dense-fill family; in-window A7 rep
        "events_timespine_gapfill": "priority_month_dense_counts",
        # fingerprint op: dedup_exact keys on the same md5-of-normalized
        "doc_fingerprints": "dedup_exact",
        # O2 secondary-sort window family
        "top3_orders_per_customer": "order_rank_stats",
        # explode/agg/join machinery reps; oracle runs every CI pass
        "tfidf_top_terms": "word_count",
        "source_quality_cap": "corpus_quality_by_lang",
        # correlated EXISTS/NOT-EXISTS family's in-window rep (Q4 shape)
        "sole_late_supplier_orders": "orders_with_late_items",
        # SQL-text entry path plans identically to the DataFrame form;
        # multi-way join+agg's in-window rep
        "nation_trade_volume_sql": "regional_revenue",
        # incremental merge vs full recompute; in-window sink rep
        "incremental_rollup_roundtrip": "partitioned_parquet_roundtrip",
        # distribution-agg machinery's in-window rep
        "events_key_skew_profile": "price_percentiles_by_priority",
        # keyed join+agg machinery's in-window rep
        "orders_snapshot_diff": "supplier_nation_balance",
        # global min/max + distinct-count machinery's in-window reps
        "lineitem_column_profile": "lineitem_global_minmax",
        # parquet write→read family's in-window rep
        "schema_evolution_roundtrip": "partitioned_parquet_roundtrip",
        # embedding-column machinery's in-window rep
        "embedding_quantize_profile": "ann_topk_lsh_verified",
        # per-user lag/lead window machinery's in-window rep
        "user_state_history_scd2": "events_sessionization_batch",
        # partitioned write→read family's in-window rep; the DPP plan
        # property itself is gated in test_plan_shapes.py
        "dpp_partitioned_join_roundtrip": "partitioned_parquet_roundtrip",
        # oracle-less by design:
        "ann_topk_lsh": None,
        "kmeans_centroids": None,
        "kmeans_cluster_sizes": None,
        "kmeans_silhouette": None,
    }
    window_names = set(list(qs)[:WINDOW])
    unexplained = [n for n in outside if n not in coverage]
    assert not unexplained, f"exiled without a coverage mapping: {unexplained}"
    for name, rep in coverage.items():
        if rep is not None:
            assert rep in window_names, (name, rep)
