"""The external correctness harness checks only the FIRST 50
registrations; this pins the window membership so adding a query
to the wrong module cannot silently evict an oracle-backed entry
(see plans/registry.py::_WINDOW_PRIORITY for the rotation plan).

Round-5 window (the r4 VERDICT's rotation plan, executed): the 11
relational queries green only in round 1 (three rounds of shared-code
churn ago), the 6 upgraded from rows-only to exact oracles this round
(sample_stratified, multimodal_decode_features, dedup_semantic, and
the multimodal decode trio — none ever had a green oracle row), the 2
whose code changed this round after their r4 green rows
(token_pmi_bigrams, mixture_apply), and 31 of the 34 queries whose
latest green row is round 2 (wordlist_extraction_scaled,
multimodal_fingerprints, events_daily_rollup sit out as low-marginal
twins of in-window entries; rotate them back next round). Everything
r3/r4-green and untouched sits out; agg_approx_distinct stays out
permanently (intentional no_oracle).
"""

WINDOW = [
    # round-1-stale relational queries
    'q8_market_share',
    'q9_product_profit',
    'q11_nation_concentration',
    'q12_priority_classes',
    'q13_customer_distribution',
    'q14_promo_revenue',
    'q15_top_supplier',
    'q16_supplier_variety',
    'q19_disjunctive_brackets',
    'q20_part_suppliers',
    'q22_dormant_customers',
    # upgraded rows-only -> exact oracle this round
    'sample_stratified',
    'multimodal_decode_features',
    'dedup_semantic',
    'multimodal_ppm_decode',
    'multimodal_wav_decode',
    'multimodal_frame_sample',
    # edited this round (r4 rows predate the change)
    'token_pmi_bigrams',
    'mixture_apply',
    # last verified in round 2
    'boilerplate_ngrams',
    'clean_text',
    'decontaminate_ngram',
    'doc_chunks',
    'doc_fingerprints',
    'events_asof_cogroup',
    'events_asof_join',
    'events_funnel',
    'events_gap_fill',
    'events_json_extract',
    'events_props_map',
    'events_range_join',
    'events_retention_cohorts',
    'events_rolling_1h',
    'events_sessionize',
    'events_sliding_hour',
    'events_tumbling_hour',
    'events_user_rates',
    'langid_stopword',
    'quality_outlier_trim',
    'quality_repetition',
    'quality_scores',
    'quality_zscore_by_lang',
    'streaming_stateful_counts',
    'streaming_static_enrich',
    'streaming_tumbling_hour',
    'text_stats_by_lang',
    'text_tfidf_topk',
    'token_counts',
    'wordlist_extraction',
    'wordscore_sentiment',
]


def test_driver_window_membership_is_pinned():
    from spark_sentiment_spark.plans.registry import REGISTRY, all_queries

    all_queries()
    assert list(REGISTRY)[:50] == WINDOW


def test_rotation_payload_is_fully_inside_window():
    """Every _WINDOW_PRIORITY entry must actually sit inside the
    driver's 50-entry window (the list must never exceed 50)."""
    from spark_sentiment_spark.plans.registry import (REGISTRY, all_queries,
                                                      _WINDOW_PRIORITY)

    all_queries()
    window = set(list(REGISTRY)[:50])
    missing = [n for n in _WINDOW_PRIORITY if n not in window]
    assert not missing, missing


def test_window_is_fully_oracle_backed():
    """Every window slot carries a DuckDB oracle — rows-only entries get
    a weaker check, so they shouldn't crowd the window."""
    from spark_sentiment_spark.plans.registry import REGISTRY, all_queries

    all_queries()
    rows_only = [n for n in WINDOW if REGISTRY[n].sql is None]
    assert not rows_only, rows_only
