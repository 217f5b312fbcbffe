"""The external correctness harness checks only the FIRST 50
registrations; this pins the window membership so adding a query
to the wrong module cannot silently evict an oracle-backed entry
(see plans/registry.py::_WINDOW_PRIORITY for the rotation plan).

Round-3 window: the 36 queries with no CORRECTNESS row from rounds
1-2, then new round-3 queries, then already-proven canaries filling
any remaining slots.
"""

WINDOW = [
    # 36 never-driver-checked (r01 ∪ r02) — the rotation payload
    'pack_sequences',
    'split_by_hash',
    'cap_per_source',
    'vocab_coverage',
    'mixture_sample',
    'curriculum_buckets',
    'sample_exact_n',
    'shuffle_shards',
    'skew_salted_agg',
    'merge_upsert',
    'snapshot_diff',
    'quality_gate',
    'quality_gate_rates',
    'quality_perplexity',
    'langid_confusion',
    'dedup_prefix',
    'dedup_incremental',
    'dedup_incremental_bloom',
    'dedup_semantic',
    'bpe_merges',
    'bpe_token_counts',
    'hybrid_search_rrf',
    'embedding_pca',
    'profile_columns',
    'corr_matrix',
    'events_dedup_latest',
    'events_volume_anomaly',
    'events_heatmap',
    'multimodal_headers',
    'multimodal_ppm_decode',
    'multimodal_wav_decode',
    'multimodal_frame_sample',
    'streaming_sessionize',
    'streaming_volume_anomaly',
    'q2_min_cost_supplier',
    'q21_waiting_suppliers',
    # new round-3 queries (no prior rows by definition)
    'decontaminate_minhash',
    'events_transitions',
    'events_attribution',
    # proven canaries fill the tail
    'dedup_exact',
    'dedup_jaccard_pairs',
    'dedup_minhash_lsh',
    'dedup_simhash',
    'dedup_clusters',
    'knn_cosine_topk',
    'embedding_centroids',
    'ann_ivf_topk',
    'dedup_embedding_cosine',
    'ann_lsh_topk',
    'embedding_quantize',
]


def test_driver_window_membership_is_pinned():
    from spark_sentiment_spark.plans.registry import REGISTRY, all_queries

    all_queries()
    assert list(REGISTRY)[:50] == WINDOW


def test_rotation_payload_is_fully_inside_window():
    """Every query that lacked a CORRECTNESS row after round 2 must sit
    inside the driver's 50-entry window this round."""
    from spark_sentiment_spark.plans.registry import (REGISTRY, all_queries,
                                                      _WINDOW_PRIORITY)

    all_queries()
    window = set(list(REGISTRY)[:50])
    missing = [n for n in _WINDOW_PRIORITY if n not in window]
    assert not missing, missing


def test_window_is_oracle_dense():
    """Most window slots must carry a DuckDB oracle — rows-only entries
    get a weaker check, so they shouldn't crowd the window."""
    from spark_sentiment_spark.plans.registry import REGISTRY, all_queries

    all_queries()
    rows_only = [n for n in WINDOW if REGISTRY[n].sql is None]
    assert len(rows_only) <= 13, rows_only
