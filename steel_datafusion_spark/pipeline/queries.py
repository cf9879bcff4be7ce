"""Pipeline-operator query catalog (dedup / similarity / text / multimodal).

Same contract as steel_datafusion_spark.queries: name -> (fn, oracle_sql).
The synthetic corpus has no natural duplicates (500/500 distinct texts at
sf0.01), so the dedup queries run on a deterministic augmented corpus —
docs with id<20 get a near-copy (id+1000000, ' steel spark dedup' appended)
— built identically in the Spark plan and the oracle CTE, so the operators
demonstrably find the planted near-dups.

Embeddings likewise get exact copies (id+1000000) of vec_id<10 for the
near-dup query.  All scoring is rounded to 6dp before ranking on both
engines (see pipeline/similarity.py determinism notes).


Round 11 split the 5k-line registry into family chunk modules
(gates_common + gates_NN, ~1.1k lines each); this module re-exports
every gate name unchanged and assembles the PIPELINE_QUERIES registry,
so importers (tests, tools, all_queries) are unaffected.
"""

from __future__ import annotations

from .gates_common import *  # noqa: F401,F403
from .gates_01 import *  # noqa: F401,F403
from .gates_02 import *  # noqa: F401,F403
from .gates_03 import *  # noqa: F401,F403
from .gates_04 import *  # noqa: F401,F403
from .gates_05 import *  # noqa: F401,F403



PIPELINE_QUERIES = {
    "triangle_count": (q_triangle_count, _sql_triangle_count_gate()),
    "data_skipping_read": (q_data_skipping_read, _SQL_DATA_SKIPPING_READ),
    "data_skipping_bloom": (q_data_skipping_bloom, _SQL_DATA_SKIPPING_BLOOM),
    "streaming_cdc_feed": (q_streaming_cdc_feed, _SQL_STREAMING_CDC_FEED),
    "text_stats": (q_text_stats, _SQL_TEXT_STATS),
    "text_quality_by_source": (q_text_quality_by_source, _SQL_TEXT_QUALITY),
    "pii_redact": (q_pii_redact, _sql_pii_redact()),
    "stratified_sample": (q_stratified_sample, _sql_stratified_sample()),
    "hash_split": (q_hash_split, _sql_hash_split()),
    "domain_cap": (q_domain_cap, _sql_domain_cap()),
    "shard_assignment": (q_shard_assignment, _sql_shard_assignment()),
    "weighted_sample": (q_weighted_sample, _sql_weighted_sample()),
    "sequence_packing": (q_sequence_packing, _sql_sequence_packing()),
    "fuzzy_match": (q_fuzzy_match, _sql_fuzzy_match()),
    "repetition_quality": (q_repetition_quality, _sql_repetition_quality()),
    "decontaminate": (q_decontaminate, _sql_decontaminate()),
    "mixture_resample": (q_mixture_resample, _sql_mixture_resample()),
    "mixture_temperature": (q_mixture_temperature, _sql_mixture_temperature()),
    "token_budget_subset": (q_token_budget_subset, _sql_token_budget()),
    "corpus_overlap": (q_corpus_overlap, _sql_corpus_overlap()),
    "funnel_conversion": (q_funnel, _SQL_FUNNEL),
    "cohort_retention": (q_cohort_retention, _SQL_COHORT),
    "event_transitions": (q_event_transitions, _SQL_TRANSITIONS),
    "dedup_exact": (q_dedup_exact, _SQL_DEDUP_EXACT),
    "dedup_minhash_lsh": (q_dedup_minhash, _sql_dedup_minhash()),
    "dedup_incremental": (q_dedup_incremental, _sql_dedup_incremental()),
    "dedup_index_probe": (q_dedup_index_probe, _sql_dedup_incremental()),
    "dedup_simhash_fingerprints": (q_dedup_simhash_fingerprints, _sql_simhash_fps()),
    "dedup_simhash_pairs": (q_dedup_simhash_pairs, _sql_simhash_pairs()),
    "dedup_clusters": (q_dedup_clusters, _sql_dedup_clusters()),
    "dedup_clusters_twophase": (q_dedup_clusters_twophase, _sql_dedup_clusters()),
    "dedup_apply": (q_dedup_apply, _sql_dedup_apply()),
    "dedup_keep_best": (q_dedup_keep_best, _sql_dedup_keep_best()),
    "dedup_ngram_jaccard": (q_dedup_ngram_jaccard, _sql_ngram_jaccard()),
    "similarity_topk": (q_similarity_topk, _SQL_SIM_TOPK),
    "similarity_ivf": (q_similarity_ivf, _SQL_SIM_IVF),
    "ann_recall": (q_ann_recall, _sql_ann_recall()),
    "ann_index_probe": (q_ann_index_probe, _SQL_SIM_IVF),
    "ann_index_append": (q_ann_index_append, _SQL_ANN_INDEX_APPEND),
    "dedup_index_append": (q_dedup_index_append, _sql_dedup_incremental()),
    "ann_index_recall": (q_ann_index_recall, _sql_ann_index_recall()),
    "streaming_index_maintenance": (q_streaming_index_maintenance,
                                    _SQL_ANN_INDEX_APPEND),
    "streaming_dedup_ingest": (q_streaming_dedup_ingest,
                               _sql_streaming_dedup_ingest()),
    "embedding_neardup": (q_embedding_neardup, _sql_emb_neardup()),
    "embedding_dedup": (q_embedding_dedup, _sql_embedding_dedup()),
    "embedding_neardup_banded": (q_embedding_neardup_banded,
                                 _sql_emb_neardup_banded()),
    "multimodal_features": (q_multimodal_features, _SQL_MULTIMODAL),
    "audio_features": (q_audio_features, _SQL_AUDIO_FEATURES),
    "video_features": (q_video_features, _SQL_VIDEO_FEATURES),
    "mp4_metadata": (q_mp4_metadata, _SQL_MP4_METADATA),
    "mp3_metadata": (q_mp3_metadata, _SQL_MP3_METADATA),
    "flac_metadata": (q_flac_metadata, _SQL_FLAC_METADATA),
    "ogg_metadata": (q_ogg_metadata, _SQL_OGG_METADATA),
    "mpegts_metadata": (q_mpegts_metadata, _SQL_MPEGTS_METADATA),
    "webm_metadata": (q_webm_metadata, _SQL_WEBM_METADATA),
    "media_curation": (q_media_curation, _SQL_MEDIA_CURATION),
    "winnow_fingerprints": (q_winnow_fingerprints, _SQL_WINNOW),
    "kmeans_clusters": (q_kmeans_clusters, _sql_kmeans()),
    "semdedup_prune": (q_semdedup_prune, _sql_semdedup()),
    "tfidf_top_terms": (q_tfidf_top_terms, _sql_tfidf()),
    "similarity_lsh": (q_similarity_lsh, _sql_similarity_lsh()),
    "asof_join": (q_asof_join, _SQL_ASOF),
    "asof_join_forward": (q_asof_join_forward, _SQL_ASOF_FORWARD),
    "asof_join_tolerance": (q_asof_join_tolerance, _SQL_ASOF_TOLERANCE),
    "range_join": (q_range_join, _SQL_RANGE_JOIN),
    "hypertable_rollup": (q_hypertable_rollup, _SQL_HYPERTABLE),
    # DataSketches estimate bits aren't DuckDB-reproducible; the gate hashes
    # exact counts + a within-published-bound boolean (semantics in
    # tests/test_sketches.py)
    "sketch_distinct_rollup": (q_sketch_distinct_rollup, _SQL_SKETCH_ROLLUP),
    # KLL estimate bits likewise aren't DuckDB-reproducible: hash the exact
    # percentiles + within-rank-bound booleans (two-level merge path)
    "sketch_quantile_rollup": (q_sketch_quantile_rollup, _SQL_KLL_ROLLUP),
    "frame_sample_rollup": (q_frame_sample_rollup, _SQL_FRAME_SAMPLE),
    "resize_media_stats": (q_resize_media_stats, _SQL_RESIZE_MEDIA),
    "similarity_pq": (q_similarity_pq, _sql_similarity_pq()),
    "embedding_normalize": (q_embedding_normalize, _SQL_EMB_NORMALIZE),
    "embedding_sq8": (q_embedding_sq8, _sql_embedding_sq8()),
    "embedding_covariance": (q_embedding_covariance,
                             _sql_embedding_covariance()),
    "hard_negatives": (q_hard_negatives, _sql_hard_negatives()),
    "hard_negatives_ivf": (q_hard_negatives_ivf, _sql_hard_negatives_ivf()),
    "iqr_outlier_filter": (q_iqr_outlier_filter, _SQL_IQR_OUTLIER),
    "doc_chunking": (q_doc_chunking, _sql_doc_chunking()),
    "dedup_substring_spans": (q_dedup_substring_spans,
                              _sql_dedup_substring_spans()),
    "heavy_hitters": (q_heavy_hitters, _sql_heavy_hitters_gate()),
    "quality_classifier": (q_quality_classifier, _sql_quality_classifier()),
    "gopher_rules": (q_gopher_rules, _sql_gopher_rules_gate()),
    "bpe_learn": (q_bpe_learn, _sql_bpe_learn_gate()),
    "unigram_logprob": (q_unigram_logprob, _sql_unigram_logprob()),
    "bigram_logprob": (q_bigram_logprob, _sql_bigram_logprob()),
    "perplexity_buckets": (q_perplexity_buckets, _sql_perplexity_buckets()),
    "tfidf_doc_topk": (q_tfidf_doc_topk, _sql_tfidf_doc_topk()),
    "source_kl": (q_source_kl, _sql_source_kl()),
    "bm25_rank": (q_bm25_rank, _sql_bm25_rank()),
    "bloom_decontaminate": (q_bloom_decontaminate,
                            _sql_bloom_decontaminate()),
    "cdc_snapshot_diff": (q_cdc_snapshot_diff, _sql_cdc_snapshot_diff()),
    "scd2_merge": (q_scd2_merge, _sql_scd2_merge()),
    "countmin_term_counts": (q_countmin_term_counts,
                             _sql_countmin_term_counts()),
    "ngram_novelty": (q_ngram_novelty, _sql_ngram_novelty()),
    "source_overlap_matrix": (q_source_overlap_matrix,
                              _sql_source_overlap_matrix()),
    "source_overlap_sketch": (q_source_overlap_sketch,
                              _sql_source_overlap_sketch()),
    "association_rules": (q_association_rules, _sql_association_rules()),
    "incremental_agg": (q_incremental_agg, _sql_incremental_agg()),
    "label_propagation": (q_label_propagation,
                          _sql_label_propagation_gate()),
    "pagerank_event_graph": (q_pagerank_event_graph,
                             _sql_pagerank_event_graph()),
    "pagerank_bucketed": (q_pagerank_bucketed_bipartite,
                          _sql_pagerank_bucketed_bipartite()),
    "line_dedup": (q_line_dedup, _sql_line_dedup()),
    "url_canonicalize": (q_url_canonicalize, _sql_url_canonicalize()),
    "html_strip": (q_html_strip, _sql_html_strip()),
    "streaming_sessions": (q_streaming_sessions, _SQL_STREAMING_SESSIONS),
    "streaming_windowed": (q_streaming_windowed, _SQL_STREAMING_WINDOWED),
    "streaming_view_maintenance": (q_streaming_view_maintenance,
                                   _SQL_STREAMING_IVM),
    "streaming_join_outer": (q_streaming_join_outer,
                             _SQL_STREAMING_JOIN_OUTER),
    "streaming_join_full_outer": (q_streaming_join_full_outer,
                                  _SQL_STREAMING_JOIN_FULL_OUTER),
    "streaming_ingest": (q_streaming_ingest, _SQL_STREAMING_INGEST),
    "streaming_stateful_stats": (q_streaming_stateful_stats,
                                 _SQL_STREAMING_STATEFUL),
    "compact_roundtrip": (q_compact_roundtrip, _SQL_COMPACT_ROUNDTRIP),
    "manifest_merge_apply": (q_manifest_merge_apply,
                             _SQL_MANIFEST_MERGE_APPLY),
    "streaming_join": (q_streaming_join, _SQL_STREAMING_JOIN),
    "streaming_hopping": (q_streaming_hopping, _SQL_STREAMING_HOPPING),
    "streaming_enrich": (q_streaming_enrich, _SQL_STREAMING_ENRICH),
    "streaming_dedup": (q_streaming_dedup, _SQL_STREAMING_DEDUP),
    "robust_stats": (q_robust_stats, _sql_robust_stats()),
    "dsir_select": (q_dsir_select, _sql_dsir_select()),
    "zorder_skipping": (q_zorder_skipping, _sql_zorder_skipping()),
    "compaction_plan": (q_compaction_plan, _sql_compaction_plan()),
    "debounce_events": (q_debounce_events, _sql_debounce_events()),
    "schema_evolution": (q_schema_evolution, _SQL_SCHEMA_EVOLUTION),
    "csv_dirty_read": (q_csv_dirty_read, _SQL_CSV_DIRTY),
    "bpe_segment_tokens": (q_bpe_segment_tokens, _sql_bpe_segment_gate()),
    "skew_diagnose": (q_skew_diagnose, _sql_skew_diagnose()),
    "logreg_quality": (q_logreg_quality, _sql_logreg_quality()),
    "join_size_estimate": (q_join_size_estimate,
                           _sql_join_size_estimate()),
    "validate_expectations": (q_validate_expectations,
                              _sql_validate_expectations()),
    "gapfill_resample": (q_gapfill_resample, _sql_gapfill_resample()),
}
