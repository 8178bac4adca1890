"""featureengineer_ray — a Ray-Data-native feature-engineering engine.

Brand-new engine (not a port) with the query/data-processing capabilities of
the reference `YihengJiang/featureEngineer` (see SURVEY.md), re-expressed as
a point-in-time as-of join + windowed feature stack (backfill, lag/lead,
rolling aggregates, sessionize) over Parquet tables of pre-tokenized training
sequences, executed as ray.data.Dataset pipelines of map_batches over
zero-copy Arrow batches.

NOTE: nothing in this package calls ray.init()/ray.shutdown() — sessions are
owned by the caller (driver, bench.py, or the pytest fixture).
"""

__version__ = "0.2.0"

# Public surface (import paths are stable; modules lazy-import Ray):
#   engine      — WindowSpec, window_features, asof_join (+range_windows),
#                 feature_stack, feature_stack_late
#   partition   — plan_partitions, estimate_rows, hash_shuffle_width
#   relational  — broadcast_join, semi_join, grouped_agg, grouped_top_k,
#                 top_k, global_rank, global_cumsum (distributed prefix scan)
#   dedup       — exact_dedup, minhash_*, verify_jaccard_distributed,
#                 ngram_jaccard_pairs, connected_components,
#                 simhash64, simhash_near_dup_pairs, embedding_near_dup_pairs
#   knn         — brute_force_topk, ivf_topk, ivf_build, ivf_search
#   vecops      — project, whiten, vector_moments, length_norm,
#                 standardize_dims, class_vector_means, lda_fit
#   metrics     — det_curve, eer_summary, write_metrics_artifact
#   iterfit     — kmeans_fit, kmeans_assign (EM lifecycle + checkpoints)
#   text        — Tokenizer, LangIdQuality, doc_stats_batch,
#                 fingerprint_batch, clean_text_batch, bigram_frequencies
#   encoders    — target_encode_loo, target_encode_smoothed, robust_scale
#   multimodal  — media_pipeline, MediaResizer, FrameSampler,
#                 bmp/wav/y4m codecs + real-decode pipelines
#   lineage     — write_feature_stack (resumable partitioned sink)
