"""Large-scale training-data pipeline operators over ordinary DataFrames.

Beyond the reference's generation surface, these are the operators a 100 TB
LLM-data pipeline needs: deduplication (exact, MinHash-LSH, SimHash,
n-gram Jaccard, embedding cosine), similarity search (brute-force and
LSH-bucketed ANN), text analysis (language ID, quality scoring, token
counting, fingerprinting), and multimodal column plumbing.

Design rules shared by every operator here:

* shuffles move *derived keys* (hashes, signatures, band buckets), never
  full payloads, until the final (small) candidate set;
* everything stays in ``pyspark.sql.functions`` / whole-stage codegen
  unless semantics genuinely require numpy (SimHash bit-packing);
* O(n²) steps are always gated behind a blocking/bucketing stage so the
  quadratic term applies per-bucket, not per-corpus.
"""

from dbldatagen_spark.functions.dedup import (
    cross_corpus_near_duplicates,
    duplicate_components,
    duplicated_span_stats,
    embedding_near_duplicates,
    exact_dedup,
    fuzzy_block_report,
    fuzzy_match_records,
    incremental_dedup,
    minhash_cluster_dedup,
    minhash_near_duplicates,
    ngram_jaccard_pairs,
    semantic_dedup,
    simhash_signatures,
)
from dbldatagen_spark.functions.similarity import (
    cosine_similarity_expr,
    cosine_topk,
    embedding_moments,
    embedding_pca,
    ivf_ann_topk,
    ivf_centroids,
    kmeans_assign,
    kmeans_fit,
    knn_join,
    lsh_bucket_ann_topk,
    normalize_embeddings,
    quantize_embeddings,
    truncate_embeddings,
)
from dbldatagen_spark.functions.skew import hot_key_report, salted_join
from dbldatagen_spark.functions.sessions import session_features, sessionize
from dbldatagen_spark.functions.asof import (
    asof_join,
    asof_join_forward,
    asof_join_nearest,
)
from dbldatagen_spark.functions.ranges import interval_overlap_join, range_join
from dbldatagen_spark.functions.curation import (
    curate_corpus,
    dedup_lines_corpus,
    normalize_text,
    strip_boilerplate_lines,
)
from dbldatagen_spark.functions.sampling import (
    budget_select,
    deterministic_sample,
    mix_corpus,
    quota_sample,
    split_assign,
    stratified_sample,
    weighted_sample,
)
from dbldatagen_spark.functions.outliers import (
    quantile_bucket,
    robust_outlier_flags,
    winsorize,
    zscore_normalize,
)
from dbldatagen_spark.functions.cdc import (
    apply_cdc,
    cdc_change_counts,
    derive_cdc,
    merge_aggregates,
    mergeable_aggregate,
)
from dbldatagen_spark.functions.analytics import (
    cohort_retention,
    common_paths,
    funnel_steps,
    transition_matrix,
)
from dbldatagen_spark.functions.bloom import (
    bloom_anti_join,
    bloom_build,
    bloom_contains_expr,
    bloom_positions_expr,
    bloom_semi_join,
)
from dbldatagen_spark.functions.sketches import (
    kmv_estimate_expr,
    cms_bucket_expr,
    cms_estimate,
    cms_heavy_hitters,
    cms_join_size,
    cms_merge,
    cms_sketch,
    histogram_merge,
    histogram_quantiles,
    histogram_sketch,
    kmv_hash_expr,
    kmv_merge_expr,
    kmv_sketch,
)
from dbldatagen_spark.functions.pairs import contrastive_negatives
from dbldatagen_spark.functions.ratelimit import rate_limit_events
from dbldatagen_spark.functions.expectations import (
    expectation_report,
    missing_periods,
    psi_report,
    schema_diff,
    sequence_gaps,
)
from dbldatagen_spark.functions.layout import zorder_sort, zorder_value_expr
from dbldatagen_spark.functions.timeseries import (
    cusum_flags,
    ewma,
    ohlc_bars,
    seasonal_residual_flags,
    time_gap_fill,
)
from dbldatagen_spark.functions.scd import scd2_intervals, scd2_lookup, scd2_validate
from dbldatagen_spark.functions.packing import (
    pack_sequences,
    packing_stats,
    sequence_length_histogram,
)
from dbldatagen_spark.functions.dedup import ngram_contamination
from dbldatagen_spark.functions.text_analysis import (
    assign_training_shards,
    bm25_search,
    charlm_score,
    chunk_documents,
    gopher_quality_flags,
    corpus_stats,
    tfidf_terms,
    detect_language,
    dsir_importance,
    document_fingerprint,
    ngram_counts,
    quality_metrics,
    repetition_metrics,
    mojibake_stats,
    token_count_expr,
    token_entropy,
    token_vocabulary,
)
from dbldatagen_spark.functions.pii import (
    PII_PATTERNS,
    dp_noisy_counts,
    k_anonymity_report,
    redact_pii,
    redact_text_expr,
)
from dbldatagen_spark.functions.multimodal import (
    MEDIA_SIGNATURES,
    detect_media_type_expr,
    detect_media_types,
    extract_audio_features,
    image_near_duplicates,
    image_phash,
    resize_ppm_images,
    sample_video_frames,
)

__all__ = [
    "sessionize",
    "session_features",
    "detect_media_types",
    "detect_media_type_expr",
    "image_phash",
    "image_near_duplicates",
    "charlm_score",
    "duplicated_span_stats",
    "gopher_quality_flags",
    "dsir_importance",
    "semantic_dedup",
    "fuzzy_match_records",
    "fuzzy_block_report",
    "incremental_dedup",
    "mix_corpus",
    "pack_sequences",
    "packing_stats",
    "sequence_length_histogram",
    "time_gap_fill",
    "seasonal_residual_flags",
    "ohlc_bars",
    "scd2_intervals",
    "scd2_lookup",
    "scd2_validate",
    "quota_sample",
    "budget_select",
    "weighted_sample",
    "winsorize",
    "robust_outlier_flags",
    "zscore_normalize",
    "quantile_bucket",
    "apply_cdc",
    "cdc_change_counts",
    "derive_cdc",
    "mergeable_aggregate",
    "merge_aggregates",
    "truncate_embeddings",
    "funnel_steps",
    "cohort_retention",
    "transition_matrix",
    "common_paths",
    "contrastive_negatives",
    "rate_limit_events",
    "expectation_report",
    "psi_report",
    "sequence_gaps",
    "schema_diff",
    "missing_periods",
    "zorder_value_expr",
    "zorder_sort",
    "k_anonymity_report",
    "dp_noisy_counts",
    "resize_ppm_images",
    "extract_audio_features",
    "sample_video_frames",
    "normalize_text",
    "dedup_lines_corpus",
    "token_entropy",
    "asof_join",
    "asof_join_forward",
    "asof_join_nearest",
    "cross_corpus_near_duplicates",
    "assign_training_shards",
    "bm25_search",
    "corpus_stats",
    "tfidf_terms",
    "ngram_contamination",
    "ngram_counts",
    "token_vocabulary",
    "range_join",
    "interval_overlap_join",
    "salted_join",
    "hot_key_report",
    "normalize_embeddings",
    "quantize_embeddings",
    "chunk_documents",
    "cosine_similarity_expr",
    "curate_corpus",
    "cosine_topk",
    "embedding_moments",
    "embedding_pca",
    "ivf_ann_topk",
    "ivf_centroids",
    "kmeans_assign",
    "kmeans_fit",
    "knn_join",
    "detect_language",
    "deterministic_sample",
    "document_fingerprint",
    "duplicate_components",
    "embedding_near_duplicates",
    "exact_dedup",
    "lsh_bucket_ann_topk",
    "minhash_cluster_dedup",
    "minhash_near_duplicates",
    "ngram_jaccard_pairs",
    "quality_metrics",
    "redact_pii",
    "redact_text_expr",
    "repetition_metrics",
    "PII_PATTERNS",
    "simhash_signatures",
    "split_assign",
    "stratified_sample",
    "strip_boilerplate_lines",
    "token_count_expr",
    "mojibake_stats",
    "bloom_anti_join",
    "bloom_build",
    "bloom_contains_expr",
    "bloom_positions_expr",
    "bloom_semi_join",
    "kmv_estimate_expr",
    "kmv_hash_expr",
    "kmv_merge_expr",
    "kmv_sketch",
    "cms_bucket_expr",
    "cms_sketch",
    "cms_merge",
    "cms_estimate",
    "cms_join_size",
    "cms_heavy_hitters",
    "histogram_sketch",
    "histogram_merge",
    "histogram_quantiles",
    "ewma",
    "cusum_flags",
]
