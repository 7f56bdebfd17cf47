"""Beyond-reference scale operators bound to driver testdata — façade.

Round 12 split the former 7.4k-line module into family files
(scale_dd / scale_ann / scale_mm / scale_txt / scale_ml / scale_misc
over shared helpers in scale_common); this module merges their
registries back into the ORIGINAL registration order — the driver's
correctness gate samples the head of the registry, so order is part
of the surface — and re-exports every helper and query function so
existing importers (streaming_queries, io_queries, tests) are
unchanged.

Oracle-generation notes (unchanged from the pre-split module):
- MinHash/SimHash/fingerprint SQL is GENERATED from the same constants
  as the Spark plan (operators/hashing.py), so both engines compute
  bit-identical signatures;
- dot products are strict left folds on both sides
  (Spark ``aggregate`` / DuckDB ``list_reduce`` with a prepended 0.0)
  so float summation order is identical;
- the LSH-bucketed ANN variant has no SQL equivalent → rows-only check.
"""

from __future__ import annotations

from .scale_common import *  # noqa: F401,F403
from .scale_dd import *  # noqa: F401,F403
from .scale_ann import *  # noqa: F401,F403
from .scale_mm import *  # noqa: F401,F403
from .scale_txt import *  # noqa: F401,F403
from .scale_ml import *  # noqa: F401,F403
from .scale_misc import *  # noqa: F401,F403
from . import (  # noqa: E402  (import order fixed: dd before misc,
    scale_ann,  # ann before ml — the lazy cross-family oracle
    scale_common,  # accessors in scale_common resolve at call time)
    scale_dd,
    scale_misc,
    scale_ml,
    scale_mm,
    scale_txt,
)

_PARTS = (scale_dd, scale_ann, scale_mm, scale_txt, scale_ml,
          scale_misc)

# The exact pre-split registration order (families interleave — the
# file grew by accretion over rounds 4-11 and the driver gate samples
# the registry head, so the order is pinned, not cosmetic).
_ORDER = (
    "dd_exact_groups",
    "dd_minhash_lsh",
    "dd_lsh_bucket_audit",
    "dd_ngram_jaccard",
    "dd_dup_clusters",
    "dd_dup_clusters_twostar",
    "dd_simhash",
    "dd_embedding_cosine",
    "ann_cosine_topk",
    "emb_similarity_histogram",
    "ann_ivf_topk",
    "ann_probe_sweep",
    "emb_random_projection",
    "ann_recall_report",
    "ann_lsh_topk",
    "ann_knn_graph",
    "graph_knn_mutual_components",
    "emb_l2_normalize",
    "txt_lang_id",
    "txt_quality",
    "txt_token_counts",
    "txt_fingerprint",
    "txt_tfidf",
    "txt_top_bigrams",
    "a6_salted_counts",
    "j8_skew_join",
    "mm_decode_metadata",
    "mm_decode_real_headers",
    "mm_extract_features",
    "mm_frame_sample",
    "mm_pixel_stats",
    "mm_webp_pixel_stats",
    "mm_ahash_dedup",
    "mm_ahash_near",
    "mm_pixel_knn",
    "mm_pcm_stats",
    "mm_audio_matches",
    "mm_clip_matches",
    "mm_frame_stats",
    "txt_quality_filter",
    "ml_kmeans_centroids",
    "ml_kmeans_scalable_init",
    "dd_semantic_prune",
    "dd_chunk_dedup",
    "ann_ivf_trained",
    "dd_containment",
    "dd_containment_lsh",
    "txt_gopher_rules",
    "txt_repetition_rules",
    "txt_hapax_ratio",
    "txt_oov_rate",
    "dd_source_overlap_matrix",
    "dd_decontaminate",
    "dd_bloom_prefilter",
    "emb_quantize_int8",
    "pii_pseudonymize",
    "pii_redact",
    "pii_dp_release",
    "pii_dp_bounded_sum",
    "txt_unigram_logprob",
    "txt_kl_by_source",
    "txt_bigram_perplexity",
    "txt_chunk_windows",
    "pipeline_corpus_funnel",
    "dd_incremental_new_docs",
    "mm_audio_windows",
    "txt_pack_sequences",
    "mm_image_patches",
    "graph_pagerank_suppliers",
    "graph_triangles",
    "dd_fuzzy_match",
    "dd_split_leakage",
    "pipeline_remix_sources",
    "pipeline_global_shuffle",
    "txt_line_filter",
    "pii_cc_luhn",
    "mm_decode_arrow",
    "txt_length_buckets",
    "emb_gram_matrix",
    "ml_pca_top_component",
    "txt_dsir_importance",
    "dd_substring_spans",
    "emb_standardize",
    "txt_pmi_collocations",
    "graph_kcore",
    "dd_boilerplate",
    "txt_bpe_encode",
    "txt_bpe_merges",
    "pii_k_anonymity",
    "mm_shard_assign",
    "ann_pq_topk",
    "ann_pq_trained",
    "dd_savings_ledger",
    "pipeline_mix_planner",
    "txt_char_entropy",
    "ann_drift_monitor",
    "ann_ivfpq_topk",
    "ml_kcenter_coreset",
    "ml_negative_audit",
    "ml_mmr_select",
    "dd_url_canonicalize",
    "txt_html_strip",
    "graph_bfs_hops",
    "dd_keep_best_quality",
    "o4_cluster_cap_sample",
    "o4_cluster_split",
    "pipeline_data_card",
    "txt_bm25_topk",
    "ml_hybrid_rrf",
    "ann_ivfpq_refine",
    "txt_nb_classifier",
    "ml_retrieval_metrics",
    "ann_filtered_brute",
    "ann_filtered_ivfpq",
    "pipeline_preference_pairs",
    "dd_prefix_filter_join",
    "ml_hard_negatives",
    "ml_cascade_rerank",
    "ml_auc_gate",
    "ml_calibration_bins",
    "ml_lift_table",
    "ml_roc_points",
    "ml_pr_curve",
    "ml_best_threshold",
    "agg_decayed_engagement",
    "ml_grouped_metrics",
    "ml_semihard_negatives",
    "dd_lsh_recall_audit",
    "o4_match_distribution",
    "ml_ab_test",
    "ml_ab_srm",
    "ml_ab_cuped",
    "ml_ab_bootstrap",
    "pii_erasure_audit",
    "ml_ab_stratified",
    "agg_cms_frequency",
    "geo_radius_knn",
    "geo_cell_density",
    "geo_point_in_polygon",
    "dd_dup_weighting",
    "ml_label_agreement",
    "pii_l_diversity",
    "ml_ab_welch",
    "ml_ab_ratio_delta",
    "ml_ab_quantile_lift",
    "ml_ab_mde",
    # round-12 addition (appended — the head window must not move)
    "dd_semantic_prune_lsh",
    # round-14 additions (appended — the head window must not move)
    "ml_logreg_gd",
    "ml_gini_stump",
    "graph_link_prediction",
)

_merged_q: dict = {}
_merged_o: dict = {}
for _m in _PARTS:
    _dup = _merged_q.keys() & _m.QUERIES.keys()
    if _dup:
        raise ValueError(f"duplicate scale query names: {_dup}")
    _merged_q.update(_m.QUERIES)
    _merged_o.update(_m.ORACLES)
if set(_ORDER) != set(_merged_q) or len(set(_ORDER)) != len(_ORDER):
    raise ValueError(
        "scale family modules drifted from _ORDER: "
        f"missing={set(_ORDER) - set(_merged_q)} "
        f"extra={set(_merged_q) - set(_ORDER)}"
    )
QUERIES = {n: _merged_q[n] for n in _ORDER}
ORACLES = {n: _merged_o[n] for n in _ORDER if n in _merged_o}
