"""fenix_spark — a PySpark-native analytics engine with the query surface
of nrlugg/fenix (vector KNN search, IVF/PQ indexing) plus the relational
and LLM-data-pipeline operators a 100 TB training-data pipeline needs.

Design principles (see SURVEY.md §7):

- DataFrame/Spark-SQL first: every operator is a lazy logical plan that
  Catalyst optimizes (predicate pushdown, column pruning, partition
  pruning, AQE). No RDDs, no driver-side row loops.
- Native column expressions over Python UDFs in every hot path; Arrow
  pandas UDFs only where built-ins genuinely can't express the semantics.
- Deterministic outputs: every top-k carries an explicit id tiebreak so
  results are oracle-checkable (reference's ``select_k_unstable`` is
  tie-unstable; we are stricter).
- No reliance on row order: indexes are co-written columns keyed by
  explicit ids, never positional h-stacks (the reference's row-aligned
  sidecar files do not survive a distributed shuffle).
"""

from fenix_spark.session import get_session, tune_session

__all__ = [
    # session
    "get_session",
    "tune_session",
    # the reference's query surface (C1-C4)
    "knn",
    "probe_search",
    "batch_probe_search",
    "filtered_probe_search",
    "train_coding",
    "build_index",
    "CodingConfig",
    # similarity joins & ANN
    "similarity_join",
    "similarity_join_brute",
    "lsh_ann_search",
    # temporal / skew joins
    "asof_join",
    "range_join",
    "range_join_bucketed",
    "salted_join",
    # dedup family
    "exact_dedup_by_hash",
    "minhash_neardup_pairs",
    "simhash_neardup_pairs",
    "winnow_fingerprints",
    "dedup_paragraphs",
    "hashed_doc_embeddings",
    "doc_overlap_pairs",
    "connected_components",
    "dedup_keep_list",
    "dedup_eval",
    "pagerank",
    # curation
    "deterministic_sample",
    "hash_split",
    "per_group_limit",
    "mixture",
    "temperature_mixture",
    "temperature_rates",
    "write_shards",
    "profile",
    "datacard",
    # index maintenance & ADC
    "append_to_index",
    "adc_search",
    "build_ivfpq_index",
    "ivfpq_search",
    "train_residual_coding",
    "build_ivfpq_residual_index",
    "ivfpq_residual_search",
    # OPQ rotation
    "fit_opq",
    "opq_transform",
    "rotate_query",
    "build_opq_ivfpq_index",
    "opq_ivfpq_search",
    # semantic dedup / incremental dedup
    "semantic_dedup",
    "semantic_dedup_pairs",
    "minhash_state",
    "incremental_neardup_pairs",
    # text tooling
    "train_bpe",
    "bpe_encode",
    "train_unigram",
    "unigram_encode",
    "train_bigram_lm",
    "perplexity",
    "build_bm25_index",
    "bm25_search",
    "rrf_fuse",
    "hybrid_search",
    "fuzzy_join",
    "fuzzy_self_pairs",
    # web extraction
    "html_to_text",
    "extract_title",
    "extract_links",
    "boilerplate_features",
    "url_parts",
    # mergeable sketches
    "hll_rollup",
    "hll_merge",
    "bitmap_rollup",
    "bitmap_merge",
    "cms_build",
    "cms_merge",
    "cms_estimate",
    "heavy_hitters",
    "hist_rollup",
    "hist_rollup_auto",
    "hist_merge",
    "hist_quantiles",
    # quality classifier
    "train_quality_classifier",
    "quality_scores",
    "quality_filter",
    # importance resampling (DSIR)
    "fit_importance_model",
    "importance_weights",
    "dsir_select",
    # conversations (SFT data)
    "conversation_stats",
    "conversation_checks",
    "truncate_to_budget",
    "render_training_text",
    # preferences (RLHF data)
    "preference_checks",
    "preference_stats",
    "length_debias_sample",
    # expectations
    "validate",
    "quarantine",
    "require",
    "expect_unique",
    "expect_subset",
    # recipes
    "run_pipeline",
    "standard_curation",
    # splits / export
    "leakage_safe_split",
    "split_leakage_report",
    "write_webdataset",
    # vectors / time series
    "binarize",
    "hamming_knn",
    "hamming_knn_rerank",
    "gapfill",
    # substring search / versioned tables
    "build_trigram_index",
    "substring_search",
    "write_version",
    "read_version",
    "merge_upsert",
    "diff_versions",
    "rollback",
    "vacuum",
]
__version__ = "0.1.0"


def __getattr__(name: str):
    """Lazy re-exports: importing fenix_spark stays cheap (no pyspark.ml
    / numpy import chain) until an operator is actually touched."""
    from importlib import import_module

    _HOMES = {
        "knn": "fenix_spark.operators.search",
        "similarity_join": "fenix_spark.operators.search",
        "similarity_join_brute": "fenix_spark.operators.search",
        "probe_search": "fenix_spark.operators.index",
        "batch_probe_search": "fenix_spark.operators.index",
        "filtered_probe_search": "fenix_spark.operators.index",
        "build_index": "fenix_spark.operators.index",
        "train_coding": "fenix_spark.operators.coder",
        "CodingConfig": "fenix_spark.operators.coder",
        "lsh_ann_search": "fenix_spark.operators.lsh",
        "asof_join": "fenix_spark.operators.joins",
        "range_join": "fenix_spark.operators.joins",
        "range_join_bucketed": "fenix_spark.operators.joins",
        "salted_join": "fenix_spark.operators.joins",
        "exact_dedup_by_hash": "fenix_spark.operators.dedup",
        "minhash_neardup_pairs": "fenix_spark.operators.dedup",
        "simhash_neardup_pairs": "fenix_spark.operators.dedup",
        "winnow_fingerprints": "fenix_spark.operators.dedup",
        "dedup_paragraphs": "fenix_spark.operators.paragraphs",
        "hashed_doc_embeddings": "fenix_spark.operators.embed",
        "doc_overlap_pairs": "fenix_spark.operators.paragraphs",
        "connected_components": "fenix_spark.operators.components",
        "pagerank": "fenix_spark.operators.graph",
        "dedup_keep_list": "fenix_spark.operators.components",
        "deterministic_sample": "fenix_spark.operators.sampling",
        "hash_split": "fenix_spark.operators.sampling",
        "per_group_limit": "fenix_spark.operators.sampling",
        "mixture": "fenix_spark.operators.sampling",
        "temperature_mixture": "fenix_spark.operators.sampling",
        "temperature_rates": "fenix_spark.operators.sampling",
        "write_shards": "fenix_spark.operators.sampling",
        "profile": "fenix_spark.operators.profile",
        "datacard": "fenix_spark.operators.datacard",
        "append_to_index": "fenix_spark.operators.index",
        "adc_search": "fenix_spark.operators.index",
        "build_ivfpq_index": "fenix_spark.operators.index",
        "ivfpq_search": "fenix_spark.operators.index",
        "train_residual_coding": "fenix_spark.operators.index",
        "build_ivfpq_residual_index": "fenix_spark.operators.index",
        "ivfpq_residual_search": "fenix_spark.operators.index",
        "html_to_text": "fenix_spark.functions.html",
        "extract_title": "fenix_spark.functions.html",
        "extract_links": "fenix_spark.functions.html",
        "boilerplate_features": "fenix_spark.functions.html",
        "url_parts": "fenix_spark.functions.html",
        "hll_rollup": "fenix_spark.operators.sketches",
        "hll_merge": "fenix_spark.operators.sketches",
        "bitmap_rollup": "fenix_spark.operators.sketches",
        "bitmap_merge": "fenix_spark.operators.sketches",
        "cms_build": "fenix_spark.operators.sketches",
        "cms_merge": "fenix_spark.operators.sketches",
        "cms_estimate": "fenix_spark.operators.sketches",
        "heavy_hitters": "fenix_spark.operators.sketches",
        "hist_rollup": "fenix_spark.operators.sketches",
        "hist_rollup_auto": "fenix_spark.operators.sketches",
        "hist_merge": "fenix_spark.operators.sketches",
        "hist_quantiles": "fenix_spark.operators.sketches",
        "train_quality_classifier": "fenix_spark.operators.quality",
        "quality_scores": "fenix_spark.operators.quality",
        "quality_filter": "fenix_spark.operators.quality",
        "fit_importance_model": "fenix_spark.operators.dsir",
        "importance_weights": "fenix_spark.operators.dsir",
        "dsir_select": "fenix_spark.operators.dsir",
        "fit_opq": "fenix_spark.operators.opq",
        "opq_transform": "fenix_spark.operators.opq",
        "rotate_query": "fenix_spark.operators.opq",
        "build_opq_ivfpq_index": "fenix_spark.operators.opq",
        "opq_ivfpq_search": "fenix_spark.operators.opq",
        "semantic_dedup": "fenix_spark.operators.semdedup",
        "semantic_dedup_pairs": "fenix_spark.operators.semdedup",
        "minhash_state": "fenix_spark.operators.dedup",
        "dedup_eval": "fenix_spark.operators.dedup",
        "incremental_neardup_pairs": "fenix_spark.operators.dedup",
        "train_bpe": "fenix_spark.functions.bpe",
        "train_unigram": "fenix_spark.functions.unigram",
        "unigram_encode": "fenix_spark.functions.unigram",
        "bpe_encode": "fenix_spark.functions.bpe",
        "train_bigram_lm": "fenix_spark.functions.ngram_lm",
        "perplexity": "fenix_spark.functions.ngram_lm",
        "build_bm25_index": "fenix_spark.operators.bm25",
        "bm25_search": "fenix_spark.operators.bm25",
        "rrf_fuse": "fenix_spark.operators.hybrid",
        "hybrid_search": "fenix_spark.operators.hybrid",
        "fuzzy_join": "fenix_spark.operators.fuzzy",
        "fuzzy_self_pairs": "fenix_spark.operators.fuzzy",
        "preference_checks": "fenix_spark.operators.preferences",
        "preference_stats": "fenix_spark.operators.preferences",
        "length_debias_sample": "fenix_spark.operators.preferences",
        "conversation_stats": "fenix_spark.operators.conversations",
        "conversation_checks": "fenix_spark.operators.conversations",
        "truncate_to_budget": "fenix_spark.operators.conversations",
        "render_training_text": "fenix_spark.operators.conversations",
        "validate": "fenix_spark.operators.expectations",
        "quarantine": "fenix_spark.operators.expectations",
        "require": "fenix_spark.operators.expectations",
        "expect_unique": "fenix_spark.operators.expectations",
        "expect_subset": "fenix_spark.operators.expectations",
        "run_pipeline": "fenix_spark.recipes",
        "standard_curation": "fenix_spark.recipes",
        "leakage_safe_split": "fenix_spark.operators.leakage",
        "split_leakage_report": "fenix_spark.operators.leakage",
        "write_webdataset": "fenix_spark.operators.webdataset",
        "binarize": "fenix_spark.operators.binary_ann",
        "hamming_knn": "fenix_spark.operators.binary_ann",
        "hamming_knn_rerank": "fenix_spark.operators.binary_ann",
        "gapfill": "fenix_spark.operators.timeseries",
        "build_trigram_index": "fenix_spark.operators.trigram",
        "substring_search": "fenix_spark.operators.trigram",
        "write_version": "fenix_spark.versions",
        "read_version": "fenix_spark.versions",
        "merge_upsert": "fenix_spark.versions",
        "diff_versions": "fenix_spark.versions",
        "rollback": "fenix_spark.versions",
        "vacuum": "fenix_spark.versions",
    }
    if name in _HOMES:
        return getattr(import_module(_HOMES[name]), name)
    raise AttributeError(f"module 'fenix_spark' has no attribute {name!r}")
