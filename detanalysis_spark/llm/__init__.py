"""Large-scale training-data-pipeline operators (beyond the reference).

Dedup (exact + near-dup), similarity search over embeddings, text
analysis, and multimodal-column plumbing — first-class engine
components designed for the 100 TB regime (bucketed candidate
generation, no all-pairs, no driver-side loops).
"""

from .similarity import (cosine_similarity, cosine_topk,
                         RandomHyperplaneLSH, IVFIndex, PQCodebook,
                         semantic_dedup, embedding_outliers,
                         quantize_embeddings, quantization_error)
from .dedup import (dedup_exact, minhash_signatures, lsh_candidate_pairs,
                    lsh_plan, lsh_collision_probability,
                    near_dup_clusters, near_dup_clusters_star, simhash,
                    ngram_jaccard, near_dup_pairs, apply_near_dedup,
                    dedup_incremental, span_dup_stats)
from .text import (token_count, bpe_ish_token_count, quality_scores,
                   quality_struct, with_quality,
                   language_id, doc_fingerprint, tfidf_topk, build_vocab,
                   unigram_logprob_scores, take_token_budget,
                   save_bigram_lm, load_bigram_lm,
                   compression_ratio_udf, sentence_split_udtf,
                   pack_documents, chunk_documents, normalize_text,
                   word_frequencies, bpe_pair_counts, train_bpe,
                   bpe_segment_udf)
from .multimodal import (decode_raw8, encode_raw8, resize_bilinear,
                         image_features, audio_features, frame_sample_udf)
from .bloom import (Bloom, bloom_indices, build_bloom,
                    dedup_incremental_bloom, optimal_bloom_params)
from .classifier import (hashed_token_features, portable_bucket,
                         hashed_embedding,
                         score_hashed_linear, train_linear_probe,
                         save_probe, load_probe)
from .pipeline import (CurationConfig, curate_corpus,
                       curate_corpus_stream)
from .psl import (PslRules, load_psl, default_psl, public_suffix_py,
                  registered_domain_py, registered_domain_psl)
from .cleaning import (with_registered_domain, url_host,
                       normalize_url, TRACKING_PARAMS,
                       registered_domain,
                       domain_blocklist_filter, domain_profile,
                       pii_counts, redact_pii, repetition_scores,
                       repetition_struct, gopher_quality_struct,
                       gopher_quality_filter,
                       benchmark_ngrams, contamination_overlap,
                       line_frequencies, remove_boilerplate_lines,
                       remove_duplicate_lines, decontaminate,
                       adaptive_quality_filter)

__all__ = [
    "CurationConfig", "curate_corpus", "curate_corpus_stream",
    "pii_counts", "redact_pii", "repetition_scores",
    "repetition_struct", "gopher_quality_struct", "gopher_quality_filter",
    "benchmark_ngrams", "contamination_overlap",
    "line_frequencies", "remove_boilerplate_lines",
    "remove_duplicate_lines", "decontaminate",
    "adaptive_quality_filter",
    "cosine_similarity", "cosine_topk", "RandomHyperplaneLSH", "IVFIndex",
    "PQCodebook",
    "semantic_dedup", "embedding_outliers",
    "dedup_exact", "minhash_signatures", "lsh_candidate_pairs",
    "lsh_plan", "lsh_collision_probability",
    "near_dup_clusters", "near_dup_clusters_star", "simhash",
    "ngram_jaccard",
    "token_count", "bpe_ish_token_count", "quality_scores",
    "quality_struct", "with_quality",
    "language_id", "doc_fingerprint", "tfidf_topk", "build_vocab",
    "unigram_logprob_scores", "take_token_budget",
    "pack_documents", "chunk_documents", "normalize_text",
    "word_frequencies", "bpe_pair_counts", "train_bpe", "bpe_segment_udf",
    "near_dup_pairs", "apply_near_dedup", "dedup_incremental",
    "Bloom", "bloom_indices", "build_bloom", "dedup_incremental_bloom",
    "optimal_bloom_params",
    "span_dup_stats", "quantize_embeddings", "quantization_error",
    "decode_raw8", "encode_raw8", "resize_bilinear",
    "image_features", "audio_features", "frame_sample_udf",
    "hashed_token_features", "portable_bucket",
    "score_hashed_linear", "train_linear_probe", "hashed_embedding",
    "save_probe", "load_probe", "save_bigram_lm", "load_bigram_lm",
    "compression_ratio_udf", "sentence_split_udtf",
    "PslRules", "load_psl", "default_psl", "public_suffix_py",
    "registered_domain_py", "registered_domain_psl",
    "with_registered_domain", "url_host", "registered_domain",
    "domain_blocklist_filter", "domain_profile",
    "normalize_url", "TRACKING_PARAMS",
]
