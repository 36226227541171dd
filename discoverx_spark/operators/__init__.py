from .convagg import (conversation_stats, conversation_fingerprints,
                      with_conversation_stats, role_alternation_violations,
                      dedup_conversations, conversation_minhash_signatures,
                      conversation_near_duplicates, conversation_gates,
                      tool_call_stats, turn_latency_stats,
                      conversation_context_windows)
from .dedup import (tokens_expr, shingles_expr, exact_duplicates, dedup_exact,
                    span_dedup,
                    minhash_signatures, minhash_signature_exprs,
                    minhash_struct_expr,
                    lsh_candidate_pairs, minhash_near_duplicates,
                    incremental_lsh_pairs, incremental_exact_dedup,
                    incremental_line_dedup, line_keys,
                    contamination_check, line_dedup, line_dedup_within,
                    jaccard_pairs, simhash_expr, simhash_near_duplicates,
                    connected_components, dedup_clusters, dedup_keep_best)
from .packing import (pack_sequences, token_counts, top_tokens,
                      chunk_documents)
from .retrieval import (bm25_topk, bm25_topk_batch, doc_lengths,
                        sparse_near_duplicates, term_frequencies,
                        tfidf_weights)
from .dsir import (ngram_bucket_features_expr, bucket_histogram,
                   dsir_log_weights, dsir_resample)
from .bpe import (word_frequencies, bpe_train, bpe_segment_expr,
                  make_bpe_segment_udf)
from .sampling import (cap_per_group, domain_blocklist_filter, hash_sample,
                       mixing_rates, split_train_holdout,
                       stratified_hash_sample, temperature_mix,
                       token_budget_select, shard_assign, doremi_step)
from .logreg import hashed_features, logreg_predict, logreg_train
from .temporal import asof_join, range_join_binned
from .fingerprint import (winnow_fingerprints, fingerprint_overlap_pairs,
                          incremental_fingerprint_overlap)
from .bloom import (bloom_params, bloom_build, make_might_contain_udf,
                    bloom_prefilter_novel)
from .similarity import (dot_expr, norm_expr, cosine_expr, brute_force_topk,
                         embedding_near_duplicates, lsh_topk, ivf_train, ivf_assign,
                         ivf_topk, lsh_near_duplicates,
                         lsh_signature_expr, semantic_dedup,
                         ivf_assign_batched, pq_train, pq_encode, pq_topk)

__all__ = [
    "conversation_stats", "conversation_fingerprints",
    "with_conversation_stats", "role_alternation_violations",
    "dedup_conversations", "lsh_near_duplicates", "conversation_gates",
    "tool_call_stats",
    "conversation_minhash_signatures", "conversation_near_duplicates",
    "tokens_expr", "shingles_expr", "exact_duplicates", "dedup_exact",
    "minhash_signatures", "minhash_signature_exprs", "minhash_struct_expr",
    "lsh_candidate_pairs",
    "minhash_near_duplicates", "jaccard_pairs", "simhash_expr",
    "simhash_near_duplicates", "connected_components", "dedup_clusters",
    "dot_expr", "norm_expr", "cosine_expr", "brute_force_topk",
    "embedding_near_duplicates", "lsh_topk", "ivf_train", "ivf_assign", "ivf_topk",
    "lsh_signature_expr",
    "pack_sequences", "token_counts", "top_tokens",
    "hash_sample", "stratified_hash_sample", "split_train_holdout",
    "cap_per_group", "incremental_lsh_pairs", "contamination_check",
    "line_dedup", "semantic_dedup", "domain_blocklist_filter",
    "incremental_exact_dedup", "line_dedup_within", "span_dedup",
    "incremental_line_dedup", "line_keys",
    "mixing_rates", "ivf_assign_batched", "temperature_mix",
    "token_budget_select", "shard_assign", "doremi_step",
    "chunk_documents", "dedup_keep_best",
    "turn_latency_stats", "conversation_context_windows",
    "bm25_topk", "bm25_topk_batch", "term_frequencies", "doc_lengths",
    "tfidf_weights", "sparse_near_duplicates",
    "ngram_bucket_features_expr", "bucket_histogram",
    "dsir_log_weights", "dsir_resample",
    "word_frequencies", "bpe_train", "bpe_segment_expr",
    "make_bpe_segment_udf",
    "pq_train", "pq_encode", "pq_topk",
    "hashed_features", "logreg_predict", "logreg_train",
    "asof_join", "range_join_binned",
    "winnow_fingerprints", "fingerprint_overlap_pairs",
    "incremental_fingerprint_overlap",
    "bloom_params", "bloom_build", "make_might_contain_udf",
    "bloom_prefilter_novel",
]
