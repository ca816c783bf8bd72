from tidyvec_spark.operators.embed import embed
from tidyvec_spark.operators.evaluation import mean_recall, topk_recall
from tidyvec_spark.operators.nearest import (
    nearest,
    similarity_join_exact,
    similarity_join_lsh,
)
from tidyvec_spark.operators.bpe import bpe_apply_expr, bpe_train, bpe_word_freq
from tidyvec_spark.operators.unigram import (
    unigram_tokenize,
    unigram_train,
    viterbi_segment,
)
from tidyvec_spark.operators.wordpiece import (
    wordpiece_tokenize,
    wordpiece_train,
    wordpiece_vocab,
)
from tidyvec_spark.operators.bq import bq_encode, bq_pack_py, bq_topk
from tidyvec_spark.operators.cluster import cluster_embeddings
from tidyvec_spark.operators.joins import asof_join, range_join_bucketed
from tidyvec_spark.operators.chunking import (
    cdc_chunks,
    chunk_documents,
    fim_split,
    length_buckets,
    pack_sequences,
    packing_report,
)
from tidyvec_spark.operators.curriculum import (
    curriculum_assign,
    shard_boundaries,
    shuffle_assign,
    write_curriculum_shards,
    write_shuffled_shards,
)
from tidyvec_spark.operators.fusion import mean_pool_embeddings, rrf_fuse
from tidyvec_spark.operators.graph import (
    label_propagation,
    pagerank,
    synthetic_link_graph,
)
from tidyvec_spark.operators.lm import (
    bigram_counts,
    bigram_lm_perplexity,
    perplexity_buckets,
)
from tidyvec_spark.operators.mining import (
    hard_negative_pairs,
    crop_pairs,
    ict_pairs,
    margin_pairs,
    mutual_topk_pairs,
)
from tidyvec_spark.operators.importance import (
    dsir_log_ratios,
    dsir_top_k,
    dsir_weights,
)
from tidyvec_spark.operators.sampling import (
    budget_sample,
    cluster_balanced_sample,
    hash_stratified_sample,
    hash_unit,
    stratified_fixed_n,
    target_mix_fractions,
    target_mix_sample,
    temperature_fractions,
    temperature_sample,
    weighted_sample_n,
)
from tidyvec_spark.operators.bloom import decontaminate_bloom
from tidyvec_spark.operators.reports import (
    k_anonymity,
    ngram_novelty,
    vocab_growth,
    zscore_by_group,
)
from tidyvec_spark.operators.cooccur import token_pmi_topk
from tidyvec_spark.operators.search import (
    bm25_stats,
    bm25_topk,
    maxsim_topk,
    mmr_topk,
    overlap_scorer,
    rerank_topk,
)
from tidyvec_spark.operators.skew import key_skew_profile, salted_join, two_phase_agg
from tidyvec_spark.operators.sq import sq_encode, sq_fit, sq_topk
from tidyvec_spark.operators.semdedup import semantic_dedup, semantic_dedup_pairs
from tidyvec_spark.operators.pq import (
    pq_adc_topk,
    pq_codebooks_from_rows,
    pq_encode,
)
from tidyvec_spark.operators.multimodal import (
    audio_envelope_hash,
    audio_pcm_stats,
    image_ahash,
    image_quality_flags,
    image_quality_stats,
    media_quarantine,
    media_type_of,
    sniff_media_type,
)
from tidyvec_spark.operators.viz import (
    plan_image_grid,
    viz_embeddings,
    viz_images,
)

__all__ = [
    "cdc_chunks",
    "unigram_tokenize",
    "unigram_train",
    "wordpiece_tokenize",
    "wordpiece_train",
    "wordpiece_vocab",
    "viterbi_segment",
    "image_quality_flags",
    "image_quality_stats",
    "ngram_novelty",
    "zscore_by_group",
    "embed",
    "nearest",
    "similarity_join_exact",
    "similarity_join_lsh",
    "cluster_embeddings",
    "asof_join",
    "range_join_bucketed",
    "bigram_counts",
    "bpe_apply_expr",
    "bpe_train",
    "bpe_word_freq",
    "bq_encode",
    "bq_pack_py",
    "bq_topk",
    "bigram_lm_perplexity",
    "bm25_stats",
    "bm25_topk",
    "maxsim_topk",
    "mmr_topk",
    "overlap_scorer",
    "rerank_topk",
    "decontaminate_bloom",
    "token_pmi_topk",
    "budget_sample",
    "chunk_documents",
    "fim_split",
    "curriculum_assign",
    "shard_boundaries",
    "shuffle_assign",
    "write_curriculum_shards",
    "write_shuffled_shards",
    "hash_stratified_sample",
    "hash_unit",
    "dsir_log_ratios",
    "dsir_top_k",
    "dsir_weights",
    "hard_negative_pairs",
    "crop_pairs",
    "ict_pairs",
    "margin_pairs",
    "mutual_topk_pairs",
    "label_propagation",
    "cluster_balanced_sample",
    "mean_pool_embeddings",
    "mean_recall",
    "rrf_fuse",
    "pack_sequences",
    "packing_report",
    "pagerank",
    "synthetic_link_graph",
    "length_buckets",
    "vocab_growth",
    "k_anonymity",
    "perplexity_buckets",
    "temperature_fractions",
    "topk_recall",
    "temperature_sample",
    "weighted_sample_n",
    "semantic_dedup",
    "semantic_dedup_pairs",
    "pq_adc_topk",
    "pq_codebooks_from_rows",
    "pq_encode",
    "key_skew_profile",
    "salted_join",
    "sq_encode",
    "sq_fit",
    "sq_topk",
    "stratified_fixed_n",
    "target_mix_fractions",
    "target_mix_sample",
    "two_phase_agg",
    "audio_envelope_hash",
    "audio_pcm_stats",
    "image_ahash",
    "media_quarantine",
    "media_type_of",
    "sniff_media_type",
    "plan_image_grid",
    "viz_embeddings",
    "viz_images",
]
