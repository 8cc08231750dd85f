from pydala_spark.operators.asof import asof_join
from pydala_spark.operators.dedup import (
    contamination_hits,
    decontaminate,
    dedup_clusters,
    dedup_exact,
    dedup_subset,
    doc_shingles,
    minhash_signatures,
    lsh_candidate_pairs,
    ngram_jaccard_pairs,
    simhash,
)
from pydala_spark.operators.ann import ivf_topk, kmeans_centroids
from pydala_spark.operators.sampling import (
    deterministic_shuffle,
    hash_bucket,
    hash_sample,
    shuffle_key,
    stratified_sample,
    train_test_split,
    weighted_domain_sample,
)
from pydala_spark.operators.packing import pack_shards, shard_summary
from pydala_spark.operators.similarity import (
    cosine_similarity,
    cosine_topk,
    quantize_embeddings,
    quantized_cosine_topk,
)
from pydala_spark.operators.skew import salted_agg, salted_broadcast_left_join, salted_join
from pydala_spark.operators.multimodal import decode_media, extract_features
from pydala_spark.operators.scrub import (
    extract_urls,
    filter_host_blocklist,
    host_stats,
    pii_stats,
    redact_pii,
)
from pydala_spark.operators.textstats import (
    chunk_documents,
    fingerprint,
    quality_stats,
    repetition_stats,
    tfidf_top_terms,
    token_count,
    tokens,
)

__all__ = [
    "asof_join",
    "dedup_clusters",
    "dedup_exact",
    "dedup_subset",
    "doc_shingles",
    "minhash_signatures",
    "lsh_candidate_pairs",
    "ngram_jaccard_pairs",
    "simhash",
    "cosine_similarity",
    "cosine_topk",
    "quantize_embeddings",
    "quantized_cosine_topk",
    "hash_bucket",
    "hash_sample",
    "stratified_sample",
    "train_test_split",
    "weighted_domain_sample",
    "deterministic_shuffle",
    "shuffle_key",
    "ivf_topk",
    "kmeans_centroids",
    "contamination_hits",
    "decontaminate",
    "pack_shards",
    "shard_summary",
    "salted_agg",
    "salted_broadcast_left_join",
    "salted_join",
    "extract_urls",
    "filter_host_blocklist",
    "host_stats",
    "pii_stats",
    "redact_pii",
    "tfidf_top_terms",
    "fingerprint",
    "quality_stats",
    "repetition_stats",
    "chunk_documents",
    "token_count",
    "tokens",
    "decode_media",
    "extract_features",
]
