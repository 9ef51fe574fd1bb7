from .dedup import (
    exact_duplicates,
    jaccard_similar_pairs,
    lsh_bands,
    lsh_candidate_pairs,
    minhash_signatures,
    simhash,
)
from .joins import broadcast_left_join, left_anti_keys, left_semi_keys
from .textstats import language_id, quality_scores, shingle_fingerprints, token_stats

__all__ = [
    "broadcast_left_join",
    "exact_duplicates",
    "jaccard_similar_pairs",
    "language_id",
    "left_anti_keys",
    "left_semi_keys",
    "lsh_bands",
    "lsh_candidate_pairs",
    "minhash_signatures",
    "quality_scores",
    "shingle_fingerprints",
    "simhash",
    "token_stats",
]
