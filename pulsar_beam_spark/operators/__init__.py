from .asof import asof_join  # noqa: F401
from .dedup import (  # noqa: F401
    exact_dedup_latest,
    doc_shingle_sets,
    exact_jaccard_pairs,
    minhash_signatures,
    minhash_lsh_candidates,
    minhash_near_dup_pairs,
    simhash64,
    embedding_near_dup_pairs,
)
from .similarity import brute_force_topk, hyperplane_lsh_topk  # noqa: F401
from .text import doc_tokens, language_id, quality_scores, token_stats, top_terms  # noqa: F401
