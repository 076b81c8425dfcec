from .asof import asof_join  # noqa: F401
from .dedup import (  # noqa: F401
    exact_dedup_latest,
    doc_shingle_sets,
    exact_jaccard_pairs,
    minhash_signatures,
    minhash_lsh_candidates,
    minhash_near_dup_pairs,
    simhash64,
    simhash_near_dup_pairs,
    embedding_near_dup_pairs,
    doc_shingle_arrays,
)
from .packing import sequence_pack  # noqa: F401
from .sampling import (  # noqa: F401
    deterministic_split,
    global_ntile,
    global_percent_rank,
    global_row_number,
    global_running_sum,
    stable_bucket,
    stratified_sample,
)
from .similarity import brute_force_topk, hyperplane_lsh_topk, ivf_topk, mips_topk  # noqa: F401
from .skew import salted_agg, salted_broadcast_fallback_join  # noqa: F401
from .multimodal import (  # noqa: F401
    audio_stats_features,
    decode_image,
    encode_ppm_p6,
    encode_wav_pcm16,
    extract_features,
    frame_sample_plan,
    image_stats_features,
    media_from_documents,
    media_stats_features,
    resize_media,
)
from .text import (  # noqa: F401
    doc_fingerprints,
    doc_tokens,
    language_id,
    quality_scores,
    token_stats,
    top_terms,
    unigram_logprob,
)
