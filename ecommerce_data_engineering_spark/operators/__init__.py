from .scd2 import scd2_merge
from .upsert import keyed_upsert, insert_if_absent
from .range_join import range_join, range_join_by_expansion
from .topk import distributed_topk, topk_per_group
from .dedup import (
    exact_dedup,
    word_shingles,
    minhash_signatures,
    lsh_candidate_pairs,
    jaccard_verify,
    simhash,
    simhash_near_dups,
    connected_components,
)
from .similarity import with_norm, cosine_topk, lsh_cosine_topk
from .text import (
    language_id,
    quality_score,
    token_counts,
    fingerprints,
    word_count,
    punct_ratio,
)
from .multimodal import (
    to_media_table,
    decode_media,
    frame_sample,
    resize_media,
    extract_features,
)
from .asof import asof_join
from .skew import null_safe_left_join, salted_join

__all__ = [
    "scd2_merge", "keyed_upsert", "insert_if_absent",
    "range_join", "range_join_by_expansion",
    "distributed_topk", "topk_per_group",
    "exact_dedup", "word_shingles", "minhash_signatures",
    "lsh_candidate_pairs", "jaccard_verify", "simhash", "simhash_near_dups",
    "connected_components",
    "with_norm", "cosine_topk", "lsh_cosine_topk",
    "language_id", "quality_score", "token_counts", "fingerprints",
    "word_count", "punct_ratio",
    "to_media_table", "decode_media", "frame_sample",
    "resize_media", "extract_features",
    "asof_join", "null_safe_left_join", "salted_join",
]
