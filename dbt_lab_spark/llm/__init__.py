"""Large-scale training-data operators — the beyond-reference surface:
deduplication (exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding
cosine), approximate nearest-neighbor search, and multimodal column
plumbing.  All designed shuffle-lean for the 100 TB target: candidate
generation is always a bucketed equi-join (never an all-pairs cross
join), and per-row feature extraction is pure Column expressions.
"""

from dbt_lab_spark.llm.dedup import (
    exact_dedup,
    exact_dup_groups,
    minhash_signatures,
    minhash_lsh_candidates,
    minhash_dedup_pairs,
    simhash,
    simhash_dedup_pairs,
    ngram_jaccard_pairs,
    ngram_jaccard_all_pairs,
    embedding_dedup_pairs,
    connected_components,
    dedup_apply,
)
from dbt_lab_spark.llm.sampling import (
    hash_bucket,
    hash_sample,
    hash_threshold,
    stratified_hash_sample,
    train_test_split,
)
from dbt_lab_spark.llm.similarity import (
    brute_force_knn,
    lsh_knn,
    ivf_centroids,
    ivf_assign,
    ivf_knn,
)

__all__ = [
    "exact_dedup",
    "exact_dup_groups",
    "minhash_signatures",
    "minhash_lsh_candidates",
    "minhash_dedup_pairs",
    "simhash",
    "simhash_dedup_pairs",
    "ngram_jaccard_pairs",
    "ngram_jaccard_all_pairs",
    "embedding_dedup_pairs",
    "connected_components",
    "dedup_apply",
    "hash_bucket",
    "hash_sample",
    "hash_threshold",
    "stratified_hash_sample",
    "train_test_split",
    "brute_force_knn",
    "lsh_knn",
    "ivf_centroids",
    "ivf_assign",
    "ivf_knn",
]
