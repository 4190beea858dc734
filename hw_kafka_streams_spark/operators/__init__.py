"""Engine operators: the reference's pipeline ops plus scale extensions.

Submodules: censor (block+censor core), dedup (exact/Jaccard/MinHash/
SimHash + clusters), similarity (brute-force/LSH/IVF ANN), text
(tokens/quality/lang-ID/fingerprint), multimodal (binary payloads +
decode stages), sampling (splits), skew (salted joins), udfs (the
pandas-UDF/UDTF surface).
"""

from hw_kafka_streams_spark.operators.censor import (
    block_messages,
    censor_column,
    censor_column_many_words,
    filter_pipeline,
)
from hw_kafka_streams_spark.operators.dedup import (
    connected_components,
    exact_dedup,
    jaccard_candidate_pairs,
    keep_cluster_representatives,
    minhash_lsh_pairs,
    minhash_signatures,
    simhash_candidate_pairs,
)
from hw_kafka_streams_spark.operators.sampling import (
    hash_split,
    reservoir_per_key,
    stratified_sample,
)
from hw_kafka_streams_spark.operators.similarity import (
    brute_force_topk,
    embedding_near_dup_pairs,
    ivf_topk,
    lsh_topk,
)
from hw_kafka_streams_spark.operators.skew import salted_join

__all__ = [
    "block_messages",
    "brute_force_topk",
    "censor_column",
    "censor_column_many_words",
    "connected_components",
    "embedding_near_dup_pairs",
    "exact_dedup",
    "filter_pipeline",
    "hash_split",
    "ivf_topk",
    "jaccard_candidate_pairs",
    "keep_cluster_representatives",
    "lsh_topk",
    "minhash_lsh_pairs",
    "minhash_signatures",
    "reservoir_per_key",
    "salted_join",
    "simhash_candidate_pairs",
    "stratified_sample",
]
