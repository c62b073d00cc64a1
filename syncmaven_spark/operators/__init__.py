"""LLM-data-pipeline operators (north-star extensions beyond the reference).

Every operator here is designed 100-TB-first: shuffles are minimized and
explicit, per-doc work stays inside whole-stage codegen (built-in column
expressions) wherever possible, and Python only appears as Arrow-batched
pandas UDFs in the genuinely non-relational kernels (vector math against
broadcast arrays).
"""

from syncmaven_spark.operators.dedup import (  # noqa: F401
    exact_dedup,
    containment_decontamination_pairs,
    containment_decontamination_pairs_incremental,
    decontamination_index,
    decontamination_sets,
    fuzzy_decontamination_pairs,
    fuzzy_decontamination_pairs_incremental,
    hashed_shingle_sets,
    minhash_signatures,
    minhash_lsh_candidates,
    minhash_lsh_candidates_incremental,
    minhash_lsh_index,
    minhash_verified_pairs,
    minhash_verified_pairs_incremental,
    minhash_verify_candidates,
    ngram_jaccard_pairs,
    simhash,
    simhash_chunk_index,
    simhash_near_dups,
    simhash_near_dups_incremental,
    touched_ids,
)
from syncmaven_spark.operators.graph import (  # noqa: F401
    connected_components,
    dedup_cluster_assignments,
)
from syncmaven_spark.operators.similarity import (  # noqa: F401
    cosine_lsh_candidates_incremental,
    cosine_lsh_index,
    cosine_pairs_exact,
    cosine_pairs_lsh,
    cosine_pairs_lsh_incremental,
    cosine_topk_bruteforce,
    cosine_topk_ivf,
    ivf_append,
    ivf_drift,
    ivf_index,
    ivf_probe,
    normalized_vectors,
    rerank_exact_topk,
    verify_cosine_candidates,
)
from syncmaven_spark.operators.pq import (  # noqa: F401
    ivfpq_append,
    ivfpq_encode_assigned,
    ivfpq_index,
    ivfpq_probe,
    load_pq_codebooks,
    pq_drift,
    pq_drift_assigned,
    pq_encode,
    pq_probe,
    pq_train,
)
from syncmaven_spark.operators.packing import (  # noqa: F401
    mixture_weights,
    pack_sequences,
    sample_token_budget,
)
from syncmaven_spark.operators.text import (  # noqa: F401
    document_fingerprint,
    language_id,
    pii_redact,
    quality_features,
    quality_filter,
    repetition_stats,
    token_count,
    verbatim_spans,
    verbatim_window_stats,
)
