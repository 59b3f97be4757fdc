from slower_whisper_spark.operators.dedup import (
    drop_exact_duplicates,
    exact_duplicate_groups,
    jaccard_pairs,
    minhash_lsh_candidates,
    minhash_signature,
    minhash_signatures_df,
    simhash64,
    simhash_near_duplicates,
    simhash_signatures_df,
)
from slower_whisper_spark.operators.nested import child_suite_verdicts, explode_child
from slower_whisper_spark.operators.sessionize import (
    adjacent_pairs,
    asof_join,
    monotonic_gaps,
    session_stats,
    sessionize,
)
from slower_whisper_spark.operators.similarity import (
    cosine_topk,
    embedding_near_duplicates,
    ivf_topk,
    lsh_bucketed_topk,
)

__all__ = [
    "drop_exact_duplicates",
    "exact_duplicate_groups",
    "jaccard_pairs",
    "minhash_lsh_candidates",
    "minhash_signature",
    "minhash_signatures_df",
    "simhash64",
    "simhash_near_duplicates",
    "simhash_signatures_df",
    "child_suite_verdicts",
    "explode_child",
    "adjacent_pairs",
    "asof_join",
    "monotonic_gaps",
    "session_stats",
    "sessionize",
    "cosine_topk",
    "embedding_near_duplicates",
    "ivf_topk",
    "lsh_bucketed_topk",
]
