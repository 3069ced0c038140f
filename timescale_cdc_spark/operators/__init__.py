"""Tier C operators (SURVEY.md §2, BASELINE.json north_star): the
LLM-training-data-pipeline extensions — deduplication, similarity
search, text analysis, multimodal columns — each designed for 100 TB
(LSH banding instead of all-pairs, JVM-side expressions instead of
Python loops, Pandas UDFs only at the genuinely-custom edges).
"""

from timescale_cdc_spark.operators.decontam import (
    decontaminate,
    decontaminate_spans,
    dedup_substrings,
)
from timescale_cdc_spark.operators.dedup import (
    dedup_by_key,
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    normalize_url,
    simhash_pairs,
)
from timescale_cdc_spark.operators.layout import zorder_key, zorder_write
from timescale_cdc_spark.operators.packing import (
    assign_packs,
    assign_packs_exact,
)
from timescale_cdc_spark.operators.similarity import (
    brute_force_topk,
    embedding_dup_pairs,
    hyperplane_lsh_topk,
)
from timescale_cdc_spark.operators.downsample import (
    asap_smooth,
    lttb,
    m4_downsample,
)
from timescale_cdc_spark.operators.sampling import (
    hash_split,
    mixture_epochs,
    reservoir_per_group,
    stratified_sample,
)
from timescale_cdc_spark.operators.sharding import (
    assign_shards,
    write_shards,
)
from timescale_cdc_spark.operators.text import (
    fingerprint,
    language_scores,
    quality_score,
    token_stats,
)

__all__ = [
    "asap_smooth",
    "assign_packs",
    "assign_packs_exact",
    "assign_shards",
    "brute_force_topk",
    "decontaminate",
    "decontaminate_spans",
    "dedup_by_key",
    "dedup_substrings",
    "embedding_dup_pairs",
    "exact_dedup",
    "fingerprint",
    "hash_split",
    "hyperplane_lsh_topk",
    "language_scores",
    "lttb",
    "m4_downsample",
    "minhash_lsh_pairs",
    "mixture_epochs",
    "ngram_jaccard_pairs",
    "normalize_url",
    "quality_score",
    "reservoir_per_group",
    "simhash_pairs",
    "stratified_sample",
    "token_stats",
    "write_shards",
    "zorder_key",
    "zorder_write",
]
