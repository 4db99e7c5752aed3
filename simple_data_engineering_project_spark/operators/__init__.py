"""Operator library: upsert, dedup, joins, similarity, text, multimodal."""

from .dedup import (
    dedup_exact,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    simhash_near_dups,
)
from .joins import (
    join_anti,
    join_asof,
    join_broadcast,
    join_range,
    join_range_banded,
    join_semi,
)
from .similarity import brute_force_topk, lsh_topk
from .upsert import upsert_last_write_wins

__all__ = [
    "dedup_exact",
    "minhash_lsh_candidates",
    "ngram_jaccard_pairs",
    "simhash_near_dups",
    "join_anti",
    "join_asof",
    "join_broadcast",
    "join_range",
    "join_range_banded",
    "join_semi",
    "upsert_last_write_wins",
    "brute_force_topk",
    "lsh_topk",
]
