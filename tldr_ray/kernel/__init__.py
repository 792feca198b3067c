"""Pure (no-Ray) NumPy/Python kernel reproducing the reference semantics.

This is both (a) the per-conversation ``map_groups`` kernel used by the
Ray pipelines and (b) the correctness oracle for the distributed graph
layer. Every function cites the reference behavior it reproduces.
"""

from tldr_ray.kernel.text import (
    tokenize_sentences,
    sanitize_word,
    default_word_tokenizer,
    build_dictionary,
)
from tldr_ray.kernel.distance import distance, symmetric_difference, intersection
from tldr_ray.kernel.dedup import uniq_sentence_indices
from tldr_ray.kernel.pagerank_ref import pagerank_ref
from tldr_ray.kernel.lexrank import (
    build_vectors,
    pairwise_weights,
    edges_above_threshold,
    centrality_rank,
    pagerank_rank,
    summarize,
    summarize_to_edges,
)

__all__ = [
    "tokenize_sentences",
    "sanitize_word",
    "default_word_tokenizer",
    "build_dictionary",
    "distance",
    "symmetric_difference",
    "intersection",
    "uniq_sentence_indices",
    "pagerank_ref",
    "build_vectors",
    "pairwise_weights",
    "edges_above_threshold",
    "centrality_rank",
    "pagerank_rank",
    "summarize",
    "summarize_to_edges",
]
