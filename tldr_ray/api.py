"""Drop-in high-level API mirroring the reference's ``Bag`` surface.

A user of the reference (didasy/tldr) drives it as::

    bag := tldr.New()
    bag.Set(maxChars, damping, tolerance, threshold, sentDistTh, alg, weighing)
    bag.SetDictionary(...) / SetCustomAlgorithm / SetCustomWeighing /
    bag.SetWordTokenizer(...)
    result, err := bag.Summarize(text, num)

``Summarizer`` reproduces that surface 1:1 in Python
(/root/reference/tldr.go:67-158) on top of the kernel, plus
``summarize_dataset`` to run the same configuration distributed over a
Ray Dataset of documents or transcripts.
"""

from __future__ import annotations

from typing import Callable, Optional

from tldr_ray.config import (
    SummarizeConfig,
    DEFAULT_ALGORITHM,
    DEFAULT_WEIGHING,
)
from tldr_ray.kernel.lexrank import summarize


class Summarizer:
    """Python equivalent of ``tldr.New()`` (reference tldr.go:67-78)."""

    def __init__(self):
        self.config = SummarizeConfig()
        self.original_sentences: Optional[list[str]] = None

    # -- knobs (tldr.go:81-107) ----------------------------------------
    def set(self, max_characters: int, damping: float, tolerance: float,
            threshold: float, sentences_distance_threshold: float,
            algorithm: str, weighing: str) -> None:
        """tldr.go:81-89 — zeros/empties fall back to defaults the same
        way the reference's golden tests rely on (they pass "" and use
        the default path via the switch fallthrough)."""
        c = self.config
        c.max_characters = max_characters
        c.damping = damping
        c.tolerance = tolerance
        c.threshold = threshold
        c.sentences_distance_threshold = sentences_distance_threshold
        c.algorithm = algorithm
        c.weighing = weighing

    def set_dictionary(self, dictionary: dict[str, int]) -> None:
        self.config.dictionary = dictionary

    def set_custom_algorithm(self, fn: Callable) -> None:
        self.config.custom_algorithm = fn
        self.config.algorithm = "custom"

    def set_custom_weighing(self, fn: Callable) -> None:
        self.config.custom_weighing = fn
        self.config.weighing = "custom"

    def set_word_tokenizer(self, fn: Callable[[str], list]) -> None:
        self.config.word_tokenizer = fn

    # -- reference behavior shims --------------------------------------
    @property
    def _effective(self) -> SummarizeConfig:
        """The reference treats unknown algorithm/weighing strings as
        pagerank/hamming via switch defaults; '' behaves the same."""
        c = self.config
        eff = SummarizeConfig(**{**c.__dict__})
        if eff.algorithm not in ("centrality", "custom"):
            eff.algorithm = DEFAULT_ALGORITHM
        if eff.weighing not in ("jaccard", "custom"):
            eff.weighing = DEFAULT_WEIGHING
        return eff

    def summarize(self, text: str, num: int) -> list[str]:
        """tldr.go:110-158, including the O28 pre-split path when
        ``original_sentences`` is set."""
        return summarize(text, num, self._effective,
                         presplit=self.original_sentences)

    def string(self) -> str:
        """Debug view (reference ``String()``, tldr.go:41-44)."""
        return self.config.to_json()

    # -- distributed ---------------------------------------------------
    def summarize_dataset(self, ds, num: int = 3, kind: str = "documents",
                          **kwargs):
        """Run this configuration over a Ray Dataset.

        kind="documents": rows (doc_id, text), embarrassingly parallel.
        kind="transcripts": rows (conv_id, turn_idx, text), grouped.
        """
        from tldr_ray.pipelines import summarize_documents, summarize_transcripts

        if kind == "documents":
            return summarize_documents(ds, num=num, cfg=self._effective,
                                       **kwargs)
        if kind == "transcripts":
            return summarize_transcripts(ds, num=num, cfg=self._effective)
        raise ValueError(f"unknown kind: {kind!r}")


def new() -> Summarizer:
    """Alias mirroring the reference constructor name."""
    return Summarizer()
