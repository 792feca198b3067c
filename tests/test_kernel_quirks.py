"""Unit tests for the reference's load-bearing quirks (SURVEY.md §2.5)
and the edge cases of /root/reference/edge_cases_test.go."""

import numpy as np
import pytest

from tldr_ray.config import SummarizeConfig
from tldr_ray.kernel import (
    tokenize_sentences,
    sanitize_word,
    default_word_tokenizer,
    build_dictionary,
    uniq_sentence_indices,
    build_vectors,
    pairwise_weights,
    edges_above_threshold,
    summarize,
)


class TestQ1DroppedTail:
    def test_text_after_last_terminator_dropped(self):
        assert tokenize_sentences("One. Two! Tail without punctuation") == ["One.", "Two!"]

    def test_no_punctuation_yields_nothing(self):
        # edge_cases_test.go:146-151
        assert tokenize_sentences("Hello") == []

    def test_terminator_at_end_of_text(self):
        assert tokenize_sentences("Only one sentence.") == ["Only one sentence."]

    def test_terminal_punct_kept_and_inner_newlines_preserved(self):
        # a ':' does not end a sentence; the golden corpus has a sentence
        # spanning a paragraph break
        out = tokenize_sentences("A heading:\n\nreal body ends. Next.")
        assert out == ["A heading:\n\nreal body ends.", "Next."]


class TestQ2SingleSentence:
    def test_single_sentence_returns_empty(self):
        # n=1 -> 0 edges -> empty graph -> nil (edge_cases_test.go:56-64)
        assert summarize("Only one sentence.", 1) == []

    def test_empty_text(self):
        assert summarize("", 1) == []

    def test_whitespace_only(self):
        assert summarize("   \n\t  \r\n  ", 1) == []


class TestQ3NumClamp:
    TEXT = "First sentence about dogs. Second sentence about cats. Third one about birds."

    def test_negative_num_clamps_to_one(self):
        assert len(summarize(self.TEXT, -1)) == 1

    def test_zero_num_clamps_to_one(self):
        assert len(summarize(self.TEXT, 0)) == 1

    def test_huge_num_clamps_to_one(self):
        assert len(summarize(self.TEXT, 10000)) == 1

    def test_exact_num(self):
        assert len(summarize(self.TEXT, 3)) == 3


class TestQ5SanitizerDictionaryMismatch:
    def test_tokenizer_keeps_apostrophe_dict_drops_it(self):
        # "here's" tokenizes to "here's" but the dictionary holds "heres",
        # so the word silently drops out of the vector (tldr.go:343)
        assert sanitize_word("here's") == "here's"
        assert build_dictionary("here's") == {"heres": 1}

    def test_underscore(self):
        assert sanitize_word("snake_case") == "snake_case"
        assert build_dictionary("snake_case") == {"snakecase": 1}

    def test_dash_inside_word_kept_by_both(self):
        assert sanitize_word("well-known") == "well-known"
        assert build_dictionary("well-known") == {"well-known": 1}

    def test_leading_dash_dropped_by_dictionary(self):
        assert build_dictionary("-dash") == {"dash": 1}

    def test_double_dash_kept_by_dict_dropped_by_tokenizer(self):
        # runs of >=2 non-alnum are deleted by the sanitizer, but the
        # dictionary cleaner's `prev` is transparent to kept dashes
        assert sanitize_word("a--b") == "ab"
        assert build_dictionary("a--b") == {"a--b": 1}

    def test_dash_after_deleted_char_kept(self):
        assert build_dictionary("a!-b") == {"a-b": 1}

    def test_sanitize_run_of_two(self):
        assert sanitize_word("Don''t") == "dont"
        assert sanitize_word("(hello)") == "hello"
        assert sanitize_word("!!!") == ""


class TestQ6Q7Weights:
    def setup_method(self):
        self.dictionary = {"a": 1, "b": 2, "c": 3, "d": 4}
        self.mat = build_vectors([["a", "b"], ["a", "c"], ["a", "b"]], self.dictionary)

    def test_hamming_is_dissimilarity(self):
        w = pairwise_weights(self.mat, "hamming")
        assert w[0, 1] == 2          # b vs c differ in 2 positions
        assert w[0, 2] == 0          # identical vectors -> weight 0
        assert w[0, 1] == w[1, 0]

    def test_jaccard_nonstandard(self):
        v = len(self.dictionary)
        w = pairwise_weights(self.mat, "jaccard")
        common = v - 2               # positions equal incl. both-zero
        assert w[0, 1] == pytest.approx(1.0 - common / (2 * v - common))
        assert w[0, 2] == 0.0        # identical -> 0 -> filtered by Q8

    def test_unknown_weighing_falls_back_to_hamming(self):
        assert np.array_equal(pairwise_weights(self.mat, "bogus"),
                              pairwise_weights(self.mat, "hamming"))

    def test_q8_strict_threshold(self):
        w = pairwise_weights(self.mat, "hamming")
        src, dst, _ = edges_above_threshold(w, 0.001)
        pairs = set(zip(src.tolist(), dst.tolist()))
        assert (0, 2) not in pairs and (2, 0) not in pairs   # identical pair dropped
        assert (0, 1) in pairs and (1, 0) in pairs


class TestQ11MaxCharacters:
    def test_budget_truncation(self):
        # edge_cases_test.go:20-35: total output <= 50 chars
        cfg = SummarizeConfig(max_characters=50)
        out = summarize("This is a long first sentence. This is a shorter one.", 2, cfg)
        assert out
        assert sum(len(s) for s in out) <= 50

    def test_no_limit_returns_all(self):
        cfg = SummarizeConfig(max_characters=0)
        out = summarize("First sentence about dogs. Second sentence about cats. "
                        "Third one about birds.", 3, cfg)
        assert len(out) == 3

    def test_q4_divergence_documented(self):
        # "First sentence."/"Third sentence." are Jaro-similar >= 0.95, so
        # the third is rejected. The reference's Q4 write-back bug makes the
        # rejection invisible (stale tail keeps 3 nodes); this engine
        # implements CORRECT dedup, so only 2 vertices remain and k=3 clamps
        # to 1 (SURVEY.md §2.5 Q4 — deliberate, documented divergence).
        out = summarize("First sentence. Second sentence. Third sentence.", 3)
        assert len(out) == 1

    def test_rune_based_truncation(self):
        cfg = SummarizeConfig(max_characters=4)
        out = summarize("Ääkkösiä tässä on. Toinen virke tulee tähän heti.", 2, cfg)
        assert sum(len(s) for s in out) <= 4


class TestUniqSentences:
    def test_exact_duplicate_rejected(self):
        toks = [["this", "is", "a", "test"],
                ["this", "is", "a", "test"],
                ["another", "different", "sentence"]]
        assert uniq_sentence_indices(toks, 0.95) == [0, 2]

    def test_similar_kept_just_above_their_distance(self):
        # distance("this is a test", "this is the test") ~= 0.7798 < 0.8
        toks = [["this", "is", "a", "test"],
                ["this", "is", "the", "test"],
                ["completely", "different"]]
        assert uniq_sentence_indices(toks, 0.8) == [0, 1, 2]

    def test_similar_rejected_below_their_distance(self):
        toks = [["this", "is", "a", "test"],
                ["this", "is", "the", "test"],
                ["completely", "different"]]
        assert uniq_sentence_indices(toks, 0.75) == [0, 2]

    def test_empty_input(self):
        assert uniq_sentence_indices([], 0.95) == []

    def test_single_sentence(self):
        assert uniq_sentence_indices([["single", "sentence"]], 0.95) == [0]

    def test_threshold_one_keeps_non_identical(self):
        toks = [["first", "sentence"], ["second", "sentence"], ["third", "sentence"]]
        assert uniq_sentence_indices(toks, 1.0) == [0, 1, 2]

    def test_threshold_zero(self):
        # distance >= 0.0 is true for every pair, so everything after the
        # first sentence is rejected in the Jaro pass
        toks = [["first", "sentence"], ["unrelated", "words"]]
        assert uniq_sentence_indices(toks, 0.0) == [0]

    def test_csis_substring_rejects_subset(self):
        toks = [["big", "cat"], ["the", "very", "big", "cat", "sat"]]
        # "big cat" is a substring of the second joined sentence -> i rejected
        assert uniq_sentence_indices(toks, 0.999) == [1]


class TestCustomHooks:
    def test_custom_algorithm(self):
        cfg = SummarizeConfig(algorithm="custom",
                              custom_algorithm=lambda edges: [0])
        out = summarize("", 1, cfg,
                        presplit=["First sentence", "Second sentence"])
        assert out == ["First sentence"]

    def test_custom_weighing(self):
        cfg = SummarizeConfig(weighing="custom",
                              custom_weighing=lambda s, d: 1.0)
        out = summarize("", 1, cfg,
                        presplit=["First sentence", "Second sentence"])
        assert len(out) == 1

    def test_custom_word_tokenizer_same_tokens_everywhere(self):
        # every sentence tokenizes identically -> identical vectors ->
        # hamming 0 everywhere -> no edges -> empty result
        cfg = SummarizeConfig(word_tokenizer=lambda s: ["custom", "tokens"])
        out = summarize("This is a test sentence. And another one here.", 1, cfg)
        assert out == []

    def test_injected_dictionary(self):
        cfg = SummarizeConfig(dictionary={"alpha": 1, "beta": 2})
        out = summarize("Alpha is here. Beta is there. Gamma unknown now.", 1, cfg)
        assert len(out) == 1
