"""Tests for the Jaro-variant distance and positional helpers.

Expected values mirror /root/reference/util_test.go and hand-checked
properties of the transliterated algorithm (util.go:40-135)."""

import pytest

from tldr_ray.kernel import distance, symmetric_difference, intersection


class TestDistance:
    def test_both_empty(self):
        assert distance("", "") == 0.0

    def test_identical(self):
        assert distance("abc", "abc") == 1.0

    def test_identical_after_lowering_not_shortcut(self):
        # exact-equality shortcut happens BEFORE lowercasing
        assert distance("ABC", "abc") == 1.0  # lowered -> equal chars, m=3, t=0

    def test_no_common(self):
        assert distance("abc", "xyz") == 0.0

    def test_classic_jaro_value(self):
        # MARTHA/MARHTA: the NaturalNode variant reproduces classic Jaro
        # here: m=6, t=1 -> (1 + 1 + 5/6)/3
        assert distance("martha", "marhta") == pytest.approx((1 + 1 + 5 / 6) / 3)

    def test_symmetry_of_argument_order(self):
        assert distance("dixon", "dicksonx") == distance("dicksonx", "dixon")

    def test_range(self):
        for a, b in [("abcd", "abcf"), ("hello world", "help wanted"),
                     ("a", "ab"), ("same same", "same")]:
            d = distance(a, b)
            assert 0.0 <= d <= 1.0


class TestPositionalHelpers:
    # expected values ported verbatim from /root/reference/util_test.go
    def test_symmetric_difference_differs(self):
        assert symmetric_difference([1, 2, 3, 4, 5], [1, 0, 3, 0, 5]) == [1, 3]

    def test_symmetric_difference_identical(self):
        assert symmetric_difference([1, 2, 3], [1, 2, 3]) == []

    def test_symmetric_difference_all_differ(self):
        assert symmetric_difference([1, 2, 3], [0, 0, 0]) == [0, 1, 2]

    def test_symmetric_difference_empty_and_single(self):
        assert symmetric_difference([], []) == []
        assert symmetric_difference([1], [0]) == [0]

    def test_intersection_some(self):
        assert intersection([1, 2, 3, 4, 5], [1, 0, 3, 0, 5]) == [0, 2, 4]

    def test_intersection_none(self):
        assert intersection([1, 2, 3], [0, 0, 0]) == []

    def test_intersection_all(self):
        assert intersection([1, 2, 3], [1, 2, 3]) == [0, 1, 2]

    def test_intersection_empty_and_single(self):
        assert intersection([], []) == []
        assert intersection([1], [1]) == [0]

    def test_intersection_large(self):
        src = list(range(100))
        dst = [i % 2 for i in range(100)]
        assert intersection(src, dst) == [0, 1]


class TestJaroStandard:
    def test_bit_equal_to_duckdb(self):
        import duckdb
        import numpy as np
        from tldr_ray.kernel.distance import jaro_standard

        con = duckdb.connect()
        rng = np.random.default_rng(13)
        vocab = ["scan", "join", "merge", "table", "row", "batch", "a"]
        cases = [("", ""), ("a", ""), ("abc", "abc"),
                 ("martha", "marhta"), ("dixon", "dicksonx")]
        for _ in range(60):
            a = " ".join(rng.choice(vocab, rng.integers(0, 30)))
            b = " ".join(rng.choice(vocab, rng.integers(0, 30)))
            cases.append((a, b))
        for a, b in cases:
            d = con.execute("select jaro_similarity(?, ?)",
                            [a, b]).fetchone()[0]
            assert jaro_standard(a, b) == d, (a, b)

    def test_known_values(self):
        from tldr_ray.kernel.distance import jaro_standard

        assert jaro_standard("martha", "marhta") == (
            (6 / 6 + 6 / 6 + 5 / 6) / 3)
        assert jaro_standard("abc", "xyz") == 0.0
        assert jaro_standard("same", "same") == 1.0
