"""Unit tests for state helpers and the classic Go sort emulation."""

import numpy as np

from tldr_ray.kernel.go_sort import go_sort, go_sort_classic
from tldr_ray.state import (write_manifest, read_manifest, latest_checkpoint,
                            fingerprint_input)


class TestGoSorts:
    def test_both_sorts_order_correctly(self):
        rng = np.random.default_rng(5)
        for n in (0, 1, 5, 13, 50, 300):
            base = rng.integers(0, 50, n).tolist()
            for fn in (go_sort, go_sort_classic):
                data = list(base)
                fn(data, lambda a, b: a < b)
                assert data == sorted(base)

    def test_pdqsort_deterministic(self):
        base = [(i % 7, i) for i in range(100)]
        a, b = list(base), list(base)
        go_sort(a, lambda x, y: x[0] < y[0])
        go_sort(b, lambda x, y: x[0] < y[0])
        assert a == b  # same permutation every time


class TestStateHelpers:
    def test_manifest_roundtrip(self, tmp_path):
        d = str(tmp_path)
        assert read_manifest(d) is None
        assert latest_checkpoint(d) is None
        write_manifest(d, {"iteration": 7, "n_total": 3})
        assert read_manifest(d)["n_total"] == 3
        assert latest_checkpoint(d) == 7

    def test_fingerprint_changes_with_content(self, tmp_path):
        p1 = tmp_path / "a.parquet"
        p1.write_bytes(b"xxxx")
        f1 = fingerprint_input([str(p1)])
        assert f1 == fingerprint_input([str(p1)])
        p2 = tmp_path / "b.parquet"
        p2.write_bytes(b"yyyyyy")
        assert fingerprint_input([str(p1), str(p2)]) != f1
