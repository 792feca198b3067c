"""Property and randomized-oracle tests."""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from tldr_ray.kernel import distance, pagerank_ref, uniq_sentence_indices
from tldr_ray.kernel.distance import distance_upper_bound


class TestDistanceProperties:
    @given(st.text(max_size=40), st.text(max_size=40))
    @settings(max_examples=200, deadline=None)
    def test_range_and_identity(self, a, b):
        d = distance(a, b)
        if a == b and a:
            assert d == 1.0
        elif not a and not b:
            assert d == 0.0
        else:
            assert 0.0 <= d <= 1.0 or d != d  # never out of range (no NaN seen)

    @given(st.text(min_size=1, max_size=40), st.text(min_size=1, max_size=40))
    @settings(max_examples=200, deadline=None)
    def test_upper_bound_is_sound(self, a, b):
        la = len(a.lower().encode("utf-8"))
        lb = len(b.lower().encode("utf-8"))
        assert distance(a, b) <= distance_upper_bound(la, lb) + 1e-12


class TestPairwiseBoundSoundness:
    @given(st.lists(st.text(alphabet=st.characters(min_codepoint=32,
                                                   max_codepoint=126),
                            min_size=0, max_size=30),
                    min_size=2, max_size=6))
    @settings(max_examples=150, deadline=None)
    def test_bound_dominates_distance_ascii(self, sens):
        from tldr_ray.kernel.dedup import _pairwise_jaro_bound

        bound = _pairwise_jaro_bound(sens)
        for i in range(len(sens)):
            for j in range(i + 1, len(sens)):
                assert distance(sens[i], sens[j]) <= bound[i, j] + 1e-12

    @given(st.lists(st.text(max_size=20), min_size=2, max_size=5))
    @settings(max_examples=100, deadline=None)
    def test_bound_dominates_distance_unicode(self, sens):
        from tldr_ray.kernel.dedup import _pairwise_jaro_bound

        bound = _pairwise_jaro_bound(sens)
        for i in range(len(sens)):
            for j in range(i + 1, len(sens)):
                assert distance(sens[i], sens[j]) <= bound[i, j] + 1e-12


class TestUniqProperties:
    @given(st.lists(st.lists(st.sampled_from(["aa", "bb", "cc", "dd"]),
                             min_size=1, max_size=4), max_size=8),
           st.floats(min_value=0.1, max_value=1.0))
    @settings(max_examples=100, deadline=None)
    def test_kept_indices_sorted_unique_subset(self, toks, th):
        kept = uniq_sentence_indices(toks, th)
        assert kept == sorted(set(kept))
        assert all(0 <= i < len(toks) for i in kept)
        if toks:
            assert len(kept) >= 1  # something always survives


class TestPagerankRefProperties:
    def _random_graph(self, seed, n=30, m=200):
        rng = np.random.default_rng(seed)
        return (rng.integers(0, n, m), rng.integers(0, n, m),
                rng.random(m) + 0.01)

    @pytest.mark.parametrize("seed", [1, 2, 3])
    def test_scores_sum_to_one(self, seed):
        src, dst, w = self._random_graph(seed)
        _, scores = pagerank_ref(src, dst, w)
        # with dangling leak redistribution total mass stays ~1
        assert np.isclose(scores.sum(), 1.0, atol=1e-3)

    @pytest.mark.parametrize("seed", [1, 2])
    def test_edge_order_invariant(self, seed):
        src, dst, w = self._random_graph(seed)
        ids1, s1 = pagerank_ref(src, dst, w)
        perm = np.random.default_rng(99).permutation(src.size)
        ids2, s2 = pagerank_ref(src[perm], dst[perm], w[perm])
        assert np.array_equal(ids1, ids2)
        np.testing.assert_allclose(s1, s2, atol=1e-12)

    @pytest.mark.parametrize("seed", [1, 2])
    def test_weight_scale_invariant(self, seed):
        # row normalization makes global weight scaling a no-op
        src, dst, w = self._random_graph(seed)
        _, s1 = pagerank_ref(src, dst, w)
        _, s2 = pagerank_ref(src, dst, w * 7.5)
        np.testing.assert_allclose(s1, s2, atol=1e-12)


def _uf_components(n, edges):
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return [find(i) for i in range(n)]


def _brute_triangles(n, edges):
    adj = np.zeros((n, n), dtype=bool)
    for a, b in edges:
        if a != b:
            adj[a, b] = adj[b, a] = True
    count = 0
    for i in range(n):
        for j in range(i + 1, n):
            if adj[i, j]:
                for k in range(j + 1, n):
                    if adj[i, k] and adj[j, k]:
                        count += 1
    return count


@pytest.mark.usefixtures("ray_session")
class TestRandomGraphOracles:
    def _edges(self, seed, n=25, m=60):
        rng = np.random.default_rng(seed)
        pairs = {(int(a), int(b)) for a, b in
                 zip(rng.integers(0, n, m), rng.integers(0, n, m)) if a != b}
        return n, sorted(pairs)

    def _ds(self, edges):
        import pyarrow as pa
        import ray.data as rd

        return rd.from_arrow(pa.table({
            "src": pa.array([e[0] for e in edges], pa.int64()),
            "dst": pa.array([e[1] for e in edges], pa.int64()),
            "weight": pa.array([1.0] * len(edges), pa.float64()),
        }))

    @pytest.mark.parametrize("seed", [11, 22])
    def test_components_match_union_find(self, seed):
        from tldr_ray.graph import connected_components

        n, edges = self._edges(seed)
        ids, labels, info = connected_components(self._ds(edges),
                                                 num_partitions=3)
        assert info["converged"]
        oracle = _uf_components(n, edges)
        got = dict(zip(ids.tolist(), labels.tolist()))
        # only vertices present in edges exist in the engine (Q10)
        for v, lab in got.items():
            assert oracle[v] == lab

    @pytest.mark.parametrize("seed", [11, 22])
    def test_triangles_match_bruteforce(self, seed):
        from tldr_ray.graph import triangle_counts

        n, edges = self._edges(seed)
        total, _ = triangle_counts(self._ds(edges))
        assert total == _brute_triangles(n, edges)
