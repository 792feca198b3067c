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


@pytest.mark.usefixtures("ray_session")
class TestSecondWaveProperties:
    # alphabet capped at Latin-1: above it, Arrow utf8_lower and
    # Python str.lower() diverge on a few codepoints (e.g. 0x130)
    @given(st.lists(st.text(alphabet=st.characters(min_codepoint=32,
                                                   max_codepoint=255),
                            max_size=24),
                    min_size=1, max_size=12),
           st.lists(st.text(alphabet=st.characters(min_codepoint=32,
                                                   max_codepoint=255),
                            min_size=1, max_size=6),
                    min_size=1, max_size=3))
    @settings(max_examples=20, deadline=None)
    def test_substring_search_equals_python_in(self, texts, pats):
        import pyarrow as pa
        import ray.data as rd
        from tldr_ray.stages.text_analysis import substring_search

        ds = rd.from_arrow(pa.table({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string())}))
        got = substring_search(ds, pats).to_pandas()
        # 0-row to_pandas drops columns (known Ray Data gotcha)
        got_set = (set() if len(got) == 0
                   else set(zip(got["pattern"], got["doc_id"])))
        want = {(p.lower(), i) for p in pats
                for i, t in enumerate(texts) if p.lower() in t.lower()}
        assert got_set == want

    @given(st.integers(1, 6), st.integers(0, 2**31 - 1))
    @settings(max_examples=20, deadline=None)
    def test_rolling_median_equals_pandas(self, k, seed):
        import pandas as pd
        import ray.data as rd
        from tldr_ray.stages.windows import rolling_median

        rng = np.random.RandomState(seed)
        n = int(rng.randint(1, 120))
        df = pd.DataFrame({
            "g": rng.randint(0, 4, n).astype(np.int64),
            "o": np.arange(n, dtype=np.int64),
            "v": rng.randint(-9, 9, n).astype(np.int64)})
        got = (rolling_median(rd.from_pandas(df), "g", ["o"], "v", k=k)
               .to_pandas().sort_values(["g", "o"])
               .reset_index(drop=True))
        want = df.sort_values(["g", "o"]).reset_index(drop=True)
        want["roll_median"] = (want.groupby("g", sort=False)["v"]
                               .rolling(k, min_periods=1).median()
                               .reset_index(level=0, drop=True))
        assert np.allclose(got["roll_median"], want["roll_median"],
                           rtol=0, atol=0)

    @given(st.integers(0, 2**31 - 1), st.integers(1, 50))
    @settings(max_examples=20, deadline=None)
    def test_class_rebalance_totals(self, seed, target):
        import pandas as pd
        import ray.data as rd
        from tldr_ray.stages.agg import class_rebalance

        rng = np.random.RandomState(seed)
        n = int(rng.randint(1, 300))
        df = pd.DataFrame({
            "id": np.arange(n, dtype=np.int64),
            "c": rng.choice(["x", "y", "z"], n)})
        out = class_rebalance(
            rd.from_pandas(df).repartition(int(rng.randint(1, 6))),
            "c", "id", target).to_pandas()
        tot = out.groupby("c")["copies"].sum().to_dict()
        present = set(df["c"])
        assert set(tot) == present
        assert all(v == target for v in tot.values())
        # ids are real source ids and unique within class
        assert not out.duplicated(["c", "id"]).any()
        assert set(out["id"]).issubset(set(df["id"]))


class TestPavaPool:
    """stages.agg.pava_pool — pure kernel, no Ray session needed."""

    @staticmethod
    def _minimax(n, s):
        """O(B^3) reference: p(v) = max_{i<=v} min_{j>=v} mean(i..j),
        evaluated in exact fractions."""
        from fractions import Fraction
        B = len(n)
        out = []
        for v in range(B):
            best = None
            for i in range(v + 1):
                worst = None
                for j in range(v, B):
                    f = Fraction(sum(s[i:j + 1]), sum(n[i:j + 1]))
                    worst = f if worst is None else min(worst, f)
                best = worst if best is None else max(best, worst)
            out.append(best)
        return out

    @given(st.lists(st.tuples(st.integers(1, 9), st.integers(0, 9)),
                    min_size=1, max_size=12))
    @settings(max_examples=60, deadline=None)
    def test_equals_minimax_reference(self, blocks):
        from tldr_ray.stages.agg import pava_pool

        n = [a for a, b in blocks]
        s = [min(b, a) for a, b in blocks]    # s <= n
        rate, pn, ps = pava_pool(n, s)
        want = self._minimax(n, s)
        for k in range(len(n)):
            # the pooled division is the correctly-rounded value of
            # the exact rational optimum — the bit-equality the SQL
            # minimax mirror relies on
            assert rate[k] == float(want[k]), (k, rate[k], want[k])
            # and the pooled sums form that same rational
            assert ps[k] * want[k].denominator \
                == want[k].numerator * pn[k]
        # non-decreasing fit
        assert all(rate[k] <= rate[k + 1] for k in range(len(n) - 1))

    def test_monotone_input_unchanged(self):
        from tldr_ray.stages.agg import pava_pool

        n = [4, 4, 4]
        s = [0, 2, 4]
        rate, pn, ps = pava_pool(n, s)
        assert rate.tolist() == [0.0, 0.5, 1.0]
        assert pn.tolist() == [4, 4, 4]

    def test_total_mass_preserved(self):
        from tldr_ray.stages.agg import pava_pool

        n = [3, 2, 5, 1]
        s = [3, 0, 2, 1]
        rate, pn, ps = pava_pool(n, s)
        # weighted mean of the fit equals the raw rate (projection
        # preserves the total)
        assert float(np.dot(rate, n)) == float(sum(s))
