"""Forced-past-gate equality tests for the graph broadcast gates.

Every graph op that broadcasts an O(V)/O(E) table behind the COUNTED
gate (graph/gate.py) must produce IDENTICAL output on its join path.
``broadcast_limit_rows=0`` forces past the gate; the default takes the
broadcast path on these tiny inputs — so each test runs both and pins
row-for-row equality (VERDICT r4 item 1).
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


def edge_ds(pairs):
    import ray.data as rd

    src = np.array([p[0] for p in pairs], np.int64)
    dst = np.array([p[1] for p in pairs], np.int64)
    return rd.from_arrow(pa.table({
        "src": src, "dst": dst,
        "weight": np.ones(len(pairs), np.float64)}))


def synth_edges(n_v=40, n_e=160, seed=7):
    rng = np.random.RandomState(seed)
    s = rng.randint(0, n_v, n_e)
    d = rng.randint(0, n_v, n_e)
    keep = s != d
    return list(zip(s[keep].tolist(), d[keep].tolist()))


def _sorted(df, cols):
    return df.sort_values(cols).reset_index(drop=True)


@pytest.mark.usefixtures("ray_session")
class TestGateEquality:
    def test_random_walks_join_path(self):
        from tldr_ray.graph.walks import random_walks

        pairs = synth_edges()
        a = random_walks(edge_ds(pairs), walk_len=3).to_pandas()
        b = random_walks(edge_ds(pairs), walk_len=3,
                         broadcast_limit_rows=0).to_pandas()
        cols = ["start", "step", "vertex"]
        pd.testing.assert_frame_equal(_sorted(a, cols), _sorted(b, cols))

    def test_node2vec_join_path(self):
        from tldr_ray.graph.walks import node2vec_walks

        pairs = synth_edges(n_v=30, n_e=120, seed=11)
        a = node2vec_walks(edge_ds(pairs), walk_len=3).to_pandas()
        b = node2vec_walks(edge_ds(pairs), walk_len=3,
                           broadcast_limit_rows=0).to_pandas()
        cols = ["start", "step", "vertex"]
        pd.testing.assert_frame_equal(_sorted(a, cols), _sorted(b, cols))

    def test_assortativity_join_path(self):
        from tldr_ray.graph.triangles import degree_assortativity

        pairs = synth_edges(seed=23)
        m1, s1a, s2a, s11a, r1 = degree_assortativity(edge_ds(pairs))
        m2, s1b, s2b, s11b, r2 = degree_assortativity(
            edge_ds(pairs), broadcast_limit_rows=0)
        assert (m1, s1a, s2a, s11a) == (m2, s1b, s2b, s11b)
        assert r1 == r2   # one IEEE division of equal ints: bit-equal

    def test_edge_support_join_path(self):
        import ray.data as rd
        from tldr_ray.graph.triangles import edge_support

        pairs = sorted({(min(a, b), max(a, b))
                        for a, b in synth_edges(seed=3)})
        und = rd.from_arrow(pa.table({
            "a": np.array([p[0] for p in pairs], np.int64),
            "b": np.array([p[1] for p in pairs], np.int64)}))
        a = edge_support(und, broadcast_degrees=True).to_pandas()
        b = edge_support(und, broadcast_degrees=False).to_pandas()
        c = edge_support(und).to_pandas()     # auto gate (broadcast here)
        d = edge_support(und, broadcast_limit_rows=0).to_pandas()  # forced
        cols = ["u", "v"]
        pd.testing.assert_frame_equal(_sorted(a, cols), _sorted(b, cols))
        pd.testing.assert_frame_equal(_sorted(a, cols), _sorted(c, cols))
        pd.testing.assert_frame_equal(_sorted(a, cols), _sorted(d, cols))

    def test_triangle_counts_auto_gate_forced(self):
        from tldr_ray.graph import triangle_counts

        pairs = synth_edges(seed=5)
        t_a, pv_a = triangle_counts(edge_ds(pairs))  # auto -> broadcast
        t_f, pv_f = triangle_counts(edge_ds(pairs),
                                    broadcast_limit_rows=0)  # auto -> join
        assert t_a == t_f
        a = _sorted(pv_a.to_pandas(), ["vertex"])
        b = _sorted(pv_f.to_pandas(), ["vertex"])
        pd.testing.assert_frame_equal(a, b)

    def test_reciprocity_join_path(self):
        from tldr_ray.queries import reciprocity_hashgraph

        a = reciprocity_hashgraph(SF).to_pandas()
        b = reciprocity_hashgraph(SF, broadcast_limit_rows=0).to_pandas()
        pd.testing.assert_frame_equal(a, b)


@pytest.mark.usefixtures("ray_session")
def test_ego_subgraph_paths_equal():
    """Broadcast ball membership == double semi-join past the gate."""
    from tldr_ray.queries import ego_subgraph_hashgraph

    sf = "/root/testdata/sf0.001"
    a = (ego_subgraph_hashgraph(sf).to_pandas()
         .sort_values(["u", "w"]).reset_index(drop=True))
    b = (ego_subgraph_hashgraph(sf, _broadcast_budget=0).to_pandas()
         .sort_values(["u", "w"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)
    assert len(a) > 0


@pytest.mark.usefixtures("ray_session")
def test_hyperball_estimates_match_exact_balls():
    """HyperBall t-hop ball estimates track exact BFS ball sizes on a
    small random graph (b=6 -> linear-counting regime for small
    balls; loose per-vertex band, tight mean)."""
    import ray.data as rd

    from tldr_ray.graph.hyperball import hyperball

    rng = np.random.default_rng(31)
    n = 300
    src = np.arange(n, dtype=np.int64)
    # ring + two random chords per vertex: connected, diameter ~ log n
    edges = [(int(i), int((i + 1) % n)) for i in range(n)]
    for i in range(n):
        edges.append((int(i), int(rng.integers(0, n))))
        edges.append((int(i), int(rng.integers(0, n))))
    edges = [(a, b) for a, b in edges if a != b]
    t = pa.table({"src": pa.array([a for a, _ in edges], pa.int64()),
                  "dst": pa.array([b for _, b in edges], pa.int64())})
    T = 3
    out = hyperball(rd.from_arrow(t).repartition(5), t=T, b=6,
                    num_parts=8)
    # exact balls by numpy BFS over the symmetrized adjacency
    adj = [set() for _ in range(n)]
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    exact = np.zeros(n)
    for v in range(n):
        ball = {v}
        frontier = {v}
        for _ in range(T):
            nxt = set()
            for u in frontier:
                nxt |= adj[u]
            frontier = nxt - ball
            ball |= nxt
        exact[v] = len(ball)
    est = out.set_index("vertex")["ball_est"].loc[
        np.arange(n)].to_numpy()
    rel = np.abs(est - exact) / exact
    assert rel.mean() < 0.12, rel.mean()
    assert (rel < 0.40).all(), rel.max()
    # monotone in t: 1-hop estimates are <= 3-hop estimates (on avg)
    out1 = hyperball(rd.from_arrow(t).repartition(5), t=1, b=6,
                     num_parts=8)
    assert (out1["ball_est"].mean() < out["ball_est"].mean())


@pytest.mark.usefixtures("ray_session")
def test_hyperball_series_and_effective_diameter():
    """Neighbourhood function is nondecreasing; a clique saturates at
    r=1 (effective diameter 1)."""
    import ray.data as rd

    from tldr_ray.graph.hyperball import effective_diameter, hyperball

    n = 40
    pairs = [(i, j) for i in range(n) for j in range(n) if i < j]
    t = pa.table({"src": pa.array([a for a, _ in pairs], pa.int64()),
                  "dst": pa.array([b for _, b in pairs], pa.int64())})
    frame, series = hyperball(rd.from_arrow(t), t=3, b=6, num_parts=4,
                              return_series=True)
    assert len(series) == 4
    assert all(series[i] <= series[i + 1] * 1.0001
               for i in range(len(series) - 1))
    assert effective_diameter(series) == 1
    # every vertex's 3-ball is the whole clique (estimates near n)
    assert (np.abs(frame["ball_est"] - n) / n < 0.35).all()


@pytest.mark.usefixtures("ray_session")
def test_link_prediction_jaccard_paths_equal():
    from tldr_ray.graph.triangles import link_prediction_jaccard

    ds = edge_ds(synth_edges())
    cols = ["u", "v", "n_common", "jaccard"]
    bc = _sorted(link_prediction_jaccard(ds).to_pandas(), ["u", "v"])
    jn = _sorted(link_prediction_jaccard(
        ds, broadcast_limit_rows=0).to_pandas(), ["u", "v"])
    pd.testing.assert_frame_equal(bc[cols], jn[cols])
    # spot-check one row against a dense numpy recomputation
    src = ds.to_pandas()
    und = {tuple(sorted(p)) for p in zip(src["src"], src["dst"])}
    import collections
    nbr = collections.defaultdict(set)
    for a, b in und:
        nbr[a].add(b)
        nbr[b].add(a)
    want = {}
    vs = sorted(nbr)
    for i, u in enumerate(vs):
        for v in vs[i + 1:]:
            if (u, v) in und:
                continue
            cn = len(nbr[u] & nbr[v])
            if cn:
                want[(u, v)] = (cn, cn / len(nbr[u] | nbr[v]))
    got = {(int(r.u), int(r.v)): (int(r.n_common), float(r.jaccard))
           for r in bc.itertuples()}
    assert got == want


@pytest.mark.usefixtures("ray_session")
def test_four_cycle_count_matches_bruteforce():
    import itertools
    from tldr_ray.graph.triangles import four_cycle_count

    pairs = synth_edges(n_v=14, n_e=60, seed=3)
    got = four_cycle_count(edge_ds(pairs))
    und = {tuple(sorted(p)) for p in pairs}
    import collections
    nbr = collections.defaultdict(set)
    for a, b in und:
        nbr[a].add(b)
        nbr[b].add(a)
    # brute force: count 4-vertex subsets hosting a 4-cycle, per cycle
    verts = sorted(nbr)
    brute = 0
    for quad in itertools.combinations(verts, 4):
        for perm in itertools.permutations(quad[1:]):
            cyc = (quad[0],) + perm
            if all(tuple(sorted((cyc[i], cyc[(i + 1) % 4]))) in und
                   for i in range(4)):
                brute += 1
    brute //= 2   # each cycle found twice (two directions) per start
    assert got == brute
    # a pure 4-cycle has exactly one; a triangle has none
    assert four_cycle_count(
        edge_ds([(0, 1), (1, 2), (2, 3), (3, 0)])) == 1
    assert four_cycle_count(edge_ds([(0, 1), (1, 2), (2, 0)])) == 0


@pytest.mark.usefixtures("ray_session")
def test_boruvka_equals_kruskal_both_gate_paths():
    from tldr_ray.graph.mst import boruvka_msf

    rng = np.random.RandomState(4)
    pairs = synth_edges(n_v=60, n_e=300, seed=4)
    import ray.data as rd
    w = {(min(a, b), max(a, b)): ((a * 31 + b * 17) % 97 + 1) / 100
         for a, b in pairs}
    src = np.array([p[0] for p in pairs], np.int64)
    dst = np.array([p[1] for p in pairs], np.int64)
    ww = np.array([w[(min(a, b), max(a, b))] for a, b in pairs])
    ds = rd.from_arrow(pa.table({"src": src, "dst": dst,
                                 "weight": ww}))

    # sequential Kruskal with the same (weight, a, b) total order
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    want = []
    for (a, b), wt in sorted(w.items(), key=lambda kv:
                             (kv[1], kv[0][0], kv[0][1])):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
            want.append((a, b, wt))
    want = sorted(want)

    for budget in (None, 0):    # broadcast vs join label path
        got = boruvka_msf(ds, broadcast_limit_rows=budget)
        assert list(map(tuple, got.to_numpy())) == want
