"""Distributed triangle counting (non-iterative — pure Ray Data).

Standard degree-oriented algorithm (SURVEY.md §7.1 step 6):

1. symmetrize + dedup the edge set; compute degrees
   (``groupby(src).count`` over the symmetric form);
2. orient each undirected edge from the lower (degree, id) endpoint to
   the higher — every vertex's oriented out-degree is O(sqrt(m)), which
   bounds wedge generation even at hub vertices (this IS the skew
   mitigation: orientation, not salting);
3. wedge generation: per oriented source, all pairs of its oriented
   neighbors (``groupby(src).map_groups``), keyed by the closing pair
   (a, b) with the wedge center carried along;
4. closure join: wedges union oriented edges, ``groupby([a, b])`` — a
   pair-group that contains the closing edge converts each of its
   wedges into one triangle credited to all three corners;
5. per-vertex totals: ``groupby(vertex).sum``.

Returns (total_triangles, per_vertex_dataset).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _orient(a, b, da, db):
    """Orient each undirected edge from the lower (degree, id) endpoint
    to the higher one."""
    a_first = (da < db) | ((da == db) & (a < b))
    return np.where(a_first, a, b), np.where(a_first, b, a)


def triangle_counts(edges, broadcast_degrees: bool | None = None,
                    broadcast_limit_rows: int | None = None):
    """edges: Dataset (src, dst[, weight]) interpreted as undirected.

    Returns (total:int, per_vertex Dataset(vertex:int64, triangles:int64)).

    ``broadcast_degrees=True`` ships the degree table to every orient
    task as a PACKED pair of numpy arrays (sorted vertex ids +
    degrees; 16 bytes/vertex, looked up via ``searchsorted``) — far
    denser than a Python dict, but still O(V) per worker.
    ``broadcast_degrees=False`` replaces the broadcast with two
    bucketed hash joins of the degree table onto the edge endpoints —
    two extra shuffles, no per-worker O(V) state. The default (None)
    is the COUNTED auto gate (graph.gate.fits_broadcast): broadcast
    while the degree table fits ``broadcast_limit_rows`` (2M), join
    past it. Both paths are pinned equal by tests/test_graph_engine.
    """
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    from tldr_ray.graph.gate import fits_broadcast

    def undirect(batch: pa.Table) -> pa.Table:
        s = np.asarray(batch["src"], dtype=np.int64)
        d = np.asarray(batch["dst"], dtype=np.int64)
        keep = s != d                     # drop self-loops
        s, d = s[keep], d[keep]
        lo, hi = np.minimum(s, d), np.maximum(s, d)
        u = np.unique(np.stack([lo, hi], axis=1), axis=0)  # per-batch dedup
        return pa.table({"a": u[:, 0], "b": u[:, 1]})

    und = edges.map_batches(undirect, batch_format="pyarrow")
    # global exact dedup of undirected pairs
    und = und.groupby(["a", "b"]).count().select_columns(["a", "b"])
    und = und.materialize()   # reused twice below (degrees + orientation)

    def degree_rows(batch: pa.Table) -> pa.Table:
        v = np.concatenate([np.asarray(batch["a"]), np.asarray(batch["b"])])
        vu, cnt = np.unique(v, return_counts=True)
        return pa.table({"vertex": vu, "n": cnt.astype(np.int64)})

    degrees = (
        und.map_batches(degree_rows, batch_format="pyarrow")
        .groupby("vertex").aggregate(Sum("n", alias_name="degree"))
        .materialize()
    )

    if broadcast_degrees is None:
        _, broadcast_degrees = fits_broadcast(degrees,
                                              broadcast_limit_rows)
    if broadcast_degrees:
        deg_df = degrees.to_pandas()
        order = np.argsort(deg_df["vertex"].to_numpy())
        deg_ref = ray.put((deg_df["vertex"].to_numpy(np.int64)[order],
                           deg_df["degree"].to_numpy(np.int64)[order]))

        class Orient:
            def __init__(self):
                self.vids, self.degs = ray.get(deg_ref)

            def __call__(self, batch: pa.Table) -> pa.Table:
                a = np.asarray(batch["a"], dtype=np.int64)
                b = np.asarray(batch["b"], dtype=np.int64)
                da = self.degs[np.searchsorted(self.vids, a)]
                db = self.degs[np.searchsorted(self.vids, b)]
                src, dst = _orient(a, b, da, db)
                return pa.table({"src": src, "dst": dst})

        oriented = und.map_batches(Orient, batch_format="pyarrow",
                                   concurrency=2)
    else:
        from tldr_ray.stages.joins import bucketed_hash_join

        def rename_deg(col: str):
            def fn(batch: pa.Table) -> pa.Table:
                return batch.rename_columns([col, f"deg_{col}"])
            return fn

        with_da = bucketed_hash_join(
            und, degrees.map_batches(rename_deg("a"), batch_format="pyarrow"),
            on="a")
        with_db = bucketed_hash_join(
            with_da,
            degrees.map_batches(rename_deg("b"), batch_format="pyarrow"),
            on="b")

        def orient_joined(batch: pa.Table) -> pa.Table:
            a = np.asarray(batch["a"], dtype=np.int64)
            b = np.asarray(batch["b"], dtype=np.int64)
            da = np.asarray(batch["deg_a"], dtype=np.int64)
            db = np.asarray(batch["deg_b"], dtype=np.int64)
            src, dst = _orient(a, b, da, db)
            return pa.table({"src": src, "dst": dst})

        oriented = with_db.map_batches(orient_joined, batch_format="pyarrow")
    oriented = oriented.materialize()  # reused: wedge gen + closure probe

    # wedge generation and closure both shuffle on COARSE partitions of
    # their key (per-vertex / per-pair micro-groups would pay ~ms of
    # map_groups invocation overhead each; a partition task sweeps all
    # its keys with one sort + segment reductions)
    from tldr_ray.graph.partition import vhash

    NP = np.uint64(64)

    def wedge_part(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["src", "dst"])
        src = g["src"].to_numpy(np.int64)
        dst = g["dst"].to_numpy(np.int64)
        new = np.concatenate([[True], src[1:] != src[:-1]])
        starts = np.flatnonzero(new)
        sizes = np.diff(np.concatenate([starts, [len(g)]]))
        ia, ib = [], []
        for st, k in zip(starts.tolist(), sizes.tolist()):
            if k < 2:
                continue
            ii, jj = np.triu_indices(k, 1)
            ia.append(ii + st)
            ib.append(jj + st)
        if not ia:
            return pd.DataFrame({"a": pd.array([], dtype="int64"),
                                 "b": pd.array([], dtype="int64"),
                                 "center": pd.array([], dtype="int64")})
        ia = np.concatenate(ia)
        ib = np.concatenate(ib)
        return pd.DataFrame({"a": dst[ia], "b": dst[ib], "center": src[ia]})

    wedge_ds = (
        oriented.map_batches(
            lambda t: t.append_column(
                "part", pa.array(
                    (vhash(np.asarray(t["src"], dtype=np.int64)) % NP)
                    .astype(np.int32))),
            batch_format="pyarrow")
        .groupby("part")
        .map_groups(wedge_part, batch_format="pandas")
    )

    def tag_edges(batch: pa.Table) -> pa.Table:
        a = np.asarray(batch["src"], dtype=np.int64)
        b = np.asarray(batch["dst"], dtype=np.int64)
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        part = (vhash(lo * np.int64(1_000_003) + hi) % NP).astype(np.int32)
        return pa.table({"a": lo, "b": hi,
                         "center": np.full(a.size, -1, np.int64),
                         "part": pa.array(part)})

    def tag_wedges(batch: pa.Table) -> pa.Table:
        a = np.asarray(batch["a"], dtype=np.int64)
        b = np.asarray(batch["b"], dtype=np.int64)
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        part = (vhash(lo * np.int64(1_000_003) + hi) % NP).astype(np.int32)
        return pa.table({"a": lo, "b": hi,
                         "center": np.asarray(batch["center"],
                                              dtype=np.int64),
                         "part": pa.array(part)})

    probe = oriented.map_batches(tag_edges, batch_format="pyarrow").union(
        wedge_ds.map_batches(tag_wedges, batch_format="pyarrow"))

    def close_part(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["a", "b", "center"])  # -1 edge rows first
        a = g["a"].to_numpy(np.int64)
        b = g["b"].to_numpy(np.int64)
        c = g["center"].to_numpy(np.int64)
        new = np.concatenate([[True], (a[1:] != a[:-1]) | (b[1:] != b[:-1])])
        seg_of = np.cumsum(new) - 1
        starts = np.flatnonzero(new)
        # a pair-segment closes its wedges iff it contains the edge row
        # (center == -1 sorts first within the segment)
        seg_has_edge = c[starts] == -1
        is_wedge = c >= 0
        closed = is_wedge & seg_has_edge[seg_of]
        if not closed.any():
            return pd.DataFrame({"vertex": pd.array([], dtype="int64"),
                                 "n": pd.array([], dtype="int64")})
        verts = np.concatenate([c[closed], a[closed], b[closed]])
        vu, cnt = np.unique(verts, return_counts=True)
        return pd.DataFrame({"vertex": vu, "n": cnt.astype(np.int64)})

    per_vertex = (
        probe.groupby("part")
        .map_groups(close_part, batch_format="pandas")
        .groupby("vertex")
        .aggregate(Sum("n", alias_name="triangles"))
    )
    per_vertex = per_vertex.materialize()
    # scalar total via a Dataset aggregate — no O(V) driver pull
    s = per_vertex.sum("triangles") if per_vertex.count() else 0
    return int((s or 0) // 3), per_vertex


def common_neighbors(edges, max_degree: int | None = None):
    """Link-prediction scores: for every NON-adjacent vertex pair at
    distance 2, the number of common neighbors (the classic
    common-neighbors predictor; jaccard/adamic-adar variants divide by
    degree terms downstream).

    Same coarse-partition discipline as ``triangle_counts``: wedges are
    generated per CENTER partition (one sort + segment pair expansion
    per task, counts pre-combined with np.unique before leaving the
    task), then pair partitions sum counts and drop pairs that carry an
    edge marker row — two coarse shuffles total, nothing on the driver.

    ``max_degree`` optionally skips centers above a degree cap (the
    hub-skew clamp: a degree-d center emits d^2/2 wedges; real graphs
    cap hubs for this predictor). None = exact.

    Returns Dataset (u:int64, v:int64, n_common:int64), u < v, sorted
    by nothing — callers top-k with a deterministic total order.
    """
    import pandas as pd
    from tldr_ray.graph.partition import vhash

    NP = np.uint64(64)

    def undirect(batch: pa.Table) -> pa.Table:
        s = np.asarray(batch["src"], dtype=np.int64)
        d = np.asarray(batch["dst"], dtype=np.int64)
        keep = s != d
        s, d = s[keep], d[keep]
        lo, hi = np.minimum(s, d), np.maximum(s, d)
        u = np.unique(np.stack([lo, hi], axis=1), axis=0)
        return pa.table({"a": u[:, 0], "b": u[:, 1]})

    und = edges.map_batches(undirect, batch_format="pyarrow") \
        .groupby(["a", "b"]).count().select_columns(["a", "b"]) \
        .materialize()

    def sym(batch: pa.Table) -> pa.Table:
        a = np.asarray(batch["a"], dtype=np.int64)
        b = np.asarray(batch["b"], dtype=np.int64)
        src = np.concatenate([a, b])
        dst = np.concatenate([b, a])
        return pa.table({
            "src": src, "dst": dst,
            "part": pa.array((vhash(src) % NP).astype(np.int32))})

    def wedge_part(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["src", "dst"])
        src = g["src"].to_numpy(np.int64)
        dst = g["dst"].to_numpy(np.int64)
        new = np.concatenate([[True], src[1:] != src[:-1]])
        starts = np.flatnonzero(new)
        sizes = np.diff(np.concatenate([starts, [len(g)]]))
        ia, ib = [], []
        for st, k in zip(starts.tolist(), sizes.tolist()):
            if k < 2 or (max_degree is not None and k > max_degree):
                continue
            ii, jj = np.triu_indices(k, 1)
            ia.append(ii + st)
            ib.append(jj + st)
        if not ia:
            return pd.DataFrame({"u": pd.array([], dtype="int64"),
                                 "v": pd.array([], dtype="int64"),
                                 "n": pd.array([], dtype="int64")})
        ia, ib = np.concatenate(ia), np.concatenate(ib)
        # pre-combine: one row per distinct pair per partition
        pairs, cnt = np.unique(
            np.stack([dst[ia], dst[ib]], axis=1), axis=0,
            return_counts=True)
        return pd.DataFrame({"u": pairs[:, 0], "v": pairs[:, 1],
                             "n": cnt.astype(np.int64)})

    wedges = und.map_batches(sym, batch_format="pyarrow") \
        .groupby("part").map_groups(wedge_part, batch_format="pandas")

    def tag_pairs(batch: pa.Table) -> pa.Table:
        u = np.asarray(batch["u"], dtype=np.int64)
        v = np.asarray(batch["v"], dtype=np.int64)
        part = (vhash(u * np.int64(1_000_003) + v) % NP).astype(np.int32)
        return pa.table({"u": batch["u"], "v": batch["v"],
                         "n": batch["n"], "part": pa.array(part)})

    def tag_edges(batch: pa.Table) -> pa.Table:
        u = np.asarray(batch["a"], dtype=np.int64)
        v = np.asarray(batch["b"], dtype=np.int64)
        part = (vhash(u * np.int64(1_000_003) + v) % NP).astype(np.int32)
        return pa.table({"u": pa.array(u), "v": pa.array(v),
                         "n": pa.array(np.full(u.size, -1, np.int64)),
                         "part": pa.array(part)})

    probe = wedges.map_batches(tag_pairs, batch_format="pyarrow").union(
        und.map_batches(tag_edges, batch_format="pyarrow"))

    def sum_part(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["u", "v", "n"])   # edge rows (-1) first
        u = g["u"].to_numpy(np.int64)
        v = g["v"].to_numpy(np.int64)
        n = g["n"].to_numpy(np.int64)
        new = np.concatenate([[True], (u[1:] != u[:-1]) | (v[1:] != v[:-1])])
        seg_of = np.cumsum(new) - 1
        starts = np.flatnonzero(new)
        seg_is_edge = n[starts] == -1
        keep_seg = ~seg_is_edge
        tot = np.zeros(starts.size, np.int64)
        np.add.at(tot, seg_of, np.maximum(n, 0))
        m = keep_seg & (tot > 0)
        if not m.any():
            return pd.DataFrame({"u": pd.array([], dtype="int64"),
                                 "v": pd.array([], dtype="int64"),
                                 "n_common": pd.array([], dtype="int64")})
        return pd.DataFrame({"u": u[starts][m], "v": v[starts][m],
                             "n_common": tot[m]})

    return probe.groupby("part").map_groups(sum_part,
                                            batch_format="pandas")


def degree_assortativity(edges, broadcast_limit_rows: int | None = None):
    """Degree assortativity coefficient (Pearson correlation of
    endpoint degrees over the SYMMETRIC directed edge set — Newman
    2002, public formula) computed from exact integer moment sums:
    M, S1 = sum(du), S2 = sum(du^2), S11 = sum(du*dv) over both
    directions of every undirected edge. The coefficient is ONE IEEE
    division of two exactly-computed integers
    ((M*S11 - S1^2) / (M*S2 - S1^2), driver-side Python bigints so the
    products can't overflow), so it hash-matches a SQL mirror. The
    int64 partial sums bound: sum(du^2) <= 2E * max_deg^2 — beyond
    ~2^63 of that, move partials to float128 or split the sum.

    Degrees broadcast as packed sorted arrays (the triangle_counts
    idiom) while the COUNTED degree table fits ``broadcast_limit_rows``
    (graph.gate, 2M default); past the gate they arrive via two
    bucketed hash joins onto the edge endpoints instead — no O(V)
    state anywhere. Both paths bit-equal (tests/test_graph_gates.py).

    Returns (m_edges, s1, s2, s11, assortativity float)."""
    import ray
    from ray.data.aggregate import Sum

    from tldr_ray.graph.gate import fits_broadcast

    def undirect(batch: pa.Table) -> pa.Table:
        s = np.asarray(batch["src"], dtype=np.int64)
        d = np.asarray(batch["dst"], dtype=np.int64)
        keep = s != d
        s, d = s[keep], d[keep]
        lo, hi = np.minimum(s, d), np.maximum(s, d)
        u = np.unique(np.stack([lo, hi], axis=1), axis=0)
        return pa.table({"a": u[:, 0], "b": u[:, 1]})

    und = edges.map_batches(undirect, batch_format="pyarrow") \
        .groupby(["a", "b"]).count().select_columns(["a", "b"]) \
        .materialize()

    def degree_rows(batch: pa.Table) -> pa.Table:
        v = np.concatenate([np.asarray(batch["a"]), np.asarray(batch["b"])])
        vu, cnt = np.unique(v, return_counts=True)
        return pa.table({"vertex": pa.array(vu),
                         "n": pa.array(cnt.astype(np.int64))})

    deg_ds = und.map_batches(degree_rows, batch_format="pyarrow") \
        .groupby("vertex").aggregate(Sum("n", alias_name="deg")) \
        .materialize()
    _, bcast = fits_broadcast(deg_ds, broadcast_limit_rows)

    def _moments_tbl(n, du, dv):
        return pa.table({
            "m": pa.array([2 * n], pa.int64()),
            "s1": pa.array([int((du + dv).sum())], pa.int64()),
            "s2": pa.array([int((du * du + dv * dv).sum())], pa.int64()),
            "s11": pa.array([int(2 * (du * dv).sum())], pa.int64())})

    if bcast:
        deg = deg_ds.to_pandas()
        verts = deg["vertex"].to_numpy(np.int64)
        ds_ = deg["deg"].to_numpy(np.int64)
        order = np.argsort(verts)
        dref = ray.put((verts[order], ds_[order]))

        def moments(batch: pa.Table) -> pa.Table:
            vs, dg = ray.get(dref)
            du = dg[np.searchsorted(
                vs, np.asarray(batch["a"], np.int64))]
            dv = dg[np.searchsorted(
                vs, np.asarray(batch["b"], np.int64))]
            return _moments_tbl(len(batch), du, dv)

        src = und.map_batches(moments, batch_format="pyarrow")
    else:
        from tldr_ray.stages.joins import bucketed_hash_join

        def rename_deg(col: str):
            def fn(batch: pa.Table) -> pa.Table:
                return batch.rename_columns([col, f"deg_{col}"])
            return fn

        with_da = bucketed_hash_join(
            und, deg_ds.map_batches(rename_deg("a"),
                                    batch_format="pyarrow"), on="a")
        with_db = bucketed_hash_join(
            with_da, deg_ds.map_batches(rename_deg("b"),
                                        batch_format="pyarrow"),
            on="b")

        def moments_joined(batch: pa.Table) -> pa.Table:
            du = np.asarray(batch["deg_a"], np.int64)
            dv = np.asarray(batch["deg_b"], np.int64)
            return _moments_tbl(len(batch), du, dv)

        src = with_db.map_batches(moments_joined,
                                  batch_format="pyarrow")

    agg = src.aggregate(
        Sum("m", alias_name="m"), Sum("s1", alias_name="s1"),
        Sum("s2", alias_name="s2"), Sum("s11", alias_name="s11"))
    m, s1, s2, s11 = (int(agg["m"]), int(agg["s1"]),
                      int(agg["s2"]), int(agg["s11"]))
    num, den = m * s11 - s1 * s1, m * s2 - s1 * s1
    r = float(num) / float(den) if den else float("nan")
    return m, s1, s2, s11, r


def edge_support(und, broadcast_degrees: bool | None = None,
                 broadcast_limit_rows: int | None = None):
    """Per-edge triangle support of an undirected DISTINCT edge set
    ``und`` (Dataset (a, b) with a < b): for every edge, how many
    triangles contain it. Same plan as ``triangle_counts`` (degree
    orientation -> coarse wedge sweep -> pair-partition closure probe)
    but each CLOSED wedge emits its three edges, so the grouped sum is
    keyed on edges, not vertices. Edges in no triangle are absent from
    the output (support 0) — callers that need zeros outer-join back.

    ``broadcast_degrees`` as in ``triangle_counts``: None (default) is
    the COUNTED auto gate — packed-array broadcast while the degree
    table fits ``broadcast_limit_rows``, two bucketed degree joins
    past it (no O(V) state). Paths pinned equal in tests.
    """
    import ray
    from ray.data.aggregate import Sum

    from tldr_ray.graph.gate import fits_broadcast
    from tldr_ray.graph.partition import vhash

    def degree_rows(batch: pa.Table) -> pa.Table:
        v = np.concatenate([np.asarray(batch["a"]),
                            np.asarray(batch["b"])])
        vu, cnt = np.unique(v, return_counts=True)
        return pa.table({"vertex": vu, "n": cnt.astype(np.int64)})

    degrees = (und.map_batches(degree_rows, batch_format="pyarrow")
               .groupby("vertex").aggregate(Sum("n", alias_name="degree"))
               .materialize())
    if broadcast_degrees is None:
        _, broadcast_degrees = fits_broadcast(degrees,
                                              broadcast_limit_rows)

    if broadcast_degrees:
        deg_df = degrees.to_pandas()
        order = np.argsort(deg_df["vertex"].to_numpy())
        deg_ref = ray.put((deg_df["vertex"].to_numpy(np.int64)[order],
                           deg_df["degree"].to_numpy(np.int64)[order]))

        class Orient:
            def __init__(self):
                self.vids, self.degs = ray.get(deg_ref)

            def __call__(self, batch: pa.Table) -> pa.Table:
                a = np.asarray(batch["a"], dtype=np.int64)
                b = np.asarray(batch["b"], dtype=np.int64)
                da = self.degs[np.searchsorted(self.vids, a)]
                db = self.degs[np.searchsorted(self.vids, b)]
                src, dst = _orient(a, b, da, db)
                return pa.table({"src": src, "dst": dst})

        oriented = und.map_batches(Orient, batch_format="pyarrow",
                                   concurrency=2).materialize()
    else:
        from tldr_ray.stages.joins import bucketed_hash_join

        def rename_deg(col: str):
            def fn(batch: pa.Table) -> pa.Table:
                return batch.rename_columns([col, f"deg_{col}"])
            return fn

        with_da = bucketed_hash_join(
            und, degrees.map_batches(rename_deg("a"),
                                     batch_format="pyarrow"), on="a")
        with_db = bucketed_hash_join(
            with_da, degrees.map_batches(rename_deg("b"),
                                         batch_format="pyarrow"),
            on="b")

        def orient_joined(batch: pa.Table) -> pa.Table:
            a = np.asarray(batch["a"], dtype=np.int64)
            b = np.asarray(batch["b"], dtype=np.int64)
            da = np.asarray(batch["deg_a"], dtype=np.int64)
            db = np.asarray(batch["deg_b"], dtype=np.int64)
            src, dst = _orient(a, b, da, db)
            return pa.table({"src": src, "dst": dst})

        oriented = with_db.map_batches(orient_joined,
                                       batch_format="pyarrow") \
            .materialize()

    NP = np.uint64(64)

    def wedge_part(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["src", "dst"])
        src = g["src"].to_numpy(np.int64)
        dst = g["dst"].to_numpy(np.int64)
        new = np.concatenate([[True], src[1:] != src[:-1]])
        starts = np.flatnonzero(new)
        sizes = np.diff(np.concatenate([starts, [len(g)]]))
        ia, ib = [], []
        for st, k in zip(starts.tolist(), sizes.tolist()):
            if k < 2:
                continue
            ii, jj = np.triu_indices(k, 1)
            ia.append(ii + st)
            ib.append(jj + st)
        if not ia:
            return pd.DataFrame({"a": pd.array([], dtype="int64"),
                                 "b": pd.array([], dtype="int64"),
                                 "center": pd.array([], dtype="int64")})
        ia = np.concatenate(ia)
        ib = np.concatenate(ib)
        return pd.DataFrame({"a": dst[ia], "b": dst[ib],
                             "center": src[ia]})

    wedge_ds = (oriented.map_batches(
        lambda t: t.append_column(
            "part", pa.array((vhash(np.asarray(t["src"], dtype=np.int64))
                              % NP).astype(np.int32))),
        batch_format="pyarrow")
        .groupby("part").map_groups(wedge_part, batch_format="pandas"))

    def tag_edges(batch: pa.Table) -> pa.Table:
        a = np.asarray(batch["src"], dtype=np.int64)
        b = np.asarray(batch["dst"], dtype=np.int64)
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        part = (vhash(lo * np.int64(1_000_003) + hi) % NP).astype(np.int32)
        return pa.table({"a": lo, "b": hi,
                         "center": np.full(a.size, -1, np.int64),
                         "part": pa.array(part)})

    def tag_wedges(batch: pa.Table) -> pa.Table:
        a = np.asarray(batch["a"], dtype=np.int64)
        b = np.asarray(batch["b"], dtype=np.int64)
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        part = (vhash(lo * np.int64(1_000_003) + hi) % NP).astype(np.int32)
        return pa.table({"a": lo, "b": hi,
                         "center": np.asarray(batch["center"],
                                              dtype=np.int64),
                         "part": pa.array(part)})

    probe = oriented.map_batches(tag_edges, batch_format="pyarrow").union(
        wedge_ds.map_batches(tag_wedges, batch_format="pyarrow"))

    def close_part(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["a", "b", "center"])
        a = g["a"].to_numpy(np.int64)
        b = g["b"].to_numpy(np.int64)
        c = g["center"].to_numpy(np.int64)
        new = np.concatenate([[True],
                              (a[1:] != a[:-1]) | (b[1:] != b[:-1])])
        seg_of = np.cumsum(new) - 1
        starts = np.flatnonzero(new)
        seg_has_edge = c[starts] == -1
        is_wedge = c >= 0
        closed = is_wedge & seg_has_edge[seg_of]
        if not closed.any():
            return pd.DataFrame({"u": pd.array([], dtype="int64"),
                                 "v": pd.array([], dtype="int64"),
                                 "n": pd.array([], dtype="int64")})
        ca, cb, cc = a[closed], b[closed], c[closed]
        # the 3 edges of each closed triangle, normalized lo<hi
        e1u, e1v = ca, cb                                  # already lo<hi
        e2u, e2v = np.minimum(cc, ca), np.maximum(cc, ca)
        e3u, e3v = np.minimum(cc, cb), np.maximum(cc, cb)
        u = np.concatenate([e1u, e2u, e3u])
        v = np.concatenate([e1v, e2v, e3v])
        dfp = pd.DataFrame({"u": u, "v": v})  # pre-combine per partition
        out = dfp.groupby(["u", "v"], sort=False).size().reset_index()
        out.columns = ["u", "v", "n"]
        out["n"] = out["n"].astype(np.int64)
        return out

    return (probe.groupby("part")
            .map_groups(close_part, batch_format="pandas")
            .groupby(["u", "v"])
            .aggregate(Sum("n", alias_name="support")))


def _seq_truss_peel(a: np.ndarray, b: np.ndarray, k: int):
    """Sequential peel to fixpoint on (a < b) distinct edge arrays —
    the size-gated local finisher for ``k_truss`` (and its pytest
    oracle's definition). Returns (a, b) of the surviving edges."""
    E = set(zip(a.tolist(), b.tolist()))
    while True:
        adj: dict = {}
        for x, y in E:
            adj.setdefault(x, set()).add(y)
            adj.setdefault(y, set()).add(x)
        drop = {(x, y) for x, y in E
                if len(adj[x] & adj[y]) < k - 2}
        if not drop:
            break
        E -= drop
    if not E:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    arr = np.asarray(sorted(E), dtype=np.int64)
    return arr[:, 0], arr[:, 1]


def k_truss(edges, k: int, max_rounds: int = 30,
            local_limit: int = 2_000_000):
    """k-truss decomposition: iteratively delete every edge whose
    triangle support (within the surviving subgraph) is below k-2
    until fixpoint (or ``max_rounds``). Returns the surviving
    undirected distinct edge Dataset (u, v), u < v.

    Each peel round is one full edge-support sweep (``edge_support``)
    plus a vectorized filter — the standard distributed truss
    iteration; rounds are bounded and the edge set shrinks
    monotonically, so a fixed ``max_rounds`` unrolling in SQL is
    bit-equivalent once the engine has converged (extra rounds are
    no-ops on a fixpoint).

    Size gate (the resolve_clusters discipline): a peel round costs
    ~4 small all-to-alls of fixed latency, so once the COUNTED
    surviving edge set fits ``local_limit`` the remaining rounds run
    as one driver-local sequential peel — identical fixpoint, none of
    the per-round coordination. Pass ``local_limit=0`` to force the
    distributed path end to end (tests do)."""
    import ray.data as rd

    def undirect(batch: pa.Table) -> pa.Table:
        s = np.asarray(batch["src"], dtype=np.int64)
        d = np.asarray(batch["dst"], dtype=np.int64)
        keep = s != d
        s, d = s[keep], d[keep]
        lo, hi = np.minimum(s, d), np.maximum(s, d)
        u = np.unique(np.stack([lo, hi], axis=1), axis=0)
        return pa.table({"a": u[:, 0], "b": u[:, 1]})

    cur = (edges.map_batches(undirect, batch_format="pyarrow")
           .groupby(["a", "b"]).count().select_columns(["a", "b"])
           .materialize())
    if k <= 2:
        def rename(batch: pa.Table) -> pa.Table:
            return pa.table({"u": batch["a"].cast(pa.int64()),
                             "v": batch["b"].cast(pa.int64())})
        return cur.map_batches(rename, batch_format="pyarrow")
    n_cur = cur.count()
    thresh = k - 2
    for _ in range(max_rounds):
        if n_cur == 0:
            break
        if n_cur <= local_limit:
            df = cur.to_pandas()
            ua, ub = _seq_truss_peel(df["a"].to_numpy(np.int64),
                                     df["b"].to_numpy(np.int64), k)
            return rd.from_arrow(pa.table({
                "u": pa.array(ua), "v": pa.array(ub)}))
        sup = edge_support(cur)

        def keep(batch: pa.Table) -> pa.Table:
            m = np.asarray(batch["support"], dtype=np.int64) >= thresh
            return pa.table({
                "a": pa.array(np.asarray(batch["u"], np.int64)[m]),
                "b": pa.array(np.asarray(batch["v"], np.int64)[m])})

        nxt = sup.map_batches(keep, batch_format="pyarrow").materialize()
        n_nxt = nxt.count()
        if n_nxt == n_cur:
            cur = nxt
            break
        cur, n_cur = nxt, n_nxt

    if n_cur == 0:
        # all-empty map outputs lose their schema in Ray — seal one
        return rd.from_arrow(pa.table({"u": pa.array([], pa.int64()),
                                       "v": pa.array([], pa.int64())}))

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table({"u": batch["a"].cast(pa.int64()),
                         "v": batch["b"].cast(pa.int64())})

    return cur.map_batches(rename, batch_format="pyarrow")


def link_prediction_jaccard(edges, broadcast_limit_rows: int | None = None):
    """Jaccard link-prediction scores: for every NON-adjacent vertex
    pair at distance 2, ``|N(u) ∩ N(v)| / |N(u) ∪ N(v)|`` =
    ``cn / (deg_u + deg_v - cn)`` — the classic normalized variant of
    ``common_neighbors`` (which supplies the exact cn counts via the
    wedge sweep; this stage decorates them with degrees and performs
    ONE IEEE division of exact int64s, so the float hash-matches a SQL
    mirror).

    Degrees decorate through the counted graph gate (graph.gate):
    packed sorted-array broadcast while the degree table fits
    ``broadcast_limit_rows``; two bucketed hash joins past it — no
    O(V) driver state. Returns (u, v, n_common, jaccard), u < v.
    """
    import ray
    from ray.data.aggregate import Sum

    from tldr_ray.graph.gate import fits_broadcast

    pairs = common_neighbors(edges)

    def undirect(batch: pa.Table) -> pa.Table:
        s = np.asarray(batch["src"], dtype=np.int64)
        d = np.asarray(batch["dst"], dtype=np.int64)
        keep = s != d
        s, d = s[keep], d[keep]
        lo, hi = np.minimum(s, d), np.maximum(s, d)
        u = np.unique(np.stack([lo, hi], axis=1), axis=0)
        return pa.table({"a": u[:, 0], "b": u[:, 1]})

    und = edges.map_batches(undirect, batch_format="pyarrow") \
        .groupby(["a", "b"]).count().select_columns(["a", "b"])

    def degree_rows(batch: pa.Table) -> pa.Table:
        v = np.concatenate([np.asarray(batch["a"]), np.asarray(batch["b"])])
        vu, cnt = np.unique(v, return_counts=True)
        return pa.table({"vertex": pa.array(vu),
                         "n": pa.array(cnt.astype(np.int64))})

    deg_ds = und.map_batches(degree_rows, batch_format="pyarrow") \
        .groupby("vertex").aggregate(Sum("n", alias_name="deg")) \
        .materialize()
    _, bcast = fits_broadcast(deg_ds, broadcast_limit_rows)

    def _score_tbl(u, v, cn, du, dv):
        jac = cn.astype(np.float64) / (du + dv - cn).astype(np.float64)
        return pa.table({"u": pa.array(u), "v": pa.array(v),
                         "n_common": pa.array(cn),
                         "jaccard": pa.array(jac)})

    if bcast:
        deg = deg_ds.to_pandas()
        verts = deg["vertex"].to_numpy(np.int64)
        dg = deg["deg"].to_numpy(np.int64)
        order = np.argsort(verts)
        dref = ray.put((verts[order], dg[order]))

        def score(batch: pa.Table) -> pa.Table:
            vs, d = ray.get(dref)
            u = np.asarray(batch["u"], np.int64)
            v = np.asarray(batch["v"], np.int64)
            cn = np.asarray(batch["n_common"], np.int64)
            return _score_tbl(u, v, cn, d[np.searchsorted(vs, u)],
                              d[np.searchsorted(vs, v)])

        return pairs.map_batches(score, batch_format="pyarrow")

    from tldr_ray.stages.joins import bucketed_hash_join

    def rename_deg(key: str, out: str):
        def fn(batch: pa.Table) -> pa.Table:
            return batch.rename_columns([key, out])
        return fn

    j = bucketed_hash_join(
        pairs, deg_ds.map_batches(rename_deg("u", "deg_u"),
                                  batch_format="pyarrow"), on="u")
    j = bucketed_hash_join(
        j, deg_ds.map_batches(rename_deg("v", "deg_v"),
                              batch_format="pyarrow"), on="v")

    def score_joined(batch: pa.Table) -> pa.Table:
        return _score_tbl(np.asarray(batch["u"], np.int64),
                          np.asarray(batch["v"], np.int64),
                          np.asarray(batch["n_common"], np.int64),
                          np.asarray(batch["deg_u"], np.int64),
                          np.asarray(batch["deg_v"], np.int64))

    return j.map_batches(score_joined, batch_format="pyarrow")


def four_cycle_count(edges, max_degree: int | None = None):
    """Global 4-CYCLE (rectangle) count — the bipartite-motif metric
    next to the triangle count: #C4 = (1/2) * sum over unordered
    vertex pairs of C(cn(u,v), 2), where cn counts common neighbors
    over ALL pairs (adjacent included — every rectangle is counted
    once at each of its two diagonals, so the sum is provably even
    and the halving is exact integer arithmetic).

    Same two-coarse-shuffle plan as ``common_neighbors`` minus the
    edge-marker stage: wedges per CENTER partition (sort + segment
    pair expansion, counts pre-combined before leaving the task),
    pair partitions SUM the per-center counts, and each pair task
    emits one C(n,2) partial — only O(P) scalars reach the driver.
    ``max_degree`` is the hub clamp (a degree-d center emits d^2/2
    wedges); None = exact. Returns the exact int count."""
    import pandas as pd

    from ray.data.aggregate import Sum

    from tldr_ray.graph.partition import vhash

    NP = np.uint64(64)

    def undirect(batch: pa.Table) -> pa.Table:
        s = np.asarray(batch["src"], dtype=np.int64)
        d = np.asarray(batch["dst"], dtype=np.int64)
        keep = s != d
        s, d = s[keep], d[keep]
        lo, hi = np.minimum(s, d), np.maximum(s, d)
        u = np.unique(np.stack([lo, hi], axis=1), axis=0)
        return pa.table({"a": u[:, 0], "b": u[:, 1]})

    und = edges.map_batches(undirect, batch_format="pyarrow") \
        .groupby(["a", "b"]).count().select_columns(["a", "b"])

    def sym(batch: pa.Table) -> pa.Table:
        a = np.asarray(batch["a"], dtype=np.int64)
        b = np.asarray(batch["b"], dtype=np.int64)
        src = np.concatenate([a, b])
        dst = np.concatenate([b, a])
        return pa.table({
            "src": src, "dst": dst,
            "part": pa.array((vhash(src) % NP).astype(np.int32))})

    def wedge_part(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["src", "dst"])
        src = g["src"].to_numpy(np.int64)
        dst = g["dst"].to_numpy(np.int64)
        new = np.concatenate([[True], src[1:] != src[:-1]])
        starts = np.flatnonzero(new)
        sizes = np.diff(np.concatenate([starts, [len(g)]]))
        ia, ib = [], []
        for st, k in zip(starts.tolist(), sizes.tolist()):
            if k < 2 or (max_degree is not None and k > max_degree):
                continue
            ii, jj = np.triu_indices(k, 1)
            ia.append(ii + st)
            ib.append(jj + st)
        if not ia:
            return pd.DataFrame({"u": pd.array([], dtype="int64"),
                                 "v": pd.array([], dtype="int64"),
                                 "n": pd.array([], dtype="int64")})
        ia, ib = np.concatenate(ia), np.concatenate(ib)
        pairs, cnt = np.unique(
            np.stack([dst[ia], dst[ib]], axis=1), axis=0,
            return_counts=True)
        return pd.DataFrame({"u": pairs[:, 0], "v": pairs[:, 1],
                             "n": cnt.astype(np.int64)})

    wedges = und.map_batches(sym, batch_format="pyarrow") \
        .groupby("part").map_groups(wedge_part, batch_format="pandas")

    def tag_pairs(batch: pa.Table) -> pa.Table:
        u = np.asarray(batch["u"], dtype=np.int64)
        v = np.asarray(batch["v"], dtype=np.int64)
        part = (vhash(u * np.int64(1_000_003) + v) % NP).astype(np.int32)
        return pa.table({"u": batch["u"], "v": batch["v"],
                         "n": batch["n"], "part": pa.array(part)})

    def choose2_partial(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["u", "v"])
        u = g["u"].to_numpy(np.int64)
        v = g["v"].to_numpy(np.int64)
        n = g["n"].to_numpy(np.int64)
        new = np.concatenate([[True],
                              (u[1:] != u[:-1]) | (v[1:] != v[:-1])])
        seg = np.cumsum(new) - 1
        tot = np.zeros(int(seg[-1]) + 1 if len(g) else 0, np.int64)
        np.add.at(tot, seg, n)
        return pd.DataFrame({"c2": pd.array(
            [int((tot * (tot - 1) // 2).sum())], dtype="int64")})

    parts = wedges.map_batches(tag_pairs, batch_format="pyarrow") \
        .groupby("part").map_groups(choose2_partial,
                                    batch_format="pandas")
    total = parts.aggregate(Sum("c2", alias_name="c2"))["c2"]
    return int(total or 0) // 2
