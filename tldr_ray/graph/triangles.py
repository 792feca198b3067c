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


def triangle_counts(edges, broadcast_degrees: bool = True):
    """edges: Dataset (src, dst[, weight]) interpreted as undirected.

    Returns (total:int, per_vertex Dataset(vertex:int64, triangles:int64)).

    Degrees are broadcast via ``ray.put`` (one int per vertex — fits
    comfortably in the object store for billions of vertices per the
    broadcast-small-side rule; for larger, flip ``broadcast_degrees``
    off to use a join — not yet needed at our scales).
    """
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

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

    deg_df = (
        und.map_batches(degree_rows, batch_format="pyarrow")
        .groupby("vertex").aggregate(Sum("n", alias_name="degree"))
        .to_pandas()
    )
    deg_map = dict(zip(deg_df["vertex"].tolist(), deg_df["degree"].tolist()))
    deg_ref = ray.put(deg_map)

    class Orient:
        def __init__(self):
            self.deg = ray.get(deg_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            a = np.asarray(batch["a"], dtype=np.int64)
            b = np.asarray(batch["b"], dtype=np.int64)
            da = np.fromiter((self.deg[x] for x in a), np.int64, len(a))
            db = np.fromiter((self.deg[x] for x in b), np.int64, len(b))
            # orient lower (degree, id) -> higher
            a_first = (da < db) | ((da == db) & (a < b))
            src = np.where(a_first, a, b)
            dst = np.where(a_first, b, a)
            return pa.table({"src": src, "dst": dst})

    oriented = und.map_batches(Orient, batch_format="pyarrow", concurrency=2)
    oriented = oriented.materialize()  # reused: wedge gen + closure probe

    def wedges(group: pd.DataFrame) -> pd.DataFrame:
        center = int(group["src"].iloc[0])
        nb = np.sort(group["dst"].to_numpy(np.int64))
        k = nb.size
        if k < 2:
            return pd.DataFrame({"a": [], "b": [], "center": []}).astype(np.int64)
        ii, jj = np.triu_indices(k, 1)
        return pd.DataFrame({"a": nb[ii], "b": nb[jj],
                             "center": np.full(ii.size, center, np.int64)})

    wedge_ds = oriented.groupby("src").map_groups(wedges, batch_format="pandas")

    def tag_edges(batch: pa.Table) -> pa.Table:
        a = np.asarray(batch["src"], dtype=np.int64)
        b = np.asarray(batch["dst"], dtype=np.int64)
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return pa.table({"a": lo, "b": hi,
                         "center": np.full(a.size, -1, np.int64)})

    def tag_wedges(batch: pa.Table) -> pa.Table:
        a = np.asarray(batch["a"], dtype=np.int64)
        b = np.asarray(batch["b"], dtype=np.int64)
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return pa.table({"a": lo, "b": hi,
                         "center": np.asarray(batch["center"], dtype=np.int64)})

    probe = oriented.map_batches(tag_edges, batch_format="pyarrow").union(
        wedge_ds.map_batches(tag_wedges, batch_format="pyarrow"))

    def close(group: pd.DataFrame) -> pd.DataFrame:
        centers = group["center"].to_numpy(np.int64)
        has_edge = (centers == -1).any()
        w = centers[centers >= 0]
        if not has_edge or w.size == 0:
            return pd.DataFrame({"vertex": pd.array([], dtype="int64"),
                                 "n": pd.array([], dtype="int64")})
        a = int(group["a"].iloc[0])
        b = int(group["b"].iloc[0])
        # each wedge center closes one triangle (a, b, center)
        verts = np.concatenate([w, np.full(w.size, a), np.full(w.size, b)])
        vu, cnt = np.unique(verts, return_counts=True)
        return pd.DataFrame({"vertex": vu, "n": cnt.astype(np.int64)})

    per_vertex = (
        probe.groupby(["a", "b"])
        .map_groups(close, batch_format="pandas")
        .groupby("vertex")
        .aggregate(Sum("n", alias_name="triangles"))
    )
    per_vertex = per_vertex.materialize()
    total = per_vertex.to_pandas()["triangles"].sum() // 3 \
        if per_vertex.count() else 0
    return int(total), per_vertex
