"""Deterministic random-walk sampling over a distributed edge list.

node2vec/DeepWalk-style corpus generation, but with a HASH-driven
"random" choice so the walks are reproducible across runs, block
layouts and engines: at step t a walk sitting on vertex v moves to

    neighbors_sorted(v)[ splitmix64(v * K + t) % deg(v) ]

(K = the 64-bit golden-ratio constant; splitmix64 = the repo's shared
``_mix64`` finalizer, mirrored bit-for-bit by the chained SQL CTEs in
queries._walks_oracle_sql). Every walk from the same vertex follows
the same path — walks differentiate by start vertex, which is what a
sampling corpus needs, and what makes a DuckDB hash oracle possible.

Distribution shape: the ranked adjacency (one row per (vertex,
neighbor-rank)) is built with ONE coarse-partition sweep; each step is
ONE bucketed hash join of the walk frontier against it on a composite
(vertex, rank) key — walk_len shuffles total, the inherent cost of
distributed walks. The degree table broadcasts as packed sorted arrays
(the triangle_counts idiom; flip to a join when O(V) outgrows RAM).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_WALK_K = 0x9E3779B97F4A7C15


def random_walks(edges, walk_len: int = 4, num_partitions: int = 64):
    """edges: Dataset (src, dst[, weight]) interpreted as undirected.
    Returns Dataset (start:int64, step:int64, vertex:int64) — one walk
    per vertex, rows for steps 0..walk_len."""
    import ray
    from ray.data.aggregate import Sum

    from tldr_ray.graph.partition import vhash
    from tldr_ray.stages.dedup import _mix64
    from tldr_ray.stages.joins import bucketed_hash_join

    NP = np.uint64(num_partitions)

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
            "v": src, "nbr": dst,
            "part": pa.array((vhash(src) % NP).astype(np.int32))})

    symd = und.map_batches(sym, batch_format="pyarrow")

    def degree_rows(batch: pa.Table) -> pa.Table:
        vu, cnt = np.unique(np.asarray(batch["v"]), return_counts=True)
        return pa.table({"vertex": pa.array(vu),
                         "n": pa.array(cnt.astype(np.int64))})

    deg = symd.map_batches(degree_rows, batch_format="pyarrow") \
        .groupby("vertex").aggregate(Sum("n", alias_name="deg")) \
        .to_pandas()
    verts = deg["vertex"].to_numpy(np.int64)
    degs = deg["deg"].to_numpy(np.int64)
    order = np.argsort(verts)
    verts, degs = verts[order], degs[order]
    stride = int(degs.max()) + 1 if degs.size else 1
    dref = ray.put((verts, degs))

    def rank_part(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["v", "nbr"])
        v = g["v"].to_numpy(np.int64)
        nbr = g["nbr"].to_numpy(np.int64)
        new = np.concatenate([[True], v[1:] != v[:-1]])
        seg_start = np.flatnonzero(new)
        idx = np.arange(len(g), dtype=np.int64) \
            - np.repeat(seg_start, np.diff(
                np.concatenate([seg_start, [len(g)]])))
        return pd.DataFrame({"akey": v * stride + idx, "nbr": nbr})

    adj = symd.groupby("part").map_groups(rank_part,
                                          batch_format="pandas")

    def key_frontier(step: int):
        def fn(batch: pa.Table) -> pa.Table:
            vs, dg = ray.get(dref)
            cur = np.asarray(batch["vertex"], dtype=np.int64)
            h = _mix64(cur.astype(np.uint64) * np.uint64(_WALK_K)
                       + np.uint64(step))
            d = dg[np.searchsorted(vs, cur)]
            idx = (h % d.astype(np.uint64)).astype(np.int64)
            return pa.table({"start": batch["start"],
                             "akey": pa.array(cur * stride + idx)})
        return fn

    def start_rows(batch: pa.Table) -> pa.Table:
        v = np.unique(np.asarray(batch["v"], dtype=np.int64))
        return pa.table({"start": pa.array(v), "vertex": pa.array(v)})

    frontier = symd.map_batches(start_rows, batch_format="pyarrow") \
        .groupby(["start", "vertex"]).count() \
        .select_columns(["start", "vertex"])

    def stamp(step: int):
        def fn(batch: pa.Table) -> pa.Table:
            return pa.table({
                "start": batch["start"].cast(pa.int64()),
                "step": pa.array(np.full(len(batch), step, np.int64)),
                "vertex": batch["vertex"].cast(pa.int64())})
        return fn

    out = frontier.map_batches(stamp(0), batch_format="pyarrow")
    for t in range(1, walk_len + 1):
        keyed = frontier.map_batches(key_frontier(t),
                                     batch_format="pyarrow")
        joined = bucketed_hash_join(keyed, adj, on="akey")
        frontier = joined.map_batches(
            lambda b: pa.table({"start": b["start"].cast(pa.int64()),
                                "vertex": b["nbr"].cast(pa.int64())}),
            batch_format="pyarrow")
        out = out.union(frontier.map_batches(stamp(t),
                                             batch_format="pyarrow"))
    return out
