"""Densest-subgraph approximation by parallel peeling.

Charikar's greedy peeling removes the minimum-degree vertex one at a
time — inherently sequential. The parallel 2(1+eps) variant
(Bahmani-Kumar-Vassilvitskii, "Densest subgraph in streaming and
MapReduce", VLDB 2012) instead drops EVERY vertex whose degree is at
most (1+eps) times the current average degree each round, which
removes >= eps/(1+eps) of the vertices per round and therefore
terminates in O(log V) rounds of plain degree-count + filter — a
perfect fit for Ray Data (one groupby + two key joins per round).

We use eps = 1/2, i.e. the exact integer test  deg * V <= 3 * E
(avg degree = 2E/V, threshold 1.5x): at least a third of the
surviving vertices go each round, the approximation factor is 3, and
both sides of the oracle comparison stay in exact int64 arithmetic.
The densest prefix is chosen by cross-multiplied density comparison
(E_i * V_j vs E_j * V_i) — no float division anywhere.

Scale note: each round is one degree groupby over the surviving edge
set plus two size-gated key joins (stages.joins.auto_join) to drop
edges with a peeled endpoint; the edge set shrinks geometrically, so
the total work is O(E log V) with no O(V) driver state.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def densest_subgraph_peel(edges, max_rounds: int = 48):
    """Run the factor-3 parallel peeling over ``edges`` (columns
    src/dst, direction and duplicates ignored). Returns a list of
    per-round dicts ``{round, n_vertices, n_edges, is_best}`` where
    round r describes the subgraph BEFORE the r-th peel and exactly
    one row carries is_best=1 (earliest round on exact density ties).
    Vertices are counted only while they have >= 1 surviving edge.
    Raises if the graph fails to empty within ``max_rounds`` (the
    1/3-per-round guarantee makes that a caller bug)."""
    from ray.data.aggregate import Sum

    from tldr_ray.stages.joins import auto_join

    def undirect(batch: pa.Table) -> pa.Table:
        s = np.asarray(batch["src"], dtype=np.int64)
        d = np.asarray(batch["dst"], dtype=np.int64)
        keep = s != d
        s, d = s[keep], d[keep]
        lo, hi = np.minimum(s, d), np.maximum(s, d)
        u = np.unique(np.stack([lo, hi], axis=1), axis=0)
        return pa.table({"a": pa.array(u[:, 0]), "b": pa.array(u[:, 1])})

    cur = (edges.map_batches(undirect, batch_format="pyarrow")
           .groupby(["a", "b"]).count().select_columns(["a", "b"])
           .materialize())

    def partial_degrees(batch: pa.Table) -> pa.Table:
        v = np.concatenate([np.asarray(batch["a"], dtype=np.int64),
                            np.asarray(batch["b"], dtype=np.int64)])
        vu, cnt = np.unique(v, return_counts=True)
        return pa.table({"v": pa.array(vu),
                         "n": pa.array(cnt.astype(np.int64))})

    trace = []
    for r in range(max_rounds + 1):
        n_edges = cur.count()
        if n_edges == 0:
            break
        degs = (cur.map_batches(partial_degrees, batch_format="pyarrow")
                .groupby("v").aggregate(Sum("n", alias_name="deg"))
                .materialize())
        n_verts = degs.count()
        trace.append({"round": r, "n_vertices": n_verts,
                      "n_edges": n_edges})

        def survive(batch: pa.Table, _v=n_verts, _e=n_edges) -> pa.Table:
            deg = np.asarray(batch["deg"], dtype=np.int64)
            keep = deg * _v > 3 * _e
            return pa.table({"v": batch["v"].cast(pa.int64())
                             .filter(pa.array(keep))})

        keep = degs.map_batches(survive, batch_format="pyarrow") \
            .materialize()
        ka = keep.map_batches(
            lambda t: pa.table({"a": t["v"]}), batch_format="pyarrow")
        kb = keep.map_batches(
            lambda t: pa.table({"b": t["v"]}), batch_format="pyarrow")
        # keep may peel to 0 rows (final round) — its mapped key table
        # then has no sealed schema, so hand auto_join the layout.
        cur = auto_join(
            auto_join(cur, ka, on="a",
                      right_schema=pa.schema([("a", pa.int64())])),
            kb, on="b", right_schema=pa.schema([("b", pa.int64())]))
        cur = cur.map_batches(
            lambda t: pa.table({"a": t["a"].cast(pa.int64()),
                                "b": t["b"].cast(pa.int64())}),
            batch_format="pyarrow").repartition(4).materialize()
    else:
        raise RuntimeError(
            f"densest_subgraph_peel: not empty after {max_rounds} "
            "rounds — the factor-3 threshold guarantees geometric "
            "decay, so the edge input is malformed")

    # earliest round of exact-maximal density, by cross-multiplication
    best = 0
    for i in range(1, len(trace)):
        if (trace[i]["n_edges"] * trace[best]["n_vertices"]
                > trace[best]["n_edges"] * trace[i]["n_vertices"]):
            best = i
    for i, row in enumerate(trace):
        row["is_best"] = 1 if i == best else 0
    return trace
