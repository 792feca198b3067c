"""Distributed degree-style centrality (reference O17 at graph scale).

The reference ranks vertices by their maximum incident kept-edge weight
(sort kept edges desc, first occurrence per src — tldr.go:194-220).
Distributed form: one ``groupby(src).max(weight)`` shuffle + a global
sort with the engine's deterministic tie-break (weight desc, vertex
asc; the reference's unstable-sort tie order is only reproduced by the
per-conversation kernel where golden parity demands it — quirk Q9)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def centrality_ranks(edges, threshold: float = 0.001):
    """edges Dataset (src, dst, weight) -> Dataset (vertex, max_weight,
    rank) ordered by the deterministic tie-break."""
    from ray.data.aggregate import Max

    def keep(batch: pa.Table) -> pa.Table:
        w = np.asarray(batch["weight"], dtype=np.float64)
        return batch.filter(pa.array(w > threshold))

    best = (
        edges.map_batches(keep, batch_format="pyarrow")
        .groupby("src")
        .aggregate(Max("weight", alias_name="max_weight"))
    )
    ranked = best.sort(["max_weight", "src"], descending=[True, False])

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table({"vertex": batch["src"],
                         "max_weight": batch["max_weight"]})

    return ranked.map_batches(rename, batch_format="pyarrow")
