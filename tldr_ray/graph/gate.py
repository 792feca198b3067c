"""Counted broadcast gates for graph operators.

Every graph op that ships an O(V) degree map or O(E) edge-key set to
workers via ``ray.put`` must first COUNT the table: while it fits
``budget_rows`` the broadcast is the fastest plan (one plasma object,
zero extra shuffles, searchsorted probes); past the gate the op flips
to its join / tagged-union co-shuffle formulation, which never holds
more than one block of the table in any single process. This is the
engine-wide discipline ``stages.joins.auto_join`` established for
relational joins (stages/joins.py:960), applied to the graph layer:
node2vec's edge-composite membership set, reciprocity's reverse-key
set, the random-walk / assortativity / triangle degree maps.

The default budget (2M rows ~= 32 MB packed) matches auto_join's: a
single worker comfortably holds it, and at 10^9-vertex / 10^11-edge
scale every one of these ops takes its join path instead of OOMing
the driver.
"""

from __future__ import annotations

DEFAULT_BROADCAST_BUDGET_ROWS = 2_000_000


def fits_broadcast(ds, budget_rows: int | None = None):
    """COUNT ``ds`` and return ``(n_rows, fits)``.

    ``ds`` should already be materialized (the count is then a
    metadata lookup); counting an unmaterialized Dataset would execute
    its pipeline once just for the gate. ``budget_rows=0`` forces the
    join path — the forced-past-gate equality tests use it.
    """
    if budget_rows is None:
        budget_rows = DEFAULT_BROADCAST_BUDGET_ROWS
    n = ds.count()
    return n, n <= budget_rows
