"""Incremental view maintenance for distributive aggregates.

The streaming-pipeline pattern that pairs with
``sources.read_new_files``: keep a persistent per-key aggregate state
(integer sums + counts) in versioned parquet, and fold each landing
delta into it with one grouped merge — never re-scanning history.

State layout:

    state_dir/
      v1/ *.parquet         (immutable version directories)
      v2/ *.parquet
      CURRENT               (single line: the committed version number)

Commit protocol: the merged state writes to the NEXT version directory
first, then CURRENT is swapped atomically (temp + rename). A crash
mid-write leaves an orphan v-dir that the next run overwrites; a crash
before the swap leaves CURRENT on the old version — readers never see
a half-written state. Mark landing files processed
(``sources.mark_processed``) only AFTER the swap, so a crash between
the two re-processes the delta instead of dropping it (aggregates must
be idempotent per file set — the manifest guarantees each file folds
exactly once).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa


def _current_version(state_dir: str) -> int:
    f = os.path.join(state_dir, "CURRENT")
    if not os.path.exists(f):
        return 0
    with open(f) as fh:
        return int(fh.read().strip() or 0)


def read_aggregate_state(state_dir: str):
    """The committed state as a Dataset, or None before the first
    commit."""
    import ray.data as rd

    v = _current_version(state_dir)
    if v == 0:
        return None
    return rd.read_parquet(os.path.join(state_dir, f"v{v}"))


def update_running_aggregate(state_dir: str, delta_ds, key_cols,
                             sum_cols) -> int:
    """Fold ``delta_ds``'s per-key integer sums (plus a row count
    ``n_rows``) into the persistent state; returns the new committed
    version. Sums must be integer columns (the repo's exact-cents
    rule) so merge order can never perturb the state."""
    from ray.data.aggregate import Sum

    key_cols = list(key_cols)
    sum_cols = list(sum_cols)

    def partial(batch: pa.Table) -> pa.Table:
        cols = {c: batch[c] for c in key_cols + sum_cols}
        for c in sum_cols:
            if not pa.types.is_integer(batch[c].type):
                raise TypeError(
                    f"sum col {c!r} must be integer (exact-cents rule)")
        cols["n_rows"] = pa.array(np.ones(len(batch), np.int64))
        return pa.table(cols)

    delta = delta_ds.select_columns(key_cols + sum_cols) \
        .map_batches(partial, batch_format="pyarrow")
    old = read_aggregate_state(state_dir)
    merged = delta if old is None else delta.union(old)
    aggs = [Sum(c, alias_name=c) for c in sum_cols]
    aggs.append(Sum("n_rows", alias_name="n_rows"))
    out = merged.groupby(key_cols[0] if len(key_cols) == 1
                         else key_cols).aggregate(*aggs)

    v = _current_version(state_dir) + 1
    vdir = os.path.join(state_dir, f"v{v}")
    os.makedirs(vdir, exist_ok=True)
    for name in os.listdir(vdir):          # orphan from a prior crash
        os.remove(os.path.join(vdir, name))
    out.write_parquet(vdir)
    tmp = os.path.join(state_dir, "CURRENT.tmp")
    with open(tmp, "w") as fh:
        fh.write(str(v))
    os.replace(tmp, os.path.join(state_dir, "CURRENT"))
    return v
