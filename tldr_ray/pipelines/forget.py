"""Right-to-erasure ("forget these keys") compliance pipeline.

A deletion LIST (Dataset of key values) propagates through every
table that references the key: matching rows are dropped, survivors
are rewritten as partitioned parquet, and an exact audit report
(rows_before / rows_deleted / rows_after per table) comes back — the
tombstone-propagation shape every governed data platform runs, here
as a streaming Ray Data pipeline.

Scale discipline: the deletion list goes through the counted
broadcast gate (graph.gate budget): below it the sorted key array
ships once via ray.put and every batch masks with a searchsorted
probe; past it the drop is stages.joins.bucketed_anti_join — nothing
key-set-sized ever sits on the driver. Row counts come from parquet
FOOTERS (before: the input's own metadata path via ds.count();
after: the written files' metadata), so the audit costs no extra data
pass; ``verify=True`` adds one pruned read over the written output
asserting zero surviving matches — the compliance proof.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq


def _written_rows(out_dir: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(out_dir):
        for f in files:
            if f.endswith(".parquet"):
                total += pq.ParquetFile(
                    os.path.join(root, f)).metadata.num_rows
    return total


def forget_keys(tables, del_keys, out_dir: str,
                broadcast_limit_rows: int | None = None,
                verify: bool = True):
    """``tables``: list of (name, Dataset, key_col). ``del_keys``:
    Dataset with one int64 column of keys to erase. Writes survivors
    to ``out_dir/<name>/`` and returns a pa.Table audit report
    (table_name, rows_before, rows_deleted, rows_after), sorted by
    table_name. See module docstring for the scale plan."""
    import ray

    from tldr_ray.graph.gate import fits_broadcast
    from tldr_ray.stages.joins import bucketed_anti_join

    kcol = del_keys.schema().names[0]
    dk = del_keys.groupby(kcol).count().select_columns([kcol]) \
        .materialize()
    _, bcast = fits_broadcast(dk, broadcast_limit_rows)
    if bcast:
        keys = np.sort(dk.to_pandas()[kcol].to_numpy(np.int64))
        kref = ray.put(keys)

    names, before, after = [], [], []
    for name, ds, key in sorted(tables):
        n0 = ds.count()
        if bcast:
            def drop(batch: pa.Table, _key=key) -> pa.Table:
                ks = ray.get(kref)
                v = np.asarray(batch[_key], dtype=np.int64)
                if ks.size == 0:
                    return batch
                pos = np.minimum(np.searchsorted(ks, v), ks.size - 1)
                return batch.filter(pa.array(ks[pos] != v))

            kept = ds.map_batches(drop, batch_format="pyarrow")
        else:
            kept = bucketed_anti_join(
                ds, dk.map_batches(
                    lambda t, _key=key: t.rename_columns([_key]),
                    batch_format="pyarrow"), on=key)
        dest = os.path.join(out_dir, name)
        kept.write_parquet(dest)
        n1 = _written_rows(dest)
        if verify:
            import ray.data as rd
            chk = rd.read_parquet(dest).select_columns([key])
            if bcast:
                leak = chk.map_batches(
                    lambda t, _key=key: pa.table({"n": pa.array(
                        [int(np.isin(np.asarray(t[_key], np.int64),
                                     keys).sum())], pa.int64())}),
                    batch_format="pyarrow").sum("n") if n1 else 0
            else:
                from tldr_ray.stages.joins import bucketed_semi_join
                leak = bucketed_semi_join(
                    chk, dk.map_batches(
                        lambda t, _key=key: t.rename_columns([_key]),
                        batch_format="pyarrow"), on=key).count() \
                    if n1 else 0
            if leak:
                raise AssertionError(
                    f"forget_keys verification FAILED for {name!r}: "
                    f"{leak} deleted-key rows survive in {dest}")
        names.append(name)
        before.append(n0)
        after.append(n1)

    before = np.array(before, np.int64)
    after = np.array(after, np.int64)
    return pa.table({
        "table_name": pa.array(names, pa.string()),
        "rows_before": pa.array(before),
        "rows_deleted": pa.array(before - after),
        "rows_after": pa.array(after)})
