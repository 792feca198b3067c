"""Join strategies (SURVEY.md §2.4 + ray_guide join patterns).

- ``broadcast_lookup``: small side rides the object store once
  (``ray.put``), every task maps the key column through it — no shuffle.
  Used by queries.revenue_by_nation.
- ``bucketed_hash_join``: both sides large — add ``bucket = vhash(key) %
  B`` to each side, tag provenance, union, ``groupby(bucket)``, and join
  matching buckets pairwise inside ``map_groups`` with a pandas merge.
  One shuffle per side, no driver materialization. B sizes bucket
  working sets; skewed keys split across batches only inflate a single
  bucket, so pick B >> #workers for hot-key smoothing.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from tldr_ray.graph.partition import vhash


def broadcast_lookup(ds, mapping: dict, key_col: str, out_col: str,
                     default=None):
    """Map ``key_col`` through a broadcast dict into ``out_col``."""
    import ray

    ref = ray.put(mapping)

    class Lookup:
        def __init__(self):
            self.map = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            vals = [self.map.get(k, default)
                    for k in batch[key_col].to_pylist()]
            return batch.append_column(out_col, pa.array(vals))

    return ds.map_batches(Lookup, batch_format="pyarrow", concurrency=2)


def _hash_any(values) -> np.ndarray:
    """uint64 per value: vhash for integer columns, the shared
    vectorized FNV-1a for string columns (no per-row Python hashing)."""
    from tldr_ray.hashing import fnv1a_batch

    if isinstance(values, (pa.Array, pa.ChunkedArray)):
        if pa.types.is_integer(values.type):
            return vhash(np.asarray(values, dtype=np.int64))
        return fnv1a_batch(values)
    arr = np.asarray(values)
    if arr.dtype.kind in "iu":
        return vhash(arr.astype(np.int64))
    return fnv1a_batch(pa.array([str(v) for v in values], pa.string()))


def _int_cols(schema) -> list[str]:
    import pyarrow.types as pat

    # Ray Schema.types may hold non-Arrow entries (e.g. numpy dtypes from
    # pandas-born blocks); only Arrow DataTypes are inspected
    return [n for n, t in zip(schema.names, schema.types)
            if isinstance(t, pa.DataType) and pat.is_integer(t)]


def _restore_ints(df: pd.DataFrame, int_cols: list[str]) -> pd.DataFrame:
    """Undo the int -> float64 promotion the null-filled union schema
    causes (a float64 join key hashes/merges differently than the int64
    it started as)."""
    for c in int_cols:
        if c in df.columns and df[c].dtype.kind == "f":
            df[c] = df[c].astype(np.int64)
    return df


def bucketed_hash_join(left, right, on: str, num_buckets: int = 64,
                       how: str = "inner", suffixes=("_l", "_r")):
    """Partitioned hash join of two Datasets on one key column.

    The two sides are aligned to a common superset schema (missing
    columns null-filled) so they can be unioned into one shuffle; each
    bucket group splits back into sides by provenance and merges with
    pandas. Column lists are captured up front — no all-null guessing.
    """
    lcols = [c for c in left.schema().names]
    rcols = [c for c in right.schema().names]
    lints = _int_cols(left.schema())
    rints = _int_cols(right.schema())
    shared_extra = (set(lcols) & set(rcols)) - {on}
    all_cols = list(dict.fromkeys(lcols + rcols))

    def tag(side: str, have: list[str]):
        def fn(batch: pa.Table) -> pa.Table:
            n = len(batch)
            cols = {}
            for c in all_cols:
                cols[c] = batch[c] if c in have else pa.nulls(n)
            cols["__bucket"] = pa.array(
                (_hash_any(batch[on]) %
                 np.uint64(num_buckets)).astype(np.int32))
            cols["__side"] = pa.array([side] * n)
            return pa.table(cols)
        return fn

    both = left.map_batches(tag("l", lcols), batch_format="pyarrow").union(
        right.map_batches(tag("r", rcols), batch_format="pyarrow"))

    def join_bucket(group: pd.DataFrame) -> pd.DataFrame:
        l = _restore_ints(group[group["__side"] == "l"][lcols].copy(), lints)
        r = _restore_ints(group[group["__side"] == "r"][rcols].copy(), rints)
        # columns in shared_extra come out with the pandas suffixes
        return l.merge(r, on=on, how=how, suffixes=suffixes)

    return both.groupby("__bucket").map_groups(join_bucket,
                                               batch_format="pandas")


def bucketed_anti_join(left, right, on: str, num_buckets: int = 64):
    """Left rows whose key does NOT appear in ``right`` — one shuffle per
    side, matching buckets filtered with a vectorized ``isin``; nothing
    materializes on the driver (the distributed replacement for the
    "broadcast a Python id-set" anti-join pattern)."""
    lcols = list(left.schema().names)
    lints = _int_cols(left.schema())

    def tag(side: str, cols: list[str]):
        def fn(batch: pa.Table) -> pa.Table:
            n = len(batch)
            out = {}
            for c in lcols:
                out[c] = batch[c] if c in cols else pa.nulls(n)
            out["__bucket"] = pa.array(
                (_hash_any(batch[on]) %
                 np.uint64(num_buckets)).astype(np.int32))
            out["__side"] = pa.array([side] * n)
            return pa.table(out)
        return fn

    both = left.map_batches(tag("l", lcols), batch_format="pyarrow").union(
        right.select_columns([on]).map_batches(tag("r", [on]),
                                               batch_format="pyarrow"))

    def filter_bucket(group: pd.DataFrame) -> pd.DataFrame:
        l = _restore_ints(group[group["__side"] == "l"][lcols].copy(), lints)
        rkeys = group.loc[group["__side"] == "r", on]
        if rkeys.empty:
            return l
        return l[~l[on].isin(set(rkeys))]

    return both.groupby("__bucket").map_groups(filter_bucket,
                                               batch_format="pandas")
