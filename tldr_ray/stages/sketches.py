"""Mergeable cardinality sketch (HyperLogLog-style registers).

The register array is the distributed object: every batch folds its
values into a tiny (2^b)-entry max-rank array, partial registers merge
by element-wise max (associative + commutative, so task retries and
arbitrary merge trees are safe), and the final array is a few KB no
matter how many trillion rows streamed through — the canonical
100-TB-scale distinct-count shape.

Determinism: value hashing is the shared portable FNV-1a over the
value's string form (``hashing.fnv1a_batch``), bucket = top ``b`` hash
bits, rank = position of the lowest set bit of the remaining word
(Flajolet's PCSA convention — expressible EXACTLY in integer SQL as
``bit_count((w & -w) - 1) + 1``, so DuckDB can mirror the whole
register array bit-for-bit; see queries.hll_registers_events).
The float cardinality estimate is deliberately a separate step
(``hll_estimate``): float summation order is not oracle-stable, so the
registers are the hash-checked artifact and the estimate is pinned by
a relative-error pytest oracle instead.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _partial_registers(values, b: int) -> np.ndarray:
    """(2^b,) int64 max-rank register array for one batch of values.

    FNV-1a alone leaves the TOP bits of short decimal ids badly
    dispersed (consecutive ids differ by ~prime, far below bit 54), so
    the splitmix64 finalizer avalanches the hash before the bucket/rank
    split — mirrored step-for-step in the SQL oracle."""
    from tldr_ray.hashing import fnv1a_batch
    from tldr_ray.stages.dedup import _mix64

    if not (pa.types.is_string(values.type)
            or pa.types.is_large_string(values.type)):
        values = pc.cast(values, pa.string())
    h = _mix64(fnv1a_batch(values))
    m = 1 << b
    wbits = 64 - b
    bucket = (h >> np.uint64(wbits)).astype(np.int64)
    w = h & np.uint64((1 << wbits) - 1)
    low = w & (~w + np.uint64(1))          # lowest set bit (or 0)
    # log2 of an exact power of two is exact in float64 (wbits <= 63)
    rank = np.where(
        w == 0, wbits + 1,
        np.log2(np.maximum(low, np.uint64(1)).astype(np.float64))
        .astype(np.int64) + 1)
    reg = np.zeros(m, dtype=np.int64)
    np.maximum.at(reg, bucket, rank)
    return reg


def hll_registers(ds, col: str, b: int = 10):
    """Dataset of the full (2^b)-row register table: (bucket int32,
    max_rank int64), every bucket present (empty buckets rank 0).

    One pass over the data; partial register ROWS (only non-zero
    entries leave a task) funnel through a per-batch max combine and a
    single coalesce partition — the moving data is O(2^b) per upstream
    block, never O(rows)."""
    m = 1 << b

    def partial(batch: pa.Table) -> pa.Table:
        reg = _partial_registers(batch[col], b)
        nz = np.flatnonzero(reg)
        return pa.table({"bucket": pa.array(nz.astype(np.int32)),
                         "max_rank": pa.array(reg[nz])})

    def combine(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby("bucket", sort=False)["max_rank"].max()
        return pd.DataFrame({"bucket": g.index.to_numpy(np.int32),
                             "max_rank": g.to_numpy(np.int64)})

    def finalize(batch: pd.DataFrame) -> pd.DataFrame:
        reg = np.zeros(m, dtype=np.int64)
        if len(batch):
            np.maximum.at(reg, batch["bucket"].to_numpy(np.int64),
                          batch["max_rank"].to_numpy(np.int64))
        return pd.DataFrame({"bucket": np.arange(m, dtype=np.int32),
                             "max_rank": reg})

    return (
        ds.select_columns([col])
        .map_batches(partial, batch_format="pyarrow")
        .map_batches(combine, batch_format="pandas", batch_size=32768)
        .repartition(1)
        .map_batches(finalize, batch_format="pandas", batch_size=None)
    )


def hll_estimate(registers: pd.DataFrame, b: int = 10) -> dict:
    """Cardinality estimate from a register table (standard HLL
    harmonic mean + small/large-range corrections). Driver-side float
    math over the 2^b-entry array."""
    m = 1 << b
    rank = np.zeros(m, dtype=np.int64)
    rank[registers["bucket"].to_numpy(np.int64)] = \
        registers["max_rank"].to_numpy(np.int64)
    alpha = 0.7213 / (1 + 1.079 / m)
    raw = alpha * m * m / np.sum(np.exp2(-rank.astype(np.float64)))
    zeros = int((rank == 0).sum())
    if raw <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)          # linear counting
    else:
        est = raw
    return {"estimate": float(est), "raw": float(raw),
            "empty_buckets": zeros, "b": b}


def approx_distinct(ds, col: str, b: int = 10) -> dict:
    """One-call convenience: registers pass + driver estimate."""
    regs = hll_registers(ds, col, b).to_pandas()
    return hll_estimate(regs, b)
