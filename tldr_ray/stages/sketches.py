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


def grouped_hll_registers(ds, key_col: str, col: str, b: int = 6):
    """Per-group HLL register tables: (key, bucket int32, max_rank
    int64), dense 2^b rows per OBSERVED group. The grouped
    distinct-count shape ("distinct users per event type") at
    petabyte scale: per-batch partials are O(groups x 2^b) cells, the
    single groupby max-merge moves nothing O(rows). Same bit-exact
    hash/bucket/rank math as ``hll_registers`` (SQL-mirrorable)."""
    m = 1 << b

    def partial(batch: pa.Table) -> pa.Table:
        keys, kidx = np.unique(np.asarray(batch[key_col]),
                               return_inverse=True)
        values = batch[col]
        if not (pa.types.is_string(values.type)
                or pa.types.is_large_string(values.type)):
            values = pc.cast(values, pa.string())
        from tldr_ray.hashing import fnv1a_batch
        from tldr_ray.stages.dedup import _mix64

        h = _mix64(fnv1a_batch(values))
        wbits = 64 - b
        bucket = (h >> np.uint64(wbits)).astype(np.int64)
        w = h & np.uint64((1 << wbits) - 1)
        low = w & (~w + np.uint64(1))
        rank = np.where(
            w == 0, wbits + 1,
            np.log2(np.maximum(low, np.uint64(1)).astype(np.float64))
            .astype(np.int64) + 1)
        reg = np.zeros(len(keys) * m, dtype=np.int64)
        np.maximum.at(reg, kidx * m + bucket, rank)
        nz = np.flatnonzero(reg)
        return pa.table({key_col: pa.array(keys[nz // m]),
                         "bucket": pa.array((nz % m).astype(np.int32)),
                         "max_rank": pa.array(reg[nz])})

    def combine(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby([key_col, "bucket"], sort=False)["max_rank"] \
                 .max()
        out = g.index.to_frame(index=False)
        out["max_rank"] = g.to_numpy(np.int64)
        out["bucket"] = out["bucket"].astype(np.int32)
        return out

    def finalize(batch: pd.DataFrame) -> pd.DataFrame:
        merged = combine(batch) if len(batch) else batch
        groups = np.sort(merged[key_col].unique()) if len(merged) else []
        gpos = {g: i for i, g in enumerate(groups)}
        reg = np.zeros(len(groups) * m, dtype=np.int64)
        if len(merged):
            gi = merged[key_col].map(gpos).to_numpy(np.int64)
            np.maximum.at(reg,
                          gi * m + merged["bucket"].to_numpy(np.int64),
                          merged["max_rank"].to_numpy(np.int64))
        return pd.DataFrame({
            key_col: np.repeat(np.asarray(groups, dtype=object), m),
            "bucket": np.tile(np.arange(m, dtype=np.int32),
                              len(groups)),
            "max_rank": reg})

    return (
        ds.select_columns([key_col, col])
        .map_batches(partial, batch_format="pyarrow")
        .map_batches(combine, batch_format="pandas", batch_size=32768)
        .repartition(1)
        .map_batches(finalize, batch_format="pandas", batch_size=None)
    )


def grouped_hll_estimates(registers: pd.DataFrame, key_col: str,
                          b: int = 6) -> pd.DataFrame:
    """Per-group cardinality estimates from a dense grouped register
    table (driver-side float math over O(groups*2^b) rows)."""
    rows = []
    for g, sub in registers.groupby(key_col, sort=True):
        est = hll_estimate(sub, b)
        rows.append({key_col: g, "estimate": est["estimate"],
                     "empty_buckets": est["empty_buckets"]})
    return pd.DataFrame(rows)


# -- Count-Min sketch ---------------------------------------------------
#
# Same distributed shape as HLL but with + instead of max: a (d x w)
# counter matrix where row i buckets a value by
# splitmix64(fnv1a(str(value)) XOR salt_i) % w. Counts are EXACT integer
# sums (associative, order-free), so the register table is bit-for-bit
# mirrorable in DuckDB (queries.countmin_registers_events) and merge is
# retry-safe. Point estimate = min over the d rows (never underestimates).

CM_SALTS = (0, 0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9)


def _cm_buckets(values, d: int, w: int) -> np.ndarray:
    """(d, n) int64 bucket ids for one batch of values."""
    from tldr_ray.hashing import fnv1a_batch
    from tldr_ray.stages.dedup import _mix64

    if not (pa.types.is_string(values.type)
            or pa.types.is_large_string(values.type)):
        values = pc.cast(values, pa.string())
    h = fnv1a_batch(values)
    return np.stack([
        (_mix64(h ^ np.uint64(CM_SALTS[i])) % np.uint64(w)).astype(np.int64)
        for i in range(d)])


def countmin_registers(ds, col: str, d: int = 4, w: int = 256):
    """Dataset of the full d*w-row counter table: (row int32,
    bucket int32, count int64), zero rows present. Only non-zero
    partial cells leave a task; a per-batch sum combine plus one
    coalesce partition finishes — O(d*w) moving data per upstream
    block, never O(rows)."""
    if d > len(CM_SALTS):
        raise ValueError(f"d <= {len(CM_SALTS)} (fixed salt schedule)")

    def partial(batch: pa.Table) -> pa.Table:
        b = _cm_buckets(batch[col], d, w)
        flat = np.bincount(
            (np.repeat(np.arange(d, dtype=np.int64), b.shape[1]) * w
             + b.reshape(-1)), minlength=d * w)
        nz = np.flatnonzero(flat)
        return pa.table({"row": pa.array((nz // w).astype(np.int32)),
                         "bucket": pa.array((nz % w).astype(np.int32)),
                         "count": pa.array(flat[nz])})

    def combine(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby(["row", "bucket"], sort=False)["count"].sum()
        idx = g.index.to_frame(index=False)
        return pd.DataFrame({"row": idx["row"].to_numpy(np.int32),
                             "bucket": idx["bucket"].to_numpy(np.int32),
                             "count": g.to_numpy(np.int64)})

    def finalize(batch: pd.DataFrame) -> pd.DataFrame:
        reg = np.zeros(d * w, dtype=np.int64)
        if len(batch):
            np.add.at(reg, batch["row"].to_numpy(np.int64) * w
                      + batch["bucket"].to_numpy(np.int64),
                      batch["count"].to_numpy(np.int64))
        return pd.DataFrame({
            "row": np.repeat(np.arange(d, dtype=np.int32), w),
            "bucket": np.tile(np.arange(w, dtype=np.int32), d),
            "count": reg})

    return (
        ds.select_columns([col])
        .map_batches(partial, batch_format="pyarrow")
        .map_batches(combine, batch_format="pandas", batch_size=32768)
        .repartition(1)
        .map_batches(finalize, batch_format="pandas", batch_size=None)
    )


def cm_estimate(registers: pd.DataFrame, values, d: int = 4,
                w: int = 256) -> np.ndarray:
    """Point-estimate counts for ``values`` (pyarrow array or list) from
    a register table: min over the d rows. Never underestimates the
    true count; overestimates by at most eps*N with prob 1-delta
    (eps = e/w, delta = e^-d)."""
    mat = np.zeros((d, w), dtype=np.int64)
    mat[registers["row"].to_numpy(np.int64),
        registers["bucket"].to_numpy(np.int64)] = \
        registers["count"].to_numpy(np.int64)
    vals = values if isinstance(values, pa.Array) else pa.array(values)
    b = _cm_buckets(vals, d, w)
    return np.min(mat[np.arange(d)[:, None], b], axis=0)


def heavy_hitters(ds, col: str, k: int = 10, d: int = 4, w: int = 1024,
                  candidates_per_batch: int = 64) -> pd.DataFrame:
    """Approximate top-k frequent values without a full groupby: one
    streaming pass builds the Count-Min registers WHILE each batch
    nominates its local top ``candidates_per_batch`` values (a true
    heavy hitter is a local heavy hitter in enough batches to surface);
    the small candidate union is then point-estimated against the
    sketch and the top k kept. Returns (value, est_count) sorted by
    est_count desc, value asc — est_count >= true count always.

    The candidate stream is O(candidates_per_batch) rows per block and
    the registers are O(d*w): nothing here is O(distinct values), which
    is the point at 100 TB (an exact groupby top-k is the oracle path
    at test scale — see queries.top_users_by_value)."""

    def nominate(batch: pa.Table) -> pa.Table:
        vals = batch[col]
        if not (pa.types.is_string(vals.type)
                or pa.types.is_large_string(vals.type)):
            vals = pc.cast(vals, pa.string())
        arr = vals.to_pandas()
        top = arr.value_counts().head(candidates_per_batch)
        return pa.table({"value": pa.array(top.index.astype(str)),
                         "n": pa.array(top.to_numpy(np.int64))})

    cand = (
        ds.select_columns([col])
        .map_batches(nominate, batch_format="pyarrow")
        .groupby("value").sum("n")
        .to_pandas()
    )
    regs = countmin_registers(ds, col, d, w).to_pandas()
    est = cm_estimate(regs, cand["value"].astype(str).tolist(), d, w)
    out = pd.DataFrame({"value": cand["value"].astype(str),
                        "est_count": est})
    out = out.sort_values(["est_count", "value"],
                          ascending=[False, True]).head(k)
    return out.reset_index(drop=True)


# -- Bloom filter --------------------------------------------------------
#
# Mergeable membership sketch: k salted hash positions per value over an
# m-bit array; merge is elementwise OR (= max over {0,1} — associative,
# retry-safe), so the bit table follows the same partial -> max-combine
# -> densify funnel as the HLL registers and is bit-for-bit mirrorable
# in SQL. No false negatives ever; false-positive rate ~ (1-e^{-kn/m})^k.
# The headline use is the bloom-filtered join: broadcast the small
# side's bits once and drop non-matching big-side rows BEFORE the join
# shuffle (queries.bloom_filtered_revenue hash-checks the end result
# against the unfiltered join, which also proves no-false-negatives).


def bloom_bits(ds, col: str, m: int = 2048, k: int = 3):
    """Dataset of the dense m-row bit table: (bit int32, set int64
    0/1). Positions = splitmix64(fnv1a(str(v)) XOR salt_i) % m for the
    first k fixed Count-Min salts (shared schedule — shared SQL
    mirror)."""
    if k > len(CM_SALTS):
        raise ValueError(f"k <= {len(CM_SALTS)} (fixed salt schedule)")

    def partial(batch: pa.Table) -> pa.Table:
        pos = _cm_buckets(batch[col], k, m).reshape(-1)
        bits = np.unique(pos)
        return pa.table({"bit": pa.array(bits.astype(np.int32)),
                         "set": pa.array(np.ones(bits.size, np.int64))})

    def combine(batch: pd.DataFrame) -> pd.DataFrame:
        bits = np.unique(batch["bit"].to_numpy(np.int64))
        return pd.DataFrame({"bit": bits.astype(np.int32),
                             "set": np.ones(bits.size, np.int64)})

    def finalize(batch: pd.DataFrame) -> pd.DataFrame:
        arr = np.zeros(m, dtype=np.int64)
        if len(batch):
            arr[batch["bit"].to_numpy(np.int64)] = 1
        return pd.DataFrame({"bit": np.arange(m, dtype=np.int32),
                             "set": arr})

    return (
        ds.select_columns([col])
        .map_batches(partial, batch_format="pyarrow")
        .map_batches(combine, batch_format="pandas", batch_size=32768)
        .repartition(1)
        .map_batches(finalize, batch_format="pandas", batch_size=None)
    )


def bloom_maybe_contains(bit_array: np.ndarray, values, m: int,
                         k: int = 3) -> np.ndarray:
    """Vectorized membership probe against a dense 0/1 bit array:
    True = maybe present (fp possible), False = DEFINITELY absent."""
    vals = values if isinstance(values, pa.Array) else pa.array(values)
    pos = _cm_buckets(vals, k, m)
    return np.all(bit_array[pos] == 1, axis=0)


# -- Mergeable histogram ------------------------------------------------
#
# The approximate-quantile shape for 100 TB: a fixed-bin counter table
# (group, bin, count) where bin = clip(floor(((x-lo)*bins)/(hi-lo)),
# 0, bins-1). Counts are exact integer sums (order-free, retry-safe,
# mergeable by +), and the bin expression is plain IEEE double
# arithmetic mirrored op-for-op in DuckDB, so the register table is a
# hash-checked driver oracle (queries.value_histogram_events) even
# though the QUANTILES read off it are approximate. Complements
# stages.agg.grouped_quantiles (exact, but sorts every row inside a
# shuffle): the histogram never moves more than O(groups*bins) rows
# per upstream block, the canonical trade at petabyte scale.


def _hist_bins(values, lo: float, hi: float, bins: int) -> np.ndarray:
    """(n,) int64 bin ids for one batch (nulls must be dropped by the
    caller). Expression order is load-bearing: ((x - lo) * bins) /
    (hi - lo), floored then clipped — the SQL mirror repeats it
    verbatim so float rounding cannot diverge."""
    v = values.to_numpy(zero_copy_only=False).astype(np.float64)
    b = np.floor(((v - lo) * np.float64(bins)) / np.float64(hi - lo))
    return np.clip(b, 0, bins - 1).astype(np.int64)


def histogram_registers(ds, col: str, lo: float, hi: float,
                        bins: int = 64, by: str | None = None):
    """Dataset of the dense per-group histogram: (by?, bin int32,
    count int64), every bin present for every OBSERVED group, nulls
    dropped. Per-batch partial counts (only non-zero cells leave a
    task) -> sum combine -> one coalesce partition densifies."""

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.drop_null()
        if by is None:
            b = _hist_bins(batch[col], lo, hi, bins)
            flat = np.bincount(b, minlength=bins)
            nz = np.flatnonzero(flat)
            return pa.table({"bin": pa.array(nz.astype(np.int32)),
                             "count": pa.array(flat[nz])})
        b = _hist_bins(batch[col], lo, hi, bins)
        codes, groups = pd.factorize(batch[by].to_pandas(), sort=False)
        flat = np.bincount(codes * bins + b, minlength=len(groups) * bins)
        nz = np.flatnonzero(flat)
        return pa.table({by: pa.array(groups[nz // bins]),
                         "bin": pa.array((nz % bins).astype(np.int32)),
                         "count": pa.array(flat[nz])})

    keys = ["bin"] if by is None else [by, "bin"]

    def combine(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby(keys, sort=False)["count"].sum()
        out = g.index.to_frame(index=False)
        out["count"] = g.to_numpy(np.int64)
        out["bin"] = out["bin"].astype(np.int32)
        return out

    def finalize(batch: pd.DataFrame) -> pd.DataFrame:
        merged = combine(batch) if len(batch) else batch
        if by is None:
            reg = np.zeros(bins, dtype=np.int64)
            if len(merged):
                np.add.at(reg, merged["bin"].to_numpy(np.int64),
                          merged["count"].to_numpy(np.int64))
            return pd.DataFrame({"bin": np.arange(bins, dtype=np.int32),
                                 "count": reg})
        groups = np.sort(merged[by].unique()) if len(merged) else []
        gpos = {g: i for i, g in enumerate(groups)}
        reg = np.zeros(len(groups) * bins, dtype=np.int64)
        if len(merged):
            gi = merged[by].map(gpos).to_numpy(np.int64)
            np.add.at(reg, gi * bins + merged["bin"].to_numpy(np.int64),
                      merged["count"].to_numpy(np.int64))
        return pd.DataFrame({
            by: np.repeat(np.asarray(groups, dtype=object), bins),
            "bin": np.tile(np.arange(bins, dtype=np.int32), len(groups)),
            "count": reg})

    cols = [col] if by is None else [by, col]
    return (
        ds.select_columns(cols)
        .map_batches(partial, batch_format="pyarrow")
        .map_batches(combine, batch_format="pandas", batch_size=32768)
        .repartition(1)
        .map_batches(finalize, batch_format="pandas", batch_size=None)
    )


def approx_quantiles_from_histogram(registers: pd.DataFrame, lo: float,
                                    hi: float, bins: int,
                                    qs=(0.5, 0.9, 0.99),
                                    by: str | None = None) -> pd.DataFrame:
    """Linear-interpolated quantile estimates from a dense register
    table (driver-side float math over O(groups*bins) rows). Error is
    bounded by one bin width (hi-lo)/bins for any in-range data.
    Returns one row per group: (by?, p50, p90, ...)."""
    width = (hi - lo) / bins

    def _one(sub: pd.DataFrame) -> dict:
        c = np.zeros(bins, dtype=np.int64)
        c[sub["bin"].to_numpy(np.int64)] = sub["count"].to_numpy(np.int64)
        cum = np.cumsum(c)
        n = cum[-1]
        out = {}
        for q in qs:
            name = f"p{q * 100:g}".replace(".", "_")
            if n == 0:
                out[name] = float("nan")
                continue
            target = q * n
            b = int(np.searchsorted(cum, target, side="left"))
            before = cum[b - 1] if b else 0
            frac = (target - before) / c[b] if c[b] else 0.0
            out[name] = lo + (b + frac) * width
        return out

    if by is None:
        return pd.DataFrame([_one(registers)])
    rows = []
    for g, sub in registers.groupby(by, sort=True):
        rows.append({by: g, **_one(sub)})
    return pd.DataFrame(rows)


def _mg_compress(vals: np.ndarray, cnts: np.ndarray, k: int):
    """Misra-Gries reduction to <= k counters: subtract the (k+1)-th
    largest count from every counter and drop the non-positive — the
    counter-array form of MG's decrement-all step. Exact counts in,
    summaries whose deficit per counter is <= the subtracted amount."""
    if vals.size <= k:
        return vals, cnts
    d = np.partition(cnts, cnts.size - k - 1)[cnts.size - k - 1]
    keep = cnts > d
    return vals[keep], cnts[keep] - d


def misra_gries(ds, col: str, k: int = 64):
    """Mergeable Misra-Gries heavy-hitters summary (Agarwal 2012
    "Mergeable Summaries"): per-block exact value counts compress to
    <= k counters, ONE small groupby sums the per-block summaries
    (<= k rows per block move — never the column), and a final
    driver-side compression restores <= k counters. Deterministic
    guarantee regardless of block layout:
    ``true - n/(k+1) <= est <= true``, so every value with true
    frequency > n/(k+1) is PRESENT in the summary — the counter-based
    complement of the Count-Min ``heavy_hitters`` path (no hashing,
    no collision noise, underestimates instead of overestimates).
    Returns pd.DataFrame (value, est) sorted by est desc."""
    def partial(batch: pa.Table) -> pa.Table:
        tab = pa.table({"v": batch[col]})
        gp = tab.group_by("v").aggregate([("v", "count")])
        vals = np.asarray(gp["v"])
        cnts = np.asarray(gp["v_count"], dtype=np.int64)
        vals, cnts = _mg_compress(vals, cnts, k)
        return pa.table({"value": pa.array(vals),
                         "est": pa.array(cnts)})

    merged = (ds.select_columns([col])
              .map_batches(partial, batch_format="pyarrow")
              .groupby("value").sum("est").to_pandas())
    if not len(merged):
        # a perfectly flat stream can decrement EVERY per-block
        # counter away (or the input is empty); 0-row to_pandas drops
        # columns, so build the empty summary explicitly
        return pd.DataFrame({"value": [], "est": []})
    vals = merged["value"].to_numpy()
    cnts = merged["sum(est)"].to_numpy(np.int64)
    vals, cnts = _mg_compress(vals, cnts, k)
    order = np.lexsort((vals, -cnts))
    return pd.DataFrame({"value": vals[order],
                         "est": cnts[order].astype(np.int64)})


class KLLSketch:
    """Deterministic KLL-style mergeable quantile summary.

    Level-l compactors hold sorted buffers; a full compactor sorts,
    keeps alternating elements (deterministic EVEN offset — no RNG, so
    builds are reproducible; the classic randomized offset halves the
    constant but this repo trades that for bitwise repeatability), and
    promotes them to level l+1 where each element weighs 2^(l+1).
    Rank error is bounded by sum_l 2^l * (compactions at level l),
    giving the usual O(n / k) absolute rank error for capacity-k
    levels; the pytest pins observed error << n/k on adversarial
    sorted input. Mergeable: concatenate per-level buffers and
    re-compact — the bound composes additively, so per-block sketches
    combine into a corpus sketch without revisiting data."""

    def __init__(self, k: int = 256):
        self.k = int(k)
        self.levels: list[list] = [[]]
        self.n = 0

    def _cap(self, lvl: int) -> int:
        # geometrically shrinking capacities above level 0
        c = int(self.k * (2.0 / 3.0) ** (len(self.levels) - 1 - lvl))
        return max(c, 8)

    def _compact(self):
        for lvl in range(len(self.levels)):
            buf = self.levels[lvl]
            if len(buf) <= self._cap(lvl):
                continue
            buf.sort()
            promoted = buf[0::2]            # deterministic even offset
            self.levels[lvl] = []
            if lvl + 1 == len(self.levels):
                self.levels.append([])
            self.levels[lvl + 1].extend(promoted)

    def update_many(self, values):
        vals = list(np.asarray(values, dtype=np.float64))
        self.levels[0].extend(vals)
        self.n += len(vals)
        self._compact()

    def merge(self, other: "KLLSketch"):
        while len(self.levels) < len(other.levels):
            self.levels.append([])
        for lvl, buf in enumerate(other.levels):
            self.levels[lvl].extend(buf)
        self.n += other.n
        self._compact()
        return self

    def to_rows(self) -> pd.DataFrame:
        lvls, vals = [], []
        for lvl, buf in enumerate(self.levels):
            lvls.extend([lvl] * len(buf))
            vals.extend(buf)
        return pd.DataFrame({
            "level": np.asarray(lvls, np.int64),
            "value": np.asarray(vals, np.float64),
            "n": np.full(len(vals), self.n, np.int64)})

    @staticmethod
    def from_rows(df: pd.DataFrame, k: int = 256) -> "KLLSketch":
        s = KLLSketch(k)
        mx = int(df["level"].max()) if len(df) else 0
        s.levels = [[] for _ in range(mx + 1)]
        for lvl, v in zip(df["level"].to_numpy(np.int64),
                          df["value"].to_numpy(np.float64)):
            s.levels[int(lvl)].append(float(v))
        s.n = int(df["n"].iloc[0]) if len(df) else 0
        return s

    def quantile(self, q: float) -> float:
        items = []
        for lvl, buf in enumerate(self.levels):
            w = 1 << lvl
            items.extend((v, w) for v in buf)
        if not items:
            return float("nan")
        items.sort()
        target = q * sum(w for _, w in items)
        acc = 0
        for v, w in items:
            acc += w
            if acc >= target:
                return v
        return items[-1][0]


def kll_quantiles(ds, col: str, qs=(0.5, 0.9, 0.99), k: int = 256):
    """Distribution-free mergeable approximate quantiles: one KLL
    sketch per BLOCK (state is O(k log(n/k)) floats — the only thing
    that ever moves), merged on the driver. The sketch complement of
    histogram_registers (which needs a known [lo, hi] range).
    Returns pd.DataFrame (q, value, n)."""
    def partial(batch: pa.Table) -> pa.Table:
        s = KLLSketch(k)
        s.update_many(np.asarray(batch[col], dtype=np.float64))
        rows = s.to_rows()
        # level -1 marker row carries this block's item count; data
        # rows carry 0 so stream batching can never double-count
        lvl = np.concatenate([rows["level"].to_numpy(), [-1]])
        val = np.concatenate([rows["value"].to_numpy(), [0.0]])
        n = np.concatenate([np.zeros(len(rows), np.int64), [s.n]])
        return pa.table({"level": pa.array(lvl.astype(np.int64)),
                         "value": pa.array(val),
                         "n": pa.array(n)})

    agg = (ds.select_columns([col])
           .map_batches(partial, batch_format="pyarrow").to_pandas())
    total = KLLSketch(k)
    total.n = int(agg["n"].sum())
    data = agg[agg["level"] >= 0]
    mx = int(data["level"].max()) if len(data) else 0
    total.levels = [[] for _ in range(mx + 1)]
    for lvl, v in zip(data["level"].to_numpy(np.int64),
                      data["value"].to_numpy(np.float64)):
        total.levels[int(lvl)].append(float(v))
    # compact to a fixpoint (merging many blocks can overflow several
    # levels at once; each pass strictly shrinks total weight-carrying
    # buffer length, so this terminates)
    while any(len(b) > total._cap(lv)
              for lv, b in enumerate(total.levels)):
        total._compact()
    return pd.DataFrame({
        "q": list(qs),
        "value": [total.quantile(q) for q in qs],
        "n": np.full(len(qs), total.n, np.int64)})


def grouped_misra_gries(ds, group_col: str, col: str, k: int = 16):
    """Per-GROUP Misra-Gries heavy hitters — the trending-top-k shape
    (heavy users per day, hot items per category): every block
    compresses each group's exact value counts to <= k counters
    (O(groups_in_block * k) rows leave a task), ONE small groupby sums
    the per-block summaries, and a final per-group compression
    restores <= k counters with the same deterministic bound as the
    global sketch: within group g, ``true - n_g/(k+1) <= est <=
    true`` — any value holding more than 1/(k+1) of its group is
    guaranteed present. The per-block compression loops over GROUP
    SEGMENTS (not rows); suited to dimension-like group keys (days,
    categories), not per-user grouping. Returns pd.DataFrame
    (group, value, est) sorted by (group, est desc, value)."""
    def partial(batch: pa.Table) -> pa.Table:
        tab = pa.table({"g": batch[group_col], "v": batch[col]})
        gp = tab.group_by(["g", "v"]).aggregate([("v", "count")])
        g = np.asarray(gp["g"])
        v = np.asarray(gp["v"])
        c = np.asarray(gp["v_count"], dtype=np.int64)
        order = np.argsort(g, kind="stable")
        g, v, c = g[order], v[order], c[order]
        bounds = np.flatnonzero(np.concatenate(
            [[True], g[1:] != g[:-1]])) if g.size else np.array([], int)
        bounds = np.append(bounds, g.size)
        og, ov, oc = [], [], []
        for i in range(bounds.size - 1):
            s, e = bounds[i], bounds[i + 1]
            vv, cc = _mg_compress(v[s:e], c[s:e], k)
            og.append(np.full(vv.size, g[s]))
            ov.append(vv)
            oc.append(cc)
        if not og:
            return pa.table({"g": pa.array([], gp["g"].type),
                             "value": pa.array([], gp["v"].type),
                             "est": pa.array([], pa.int64())})
        return pa.table({
            "g": pa.array(np.concatenate(og)),
            "value": pa.array(np.concatenate(ov)),
            "est": pa.array(np.concatenate(oc).astype(np.int64))})

    merged = (ds.select_columns([group_col, col])
              .map_batches(partial, batch_format="pyarrow")
              .groupby(["g", "value"]).sum("est").to_pandas())
    out_rows = []
    for gval, sub in merged.groupby("g", sort=True):
        vv, cc = _mg_compress(sub["value"].to_numpy(),
                              sub["sum(est)"].to_numpy(np.int64), k)
        order = np.lexsort((vv, -cc))
        for v2, c2 in zip(vv[order], cc[order]):
            out_rows.append((gval, v2, int(c2)))
    return pd.DataFrame(out_rows, columns=["group", "value", "est"])


def grouped_kll_quantiles(ds, key_col: str, col: str,
                          qs=(0.5, 0.9, 0.99), k: int = 128):
    """Per-GROUP KLL quantile sketches — the distribution-free twin of
    ``grouped_quantiles`` for the regime where per-group distinct
    values are too many for the exact value-counts plan: each block
    builds one deterministic KLL per group segment (O(groups_in_block
    * k log) floats move, never rows), ONE groupby co-locates each
    group's level rows, and the finisher rebuilds + compacts the
    merged sketch and reads the quantiles. Same deterministic
    even-offset compactors as ``KLLSketch`` (bitwise-reproducible for
    a fixed layout); rank error O(n_g / k) per group. Returns
    pd.DataFrame (group, q, value, n)."""
    def partial(batch: pa.Table) -> pa.Table:
        keys = np.asarray(batch[key_col])
        vals = np.asarray(batch[col], dtype=np.float64)
        order = np.argsort(keys, kind="stable")
        keys, vals = keys[order], vals[order]
        seg = np.empty(keys.size, dtype=bool)
        if keys.size:
            seg[0], seg[1:] = True, keys[1:] != keys[:-1]
        starts = np.append(np.flatnonzero(seg), keys.size)
        og, ol, ov, on = [], [], [], []
        for i in range(starts.size - 1):
            s, e = starts[i], starts[i + 1]
            sk = KLLSketch(k)
            sk.update_many(vals[s:e])
            rows = sk.to_rows()
            lvl = np.concatenate([rows["level"].to_numpy(), [-1]])
            val = np.concatenate([rows["value"].to_numpy(), [0.0]])
            n = np.concatenate([np.zeros(len(rows), np.int64),
                                [sk.n]])
            og.append(np.full(lvl.size, keys[s]))
            ol.append(lvl.astype(np.int64))
            ov.append(val)
            on.append(n)
        if not og:
            return pa.table({"g": pa.array([], batch[key_col].type),
                             "level": pa.array([], pa.int64()),
                             "value": pa.array([], pa.float64()),
                             "n": pa.array([], pa.int64())})
        return pa.table({"g": pa.array(np.concatenate(og)),
                         "level": pa.array(np.concatenate(ol)),
                         "value": pa.array(np.concatenate(ov)),
                         "n": pa.array(np.concatenate(on))})

    def finish(group: pd.DataFrame) -> pd.DataFrame:
        g = group["g"].iloc[0]
        total = KLLSketch(k)
        total.n = int(group["n"].sum())
        data = group[group["level"] >= 0]
        mx = int(data["level"].max()) if len(data) else 0
        total.levels = [[] for _ in range(mx + 1)]
        for lvl, v in zip(data["level"].to_numpy(np.int64),
                          data["value"].to_numpy(np.float64)):
            total.levels[int(lvl)].append(float(v))
        while any(len(b) > total._cap(lv)
                  for lv, b in enumerate(total.levels)):
            total._compact()
        return pd.DataFrame({
            "group": [g] * len(qs),
            "q": list(qs),
            "value": [total.quantile(q) for q in qs],
            "n": np.full(len(qs), total.n, np.int64)})

    return (ds.select_columns([key_col, col])
            .map_batches(partial, batch_format="pyarrow")
            .groupby("g")
            .map_groups(finish, batch_format="pandas"))


def exact_topk_via_sketch(ds, col: str, k: int = 50,
                          capacity: int = 1024,
                          n_rows: int | None = None):
    """EXACT top-k heavy keys WITHOUT a full-vocabulary groupby — the
    sketch-accelerated scale path with a correctness PROOF gate:

    1. ``misra_gries(capacity)`` summarizes the column (<= capacity
       counter rows per block move, never the column). Any key absent
       from the summary has true count <= n // (capacity+1) (the MG
       deficit bound, layout-independent).
    2. The candidate keys (<= capacity, broadcast in a closure)
       are recounted EXACTLY in one filtered pass.
    3. Proof gate: if the k-th candidate's exact count is STRICTLY
       greater than the deficit bound, no non-candidate can reach the
       top k and the result is provably the exact top-k. Otherwise
       (flat distributions — the sketch buys nothing there) fall back
       to the full exact groupby, so the output is exact on BOTH
       paths; the gate only chooses the cheap one when that is safe.

    Ties resolve (count desc, value asc) on both paths. ``n_rows``
    skips the COUNT pass when the caller already knows it (parquet
    metadata). Returns pd.DataFrame (value, n) — k driver rows."""
    from ray.data.aggregate import Count

    if n_rows is None:
        n_rows = ds.count()
    from ray.data.aggregate import Count

    def _full():
        full = (ds.select_columns([col])
                .groupby(col).aggregate(Count(alias_name="n"))
                .to_pandas())
        if not len(full):
            return pd.DataFrame({"value": [], "n": []})
        vals = full[col].to_numpy()
        cnt = full["n"].to_numpy(np.int64)
        order = np.lexsort((vals, -cnt))
        return pd.DataFrame({"value": vals[order][:k],
                             "n": cnt[order][:k]})

    mg = misra_gries(ds, col, k=capacity)
    bound = n_rows // (capacity + 1)
    cands = mg["value"].to_numpy()
    if cands.size == 0:
        # a perfectly flat stream can decrement EVERY counter away —
        # nothing to certify, go straight to the exact groupby
        return _full()
    cand_set = pa.array(cands)

    def fil(batch: pa.Table) -> pa.Table:
        v = batch[col]
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        t = pa.table({"value": v})
        t = t.filter(pc.is_in(t["value"], value_set=cand_set))
        g = t.group_by("value").aggregate([("value", "count")])
        return pa.table({"value": g["value"],
                         "n": g["value_count"].cast(pa.int64())})

    exact = (ds.select_columns([col])
             .map_batches(fil, batch_format="pyarrow")
             .groupby("value").sum("n").to_pandas())
    if not len(exact):
        return _full()
    exact = exact.rename(columns={"sum(n)": "n"})
    vals = exact["value"].to_numpy()
    cnt = exact["n"].to_numpy(np.int64)
    order = np.lexsort((vals, -cnt))
    vals, cnt = vals[order][:k], cnt[order][:k]
    # bound == 0 means NO key was ever decremented: the summary holds
    # every distinct key exactly, so the recount is the full answer
    proven = bound == 0 or (cnt.size >= k and cnt[-1] > bound)
    if proven:
        return pd.DataFrame({"value": vals, "n": cnt})
    # flat tail — the sketch can't certify; exact full groupby
    return _full()
