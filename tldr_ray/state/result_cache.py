"""Fingerprint-invalidated QUERY RESULT CACHE.

The materialized-view primitive for expensive pipelines over
slow-changing inputs: a result is stored under (query key, input
fingerprint) where the fingerprint digests the input files' parquet
FOOTERS (path, size, serialized metadata bytes) — content-addressed,
mtime-independent, and O(footers) to compute, never a data scan. A
hit streams the stored parquet back; any input change (new file,
rewritten row group, schema evolution) changes the fingerprint and
misses. Writes are atomic (tmp dir + rename), so a crashed writer
can never serve a torn result — the same discipline as
state.incremental's versioned CURRENT swap.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import uuid


def table_fingerprint(paths: list[str]) -> str:
    """Digest the parquet footers of ``paths`` (order-insensitive)."""
    import pyarrow.parquet as pq

    parts = []
    for p in sorted(paths):
        md = pq.read_metadata(p)
        h = hashlib.blake2b(digest_size=16)
        h.update(str(md.num_rows).encode())
        h.update(str(md.num_row_groups).encode())
        h.update(md.metadata.get(b"pandas", b"") if md.metadata
                 else b"")
        sch = pq.read_schema(p)
        h.update(str(sch).encode())
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            h.update(str(g.total_byte_size).encode())
            h.update(str(g.num_rows).encode())
            for ci in range(g.num_columns):
                st = g.column(ci).statistics
                if st is not None:
                    h.update(repr((st.min, st.max,
                                   st.null_count)).encode())
        parts.append(f"{os.path.basename(p)}:{os.path.getsize(p)}:"
                     f"{h.hexdigest()}")
    return hashlib.blake2b("|".join(parts).encode(),
                           digest_size=16).hexdigest()


def get_or_compute(cache_dir: str, key: str, fingerprint: str,
                   compute):
    """Return ``(pyarrow.Table, hit: bool)``.

    ``compute`` runs only on a miss and must return a
    ``ray.data.Dataset`` or a ``pyarrow.Table``; the result is
    persisted as parquet + a meta.json carrying the fingerprint.
    A stale entry (different fingerprint) is recomputed and
    atomically replaced."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    entry = os.path.join(cache_dir, key)
    meta_p = os.path.join(entry, "meta.json")
    data_p = os.path.join(entry, "result.parquet")
    if os.path.exists(meta_p):
        with open(meta_p) as f:
            meta = json.load(f)
        if meta.get("fingerprint") == fingerprint:
            return pq.read_table(data_p), True

    res = compute()
    if not isinstance(res, pa.Table):
        res = pa.Table.from_pandas(res.to_pandas(),
                                   preserve_index=False)
    tmp = entry + f".tmp-{uuid.uuid4().hex}"
    os.makedirs(tmp, exist_ok=True)
    pq.write_table(res, os.path.join(tmp, "result.parquet"))
    with open(os.path.join(tmp, "meta.json"), "w") as f:
        json.dump({"fingerprint": fingerprint, "key": key}, f)
    shutil.rmtree(entry, ignore_errors=True)
    os.replace(tmp, entry)
    return res, False
