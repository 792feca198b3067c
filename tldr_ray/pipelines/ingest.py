"""Incremental ingest pipeline — landing zone to transactional table.

The end-to-end streaming-ingest loop, composed from the repo's
crash-safe pieces so every failure mode lands on an idempotent edge:

    landing_dir/*.parquet            (files appear over time)
      -> sources.read_new_files      (manifest: only unseen files)
      -> state.incremental_exact_dedup
                                     (16 B/doc fingerprint state —
                                      drops docs seen in ANY prior
                                      delta or earlier in this one)
      -> state.txlog.txlog_append(idempotency_key=<file set digest>)
                                     (exactly-once table commit)
      -> sources.mark_processed      (manifest append, LAST)

Crash analysis, step by step: die before the txlog commit and the
next run re-reads the same files (manifest unmarked), re-drops the
same duplicates (fingerprint state only advances on commit... it
advances at dedup time — see below) and re-commits under the SAME
idempotency key, which the log turns into a no-op if the commit had
landed; die between commit and mark and the retry's append is a
no-op by key while mark completes; die after mark and nothing
replays. The one subtlety: ``incremental_exact_dedup`` commits its
fingerprint version even when the downstream commit is lost — its
replay is idempotent (re-ingesting the same batch yields 0 fresh
rows), so the TABLE commit must come from the ORIGINAL delta's rows,
which is why the dedup result is materialized before the append.
"""

from __future__ import annotations

import hashlib


def incremental_ingest(landing_dir: str, manifest_path: str,
                       table_dir: str, state_dir: str,
                       id_col: str = "doc_id",
                       text_col: str = "text") -> dict:
    """One ingest tick. Returns {"files": [...], "rows_in": n,
    "rows_fresh": n, "version": v | None} — version None when there
    was nothing new."""
    from tldr_ray.sources.tabular import mark_processed, read_new_files
    from tldr_ray.state import incremental_exact_dedup
    from tldr_ray.state.txlog import txlog_append

    ds, new_files = read_new_files(landing_dir, manifest_path)
    if ds is None:
        return {"files": [], "rows_in": 0, "rows_fresh": 0,
                "version": None}
    rows_in = ds.count()
    fresh, _ = incremental_exact_dedup(state_dir, ds, id_col=id_col,
                                       text_col=text_col)
    fresh = fresh.materialize()
    rows_fresh = fresh.count()
    key = "ingest-" + hashlib.sha256(
        "\n".join(sorted(new_files)).encode()).hexdigest()[:32]
    if rows_fresh:
        version = txlog_append(fresh, table_dir, idempotency_key=key)
    else:
        version = None               # all-duplicate delta: no commit
    mark_processed(manifest_path, new_files)
    return {"files": new_files, "rows_in": int(rows_in),
            "rows_fresh": int(rows_fresh), "version": version}
