"""File-level transaction log — Delta-Lake-shaped table commits.

The complement of ``state.incremental``'s whole-state versioning: a
table here is an immutable pool of parquet data files plus an ordered
log of JSON commits, each adding and/or removing FILES — so an append
touches only the new files and one log entry (never rewrites history),
compaction is a metadata swap, and every committed version stays
readable until vacuumed (snapshot isolation + time travel).

Layout:

    table_dir/
      data/  <commit-uuid>-<i>.parquet   (immutable, never modified)
      _txlog/ 00000000001.json           (one commit per version:
                                          {"version", "op",
                                           "add": [names],
                                           "remove": [names]})

Commit protocol (single-node optimistic concurrency, the Delta rule):
write the full JSON to a temp file, then ``os.link`` it to the NEXT
version number — link fails atomically if another writer claimed that
version, and blind appends simply retry at version+1. Data files land
BEFORE the log entry, so a crash leaves unreferenced orphans (ignored
by readers, reclaimed by vacuum) — never a torn table. The log dir
must avoid ``=`` in names (DuckDB/hive readers infer ``key=value``
dirs into phantom columns — round-3 lesson).

Scale note: driver state is O(files-per-commit) names; snapshot
reconstruction folds O(#commits) small JSON files. At 100 TB the data
moves through normal ``read_parquet``/``write_parquet`` streaming —
the log only ever carries file NAMES.
"""

from __future__ import annotations

import json
import os
import uuid

_LOG = "_txlog"
_DATA = "data"
_WIDTH = 11          # zero-padded version file names sort lexically


def _log_dir(table_dir: str) -> str:
    return os.path.join(table_dir, _LOG)


def _data_dir(table_dir: str) -> str:
    return os.path.join(table_dir, _DATA)


def txlog_versions(table_dir: str) -> list[int]:
    """Committed versions, ascending (a commit exists iff its numbered
    log entry does — temp files and orphan data are invisible)."""
    d = _log_dir(table_dir)
    if not os.path.isdir(d):
        return []
    out = []
    for name in os.listdir(d):
        stem, ext = os.path.splitext(name)
        if ext == ".json" and stem.isdigit():
            out.append(int(stem))
    return sorted(out)

def _read_commit(table_dir: str, v: int) -> dict:
    with open(os.path.join(_log_dir(table_dir),
                           f"{v:0{_WIDTH}d}.json")) as fh:
        return json.load(fh)


def txlog_snapshot_files(table_dir: str,
                         version: int | None = None) -> list[str]:
    """Active data-file paths at ``version`` (default: latest), by
    folding add/remove actions of every commit up to it. Raises on an
    uncommitted or vacuumed version."""
    versions = txlog_versions(table_dir)
    if not versions:
        raise FileNotFoundError(f"no transaction log at {table_dir}")
    v = versions[-1] if version is None else int(version)
    if v not in versions:
        raise ValueError(
            f"version {v} not readable (committed: "
            f"{versions[0]}..{versions[-1]}"
            + (" — earlier versions vacuumed" if versions[0] > 1
               else "") + ")")
    active: list[str] = []
    seen = set()
    for c in versions:
        if c > v:
            break
        entry = _read_commit(table_dir, c)
        for name in entry.get("remove", []):
            seen.discard(name)
        for name in entry.get("add", []):
            seen.add(name)
    # preserve add order for stable listings
    order = []
    for c in versions:
        if c > v:
            break
        for name in _read_commit(table_dir, c).get("add", []):
            if name in seen and name not in order:
                order.append(name)
    active = [os.path.join(_data_dir(table_dir), n) for n in order]
    return active


def _commit(table_dir: str, op: str, add: list[str],
            remove: list[str], key: str | None = None,
            extra: dict | None = None,
            recompute_remove=None) -> int:
    """Atomically claim the next version via link(2) — retries past
    versions claimed by concurrent writers (blind append semantics).
    ``recompute_remove`` (callable () -> list[str]) re-derives the
    remove-set on every retry: an overwrite/compact that loses the
    version race must remove the files of the snapshot AS OF ITS
    ACTUAL predecessor (a concurrent append's files would otherwise
    survive an 'overwrite')."""
    d = _log_dir(table_dir)
    os.makedirs(d, exist_ok=True)
    tmp = os.path.join(d, f".tmp-{uuid.uuid4().hex}.json")
    versions = txlog_versions(table_dir)
    v = (versions[-1] if versions else 0) + 1
    while True:
        body = {"version": v, "op": op, "add": add, "remove": remove}
        if key is not None:
            body["key"] = key
        if extra:
            body.update(extra)
        with open(tmp, "w") as fh:
            json.dump(body, fh)
        target = os.path.join(d, f"{v:0{_WIDTH}d}.json")
        try:
            os.link(tmp, target)
            os.unlink(tmp)
            return v
        except FileExistsError:
            v += 1              # concurrent writer won this version
            if recompute_remove is not None:
                remove = recompute_remove()


def _stage_files(ds, table_dir: str) -> list[str]:
    """Write ``ds`` into data/ under a fresh commit uuid; returns the
    new file NAMES (log entries store names, not paths)."""
    import shutil

    dd = _data_dir(table_dir)
    os.makedirs(dd, exist_ok=True)
    cid = uuid.uuid4().hex
    staging = os.path.join(table_dir, f".staging-{cid}")
    ds.write_parquet(staging)
    names = []
    for i, f in enumerate(sorted(os.listdir(staging))):
        name = f"{cid}-{i}.parquet"
        os.replace(os.path.join(staging, f), os.path.join(dd, name))
        names.append(name)
    shutil.rmtree(staging)
    return names


def txlog_append(ds, table_dir: str,
                 idempotency_key: str | None = None) -> int:
    """APPEND ``ds`` as new immutable files + one log entry; existing
    files are untouched (the O(delta) write path). Returns the new
    version.

    ``idempotency_key`` (e.g. a landing-file path or a content
    digest) makes the append EXACTLY-ONCE across retries: the key is
    recorded in the commit JSON, and a later append carrying the same
    key is a no-op returning the original version — the streaming
    'crash after commit, retry the delta' case
    (``sources.mark_processed``'s twin on the sink side). The
    check-then-commit race window is closed by the link(2) claim: a
    concurrent duplicate lands as a second commit only if BOTH staged
    before either committed, which retries (sequential re-runs of a
    failed job) never do."""
    if idempotency_key is not None:
        for v in txlog_versions(table_dir):
            e = _read_commit(table_dir, v)
            if (e.get("key") == idempotency_key
                    or idempotency_key in e.get("keys", [])):
                return v           # "keys": checkpoint carry-forward
    names = _stage_files(ds, table_dir)
    return _commit(table_dir, "append", names, [],
                   key=idempotency_key)


def _current_snapshot_names(table_dir: str) -> list[str]:
    return ([os.path.basename(p)
             for p in txlog_snapshot_files(table_dir)]
            if txlog_versions(table_dir) else [])


def txlog_overwrite(ds, table_dir: str) -> int:
    """Replace the table contents in ONE atomic commit (readers at
    older versions keep seeing the old files until vacuum). The
    remove-set is RE-DERIVED if the version race is lost, so a
    concurrent append's files are removed too — overwrite means the
    new snapshot is exactly this dataset, whatever landed before it."""
    olds = _current_snapshot_names(table_dir)
    names = _stage_files(ds, table_dir)
    return _commit(table_dir, "overwrite", names, olds,
                   recompute_remove=lambda:
                   _current_snapshot_names(table_dir))


def txlog_read(table_dir: str, version: int | None = None):
    """The table at ``version`` (default latest) as a streaming
    Dataset over exactly its active files."""
    import ray.data as rd

    from tldr_ray.sources.tabular import hashable_parquet_schema

    files = txlog_snapshot_files(table_dir, version)
    if not files:
        raise FileNotFoundError(
            f"version has no active files in {table_dir}")
    return rd.read_parquet(
        files, schema=hashable_parquet_schema(files[0]))


def txlog_compact(table_dir: str,
                  target_rows_per_file: int = 1_000_000) -> int:
    """Rewrite the CURRENT snapshot into ~target-sized files and swap
    them in with one add+remove commit — pure metadata for readers
    (same rows before and after; time travel to pre-compaction
    versions still reads the original files)."""
    ds = txlog_read(table_dir)
    n = ds.count()
    olds = [os.path.basename(p) for p in txlog_snapshot_files(table_dir)]
    nfiles = max(1, -(-n // target_rows_per_file))
    names = _stage_files(ds.repartition(nfiles), table_dir)
    return _commit(table_dir, "compact", names, olds)


def txlog_vacuum(table_dir: str,
                 orphan_grace_s: float = 600.0) -> list[str]:
    """Reclaim history: write a CHECKPOINT commit that restates the
    latest snapshot's full active file list (so the fold no longer
    needs older entries — the Delta checkpoint rule; naively deleting
    old log entries would lose still-active files their commits
    added) AND carries every idempotency key the dropped commits
    recorded (the exactly-once append contract survives vacuum), then
    drop every older log entry and every data file the checkpoint
    doesn't reference. Crash orphans are reclaimed only past
    ``orphan_grace_s`` seconds of mtime age — a CONCURRENT writer's
    staged-but-not-yet-committed files look identical to orphans and
    must not be deleted out from under its commit. Returns deleted
    file names. Time travel to a pre-vacuum version raises
    thereafter; the latest version's data is untouched."""
    import time

    versions = txlog_versions(table_dir)
    if not versions:
        return []
    active = [os.path.basename(p)
              for p in txlog_snapshot_files(table_dir)]
    keys = []
    referenced = set()
    for v in versions:
        e = _read_commit(table_dir, v)
        if e.get("key") is not None:
            keys.append(e["key"])
        keys.extend(e.get("keys", []))
        referenced.update(e.get("add", []))
    ckpt = _commit(table_dir, "checkpoint", active, [],
                   extra={"keys": sorted(set(keys))})
    dropped = []
    live = set(active)
    now = time.time()
    dd = _data_dir(table_dir)
    for name in sorted(os.listdir(dd) if os.path.isdir(dd) else []):
        if not name.endswith(".parquet") or name in live:
            continue
        full = os.path.join(dd, name)
        if name not in referenced \
                and now - os.path.getmtime(full) < orphan_grace_s:
            continue               # possibly a concurrent writer's
        os.remove(full)
        dropped.append(name)
    for v in txlog_versions(table_dir):
        if v < ckpt:
            os.remove(os.path.join(_log_dir(table_dir),
                                   f"{v:0{_WIDTH}d}.json"))
    return dropped
