"""Checkpoint manifests and lineage fingerprints.

Resumable-output contract (ray_guide "Sources & sinks"): every
checkpoint directory holds per-partition Parquet slices written
atomically plus a ``manifest.json`` committed LAST (atomic rename), so a
manifest's presence proves the iteration's slices are complete. Lineage
= the input fingerprint + partitioning, so a resume against different
input or layout is refused rather than silently wrong.
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Optional


def write_manifest(checkpoint_dir: str, manifest: dict) -> None:
    os.makedirs(checkpoint_dir, exist_ok=True)
    tmp = f"{checkpoint_dir}/manifest.json.tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=2)
    os.replace(tmp, f"{checkpoint_dir}/manifest.json")


def read_manifest(checkpoint_dir: str) -> Optional[dict]:
    path = f"{checkpoint_dir}/manifest.json"
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def latest_checkpoint(checkpoint_dir: str) -> Optional[int]:
    """Iteration of the newest COMPLETE checkpoint (per manifest)."""
    m = read_manifest(checkpoint_dir)
    return None if m is None else int(m["iteration"])


def fingerprint_input(paths: list[str]) -> str:
    """Cheap lineage fingerprint: file names + sizes + mtimes."""
    h = hashlib.blake2b(digest_size=12)
    for p in sorted(paths):
        st = os.stat(p)
        h.update(f"{os.path.basename(p)}:{st.st_size}:{int(st.st_mtime)}"
                 .encode())
    return h.hexdigest()
