"""Format-agnostic tabular ingestion.

Parquet is the scale path (column pruning + row-group predicate
pushdown happen at the storage layer — ``read_parquet(columns=...)``
only moves the requested bytes). CSV/JSONL exist for interchange:
both are row-major formats, so projection can only happen AFTER
decode — ``read_table`` still applies it (``select_columns``) so the
shuffle/object-store footprint matches the parquet path, but the
decode cost is O(full row). Convert to parquet before running
anything at real scale; this module's tests pin that all three
formats produce identical Datasets for the same logical table.
"""

from __future__ import annotations

import ray.data as rd

_READERS = {
    "parquet": rd.read_parquet,
    "csv": rd.read_csv,
    "json": rd.read_json,       # newline-delimited JSON
}


def read_table(path: str, format: str = "parquet",
               columns: list[str] | None = None, **kwargs):
    """One entry point for parquet / CSV / JSONL tables.

    ``columns`` prunes at the storage layer for parquet and right
    after decode for the row-major formats (same downstream
    footprint, higher decode cost — see module docstring).
    Extra kwargs pass through to the underlying ``ray.data`` reader
    (e.g. ``override_num_blocks``)."""
    try:
        reader = _READERS[format]
    except KeyError:
        raise ValueError(
            f"format must be one of {sorted(_READERS)}: {format!r}")
    if format == "parquet":
        return reader(path, columns=columns, **kwargs)
    ds = reader(path, **kwargs)
    return ds.select_columns(columns) if columns else ds
