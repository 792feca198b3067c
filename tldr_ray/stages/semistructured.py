"""Semi-structured (JSON string) column extraction.

The hot path is polars' ``str.json_path_match`` — a vectorized Rust
JSON cursor over the Arrow string buffer, no per-row Python. The
stdlib fallback (container without polars) is a per-row loop and says
so loudly in its docstring; this repo's pinned environment always has
polars.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

try:
    import polars as pl
except ImportError:                                  # pragma: no cover
    pl = None


_CASTS = {"int64": pa.int64(), "float64": pa.float64(),
          "string": pa.string()}


def json_extract(ds, col: str, fields: dict[str, str],
                 cast: dict[str, str] | None = None):
    """Add one column per ``fields`` entry (out_col -> JSONPath, e.g.
    ``{"k": "$.k"}``) extracted from the JSON strings in ``col``.
    ``cast`` maps out_col -> {int64,float64,string} (default string;
    missing/null paths -> null, cast failures raise — silent nulls
    would hide corrupt rows). Stateless map_batches; the source JSON
    column is dropped from the output (re-select it upstream to keep)."""
    cast = cast or {}
    bad = set(cast.values()) - set(_CASTS)
    if bad:
        raise ValueError(f"unsupported casts: {sorted(bad)}")

    def fn(batch: pa.Table) -> pa.Table:
        cols = {c: batch[c] for c in batch.schema.names if c != col}
        if pl is not None:
            s = pl.from_arrow(batch[col].cast(pa.string()))
            for out, path in fields.items():
                got = s.str.json_path_match(path).to_arrow()
                cols[out] = got.cast(_CASTS.get(cast.get(out, "string")))
        else:                                        # pragma: no cover
            # stdlib fallback: per-row json parse (loud, slow; only
            # reachable when polars is absent from the environment)
            import json as _json

            vals = {out: [] for out in fields}
            for v in batch[col].to_pylist():
                try:
                    obj = _json.loads(v) if v is not None else None
                except ValueError:
                    obj = None
                for out, path in fields.items():
                    key = path.lstrip("$.")
                    vals[out].append(
                        None if not isinstance(obj, dict)
                        else obj.get(key))
            for out in fields:
                cols[out] = pa.array(
                    [None if x is None else str(x) for x in vals[out]],
                    pa.string()).cast(
                        _CASTS.get(cast.get(out, "string")))
        return pa.table(cols)

    return ds.map_batches(fn, batch_format="pyarrow")
