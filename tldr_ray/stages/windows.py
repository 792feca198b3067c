"""Event-time windowing stages (streaming-shaped ops on a batch engine).

Ray Data has no watermarks; these operators treat the input as an
ordered, partitioned log (ray_guide "Streaming-shaped workloads"):

- ``assign_tumbling``: vectorized bucket assignment — downstream
  ``groupby("window_start")`` is the aggregation.
- ``assign_sliding``: each event replicated to every covering window
  (size must be a multiple of step — k = size/step copies, emitted
  vectorized per batch, no Python row loop).
- ``session_windows``: per-key gap-based sessions with incremental
  state inside ordered ``map_groups`` (sorted by ts within the key).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_US = 1_000_000


def assign_tumbling(ds, ts_col: str = "ts", size_s: int = 3600,
                    keep: list[str] | None = None):
    """Add ``window_start`` (timestamp[us]) for tumbling windows."""
    size_us = size_s * _US

    def fn(batch: pa.Table) -> pa.Table:
        us = np.asarray(batch[ts_col].cast(pa.int64()))
        start = (us // size_us) * size_us
        # keep=[] means "only window_start"; None means "all columns"
        cols = {c: batch[c]
                for c in (batch.schema.names if keep is None else keep)}
        cols["window_start"] = pa.array(start).cast(pa.timestamp("us"))
        return pa.table(cols)

    return ds.map_batches(fn, batch_format="pyarrow")


def assign_sliding(ds, ts_col: str = "ts", size_s: int = 1800,
                   step_s: int = 900, keep: list[str] | None = None):
    """Replicate each event into its size_s/step_s covering windows."""
    if size_s % step_s:
        raise ValueError("size_s must be a multiple of step_s")
    k = size_s // step_s
    step_us = step_s * _US

    def fn(batch: pa.Table) -> pa.Table:
        us = np.asarray(batch[ts_col].cast(pa.int64()))
        base = us // step_us
        starts = np.concatenate([(base - i) * step_us for i in range(k)])
        cols = {}
        # keep=[] means "only window_start"; None means "all columns"
        for c in (batch.schema.names if keep is None else keep):
            col = batch[c]
            cols[c] = pa.concat_arrays([col.combine_chunks()] * k) \
                if isinstance(col, pa.ChunkedArray) else pa.concat_arrays([col] * k)
        cols["window_start"] = pa.array(starts).cast(pa.timestamp("us"))
        return pa.table(cols)

    return ds.map_batches(fn, batch_format="pyarrow")


def session_windows(ds, key_col: str = "user_id", ts_col: str = "ts",
                    gap_s: int = 1800):
    """Per-key session assignment: (key, session_id 1-based, n_events,
    session_start, session_end)."""
    gap = pd.Timedelta(seconds=gap_s)

    def fn(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(ts_col)
        sid = (g[ts_col].diff() > gap).cumsum().astype(np.int64) + 1
        g = g.assign(session_id=sid)
        out = g.groupby("session_id").agg(
            n_events=(ts_col, "size"),
            session_start=(ts_col, "min"),
            session_end=(ts_col, "max"),
        ).reset_index()
        out.insert(0, key_col, g[key_col].iloc[0])
        out["n_events"] = out["n_events"].astype(np.int64)
        return out

    return (
        ds.select_columns([key_col, ts_col])
        .groupby(key_col)
        .map_groups(fn, batch_format="pandas")
    )
