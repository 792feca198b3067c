"""Windowing stage unit tests."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def events_ds(ts_seconds, users=None):
    import ray.data as rd

    n = len(ts_seconds)
    return rd.from_arrow(pa.table({
        "user_id": pa.array(users or [1] * n, pa.int64()),
        "ts": pa.array([int(t * 1_000_000) for t in ts_seconds],
                       pa.timestamp("us")),
    }))


@pytest.mark.usefixtures("ray_session")
class TestWindows:
    def test_tumbling_assignment(self):
        from tldr_ray.stages.windows import assign_tumbling

        ds = events_ds([0, 10, 3600, 3601, 7199])
        out = assign_tumbling(ds, size_s=3600).to_pandas()
        starts = out["window_start"].astype("int64") // 10**6 // 3600
        assert sorted(starts.tolist()) == [0, 0, 1, 1, 1]

    def test_sliding_each_event_in_two_windows(self):
        from tldr_ray.stages.windows import assign_sliding

        ds = events_ds([1000])
        out = assign_sliding(ds, size_s=1800, step_s=900).to_pandas()
        starts = sorted(out["window_start"].astype("int64") // 10**6)
        # event at t=1000 covered by windows starting at 0 and 900
        assert starts == [0, 900]
        assert len(out) == 2

    def test_sliding_rejects_nonmultiple(self):
        from tldr_ray.stages.windows import assign_sliding

        with pytest.raises(ValueError):
            assign_sliding(events_ds([0]), size_s=1000, step_s=300)

    def test_session_windows_gap_split(self):
        from tldr_ray.stages.windows import session_windows

        # user 1: two sessions (gap 3600 > 1800); user 2: one session
        ds = events_ds([0, 60, 120, 3720, 3780, 0, 10],
                       users=[1, 1, 1, 1, 1, 2, 2])
        out = session_windows(ds, gap_s=1800).to_pandas()
        u1 = out[out["user_id"] == 1].sort_values("session_id")
        assert u1["session_id"].tolist() == [1, 2]
        assert u1["n_events"].tolist() == [3, 2]
        u2 = out[out["user_id"] == 2]
        assert u2["n_events"].tolist() == [2]
