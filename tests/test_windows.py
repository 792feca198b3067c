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

    def test_row_window_matches_pandas(self):
        """rn/lag/cumsum/delta vs a pandas groupby-apply oracle,
        partitioning-invariant."""
        import numpy as np
        import pandas as pd
        import pyarrow as pa
        import ray.data as rd
        from tldr_ray.stages.windows import row_window

        rng = np.random.default_rng(31)
        n = 2000
        df = pd.DataFrame({
            "uid": rng.integers(0, 50, n),
            "t": rng.permutation(n).astype(np.int64),
            "amt": rng.integers(0, 1000, n),
        })
        ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(6)
        out = (row_window(ds, "uid", ["t"], lag_cols=("amt",),
                          cumsum_cols=("amt",),
                          rolling_sums=(("amt", 2),), delta_col="t")
               .to_pandas().sort_values(["uid", "t"])
               .reset_index(drop=True))
        exp = df.sort_values(["uid", "t"]).reset_index(drop=True)
        g = exp.groupby("uid", sort=False)
        exp["rn"] = g.cumcount() + 1
        exp["lag_amt"] = g["amt"].shift(1).fillna(-1).astype(np.int64)
        exp["cum_amt"] = g["amt"].cumsum()
        exp["roll2_amt"] = (g["amt"]
                            .rolling(3, min_periods=1).sum()
                            .reset_index(level=0, drop=True)
                            .astype(np.int64))
        exp["delta_t"] = g["t"].diff().fillna(-1).astype(np.int64)
        for c in ["rn", "lag_amt", "cum_amt", "roll2_amt", "delta_t"]:
            assert (out[c].to_numpy() == exp[c].to_numpy()).all(), c

    def test_row_window_rejects_float_cumsum(self):
        import numpy as np
        import pandas as pd
        import pyarrow as pa
        import pytest
        import ray.data as rd
        from tldr_ray.stages.windows import row_window

        df = pd.DataFrame({"uid": [1, 1], "t": [1, 2], "x": [0.5, 1.5]})
        ds = rd.from_arrow(pa.Table.from_pandas(df))
        with pytest.raises(Exception):
            row_window(ds, "uid", ["t"],
                       cumsum_cols=("x",)).materialize()

    def test_funnel_order_sensitive(self):
        """A purchase BEFORE the click must not count; strict-after
        semantics; keys with zero matches still emitted."""
        import numpy as np
        import pandas as pd
        import pyarrow as pa
        import ray.data as rd
        from tldr_ray.stages.windows import funnel

        rows = [
            # u1 completes in order: signup@10, click@20, purchase@30
            (1, 10, "signup"), (1, 20, "click"), (1, 30, "purchase"),
            # u2: purchase precedes click -> stops after click
            (2, 10, "signup"), (2, 15, "purchase"), (2, 20, "click"),
            # u3: click only, never signed up -> 0 stages
            (3, 5, "click"),
            # u4: same-ts click as signup -> strict > rejects it
            (4, 10, "signup"), (4, 10, "click"),
        ]
        t = pa.table({
            "uid": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.int64()),
            "et": pa.array([r[2] for r in rows]),
        })
        out = (funnel(rd.from_arrow(t).repartition(4), "uid", "ts", "et",
                      ["signup", "click", "purchase"])
               .to_pandas().sort_values("uid").reset_index(drop=True))
        assert out["stage_reached"].tolist() == [3, 2, 0, 1]
        assert out["ts_purchase"].tolist() == [30, -1, -1, -1]
        assert out["ts_click"].tolist() == [20, 20, -1, -1]

    def test_cohort_retention_triangle(self):
        """Hand case: u1 active in buckets 0,1,2 of its cohort; u2
        joins one bucket later and returns at offset 1; u3 one-shot."""
        import numpy as np
        import pyarrow as pa
        import ray.data as rd
        from tldr_ray.stages.windows import cohort_retention

        B = 100  # bucket seconds
        rows = [(1, 10), (1, 110), (1, 250),      # cohort 0, offs 0,1,2
                (2, 120), (2, 260),               # cohort 1, offs 0,1
                (3, 50)]                          # cohort 0, off 0
        t = pa.table({
            "uid": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] * 1_000_000 for r in rows], pa.int64()),
        })
        out = (cohort_retention(rd.from_arrow(t).repartition(3),
                                "uid", "ts", bucket_s=B)
               .to_pandas()
               .sort_values(["cohort_bucket", "bucket_offset"])
               .reset_index(drop=True))
        got = {(r.cohort_bucket, r.bucket_offset): r.n_keys
               for r in out.itertuples()}
        assert got == {(0, 0): 2, (0, 1): 1, (0, 2): 1,
                       (1, 0): 1, (1, 1): 1}


class TestEventRateSpikes:
    def test_spike_flag_semantics(self, ray_session):
        """3x the trailing mean trips the detector; partial windows
        (rn <= 3) never do."""
        import pyarrow as pa

        from tldr_ray.queries import event_rate_spikes  # noqa: F401
        # exercise the underlying shape directly on a tiny frame via
        # the query over sf0.001 (hash-checked at sf0.01 by the driver)
        df = event_rate_spikes("/root/testdata/sf0.001").to_pandas()
        assert set(df.columns) == {"event_type", "hour_key", "n",
                                   "trailing3", "is_spike"}
        # invariant: a flagged row really does beat 2x trailing mean
        sp = df[df["is_spike"]]
        assert (3 * sp["n"] > 2 * sp["trailing3"]).all()
        # invariant: first three observed hours per type never flag
        first = df.sort_values(["event_type", "hour_key"]) \
            .groupby("event_type").head(3)
        assert not first["is_spike"].any()


class TestTimeRollingSum:
    def test_range_semantics_with_peers(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from tldr_ray.stages.windows import time_rolling_sum

        t = pa.table({
            "u": pa.array([1, 1, 1, 1, 2, 2], pa.int64()),
            "ts": pa.array([0, 10, 10, 25, 5, 100], pa.int64()),
            "v": pa.array([1, 2, 4, 8, 16, 32], pa.int64())})
        out = time_rolling_sum(rd.from_arrow(t).repartition(3),
                               "u", "ts", "v", window_us=15) \
            .to_pandas().sort_values(["u", "ts", "v"])
        # ts=10 peers BOTH see 1+2+4 (SQL RANGE includes peers);
        # ts=25 window [10,25] inclusive = 2+4+8; key isolation holds
        assert out["rolling_sum"].tolist() == [1, 7, 7, 14, 16, 32]

    def test_rejects_float_values(self, ray_session):
        import pyarrow as pa
        import pytest
        import ray.data as rd

        from tldr_ray.stages.windows import time_rolling_sum

        t = pa.table({"u": pa.array([1], pa.int64()),
                      "ts": pa.array([0], pa.int64()),
                      "v": pa.array([1.5], pa.float64())})
        with pytest.raises(Exception):
            time_rolling_sum(rd.from_arrow(t), "u", "ts", "v",
                             window_us=10).to_pandas()


@pytest.mark.usefixtures("ray_session")
class TestWatermark:
    def test_watermark_matches_sequential_replay(self):
        import ray.data as rd

        from tldr_ray.stages.windows import watermark_filter

        rng = np.random.default_rng(11)
        n = 5_000
        arrival = rng.permutation(n).astype(np.int64)
        ts = np.sort(rng.integers(0, 10**9, n)).astype(np.int64)
        t = pa.table({"arrival": pa.array(arrival),
                      "ts": pa.array(ts)})
        out = (watermark_filter(
            rd.from_arrow(t).repartition(5), "arrival", "ts",
            lateness_us=50_000_000, num_parts=16, id_max=n - 1)
            .to_pandas().sort_values("arrival"))
        # sequential replay oracle
        order = np.argsort(arrival)
        run = np.maximum.accumulate(ts[order])
        late = ts[order] < run - 50_000_000
        want = dict(zip(arrival[order].tolist(), late.tolist()))
        got = dict(zip(out["arrival"].tolist(), out["__late"].tolist()))
        assert got == want
        assert 0 < sum(late) < n          # both classes exercised


@pytest.mark.usefixtures("ray_session")
def test_cusum_matches_sequential_recurrence():
    """cusum_scan's closed form (P - min(0, runmin P)) equals the
    sequential S_t = max(0, S_{t-1} + x_t - k_t) per key, across a
    multi-key shuffled layout."""
    import ray.data as rd

    from tldr_ray.stages.windows import cusum_scan

    rng = np.random.default_rng(5)
    n, n_keys = 4_000, 7
    key = rng.integers(0, n_keys, n).astype(np.int64)
    t = np.empty(n, np.int64)
    for kk in range(n_keys):                      # unique order per key
        idx = np.flatnonzero(key == kk)
        t[idx] = np.arange(idx.size)
    x = rng.integers(0, 50, n).astype(np.int64)
    k = (key % 3 + 10).astype(np.int64)           # per-row drift
    perm = rng.permutation(n)
    ds = rd.from_arrow(pa.table({
        "key": pa.array(key[perm]), "t": pa.array(t[perm]),
        "x": pa.array(x[perm]), "k": pa.array(k[perm])})).repartition(6)
    out = (cusum_scan(ds, "key", "t", "x", "k", num_partitions=8)
           .to_pandas().sort_values(["key", "t"]))
    want = {}
    for kk in range(n_keys):
        idx = np.flatnonzero(key == kk)
        order = idx[np.argsort(t[idx])]
        s = 0
        for i in order:
            s = max(0, s + int(x[i]) - int(k[i]))
            want[(kk, int(t[i]))] = s
    got = dict(zip(zip(out["key"], out["t"]), out["cusum"]))
    assert {tuple(map(int, a)): int(b) for a, b in got.items()} == want
    assert (out["cusum"] >= 0).all()


def test_segmented_cummin_fallback_equals_vectorized():
    """The overflow-guard loop path and the offset-trick path agree."""
    from tldr_ray.stages.windows import _segmented_cummin

    rng = np.random.default_rng(3)
    P = rng.integers(-10**5, 10**5, 3_000).astype(np.int64)
    seg = np.sort(rng.integers(0, 40, 3_000)).astype(np.int64)
    fast = _segmented_cummin(P, seg, 40)
    # force the loop path: monotone scaling widens the span so
    # n_segs * span >= 2^62 (2e5 * 2^43 * 40 ~ 2^66) while staying
    # inside int64 per element; floor-div undoes it exactly
    bigP = P * np.int64(2**43)
    slow_scaled = _segmented_cummin(bigP, seg, 40)
    assert np.array_equal(slow_scaled // np.int64(2**43), fast)
    # reference: per-segment python accumulate on the raw data
    want = np.empty_like(P)
    for s in np.unique(seg):
        m = seg == s
        want[m] = np.minimum.accumulate(P[m])
    assert np.array_equal(fast, want)


@pytest.mark.usefixtures("ray_session")
def test_rolling_median_matches_pandas_and_guards_floats():
    import ray.data as rd
    from tldr_ray.stages.windows import rolling_median

    rng = np.random.RandomState(3)
    n = 200
    df = pd.DataFrame({
        "k": rng.randint(0, 7, n).astype(np.int64),
        "o": np.arange(n, dtype=np.int64),
        "v": rng.randint(-50, 50, n).astype(np.int64)})
    got = (rolling_median(rd.from_pandas(df), "k", ["o"], "v", k=4)
           .to_pandas().sort_values(["k", "o"]).reset_index(drop=True))
    want = df.sort_values(["k", "o"]).reset_index(drop=True)
    want["roll_median"] = (want.groupby("k", sort=False)["v"]
                           .rolling(4, min_periods=1).median()
                           .reset_index(level=0, drop=True))
    pd.testing.assert_frame_equal(
        got[["k", "o", "v", "roll_median"]],
        want[["k", "o", "v", "roll_median"]].rename(
            columns={"k": "k", "o": "o", "v": "v"}))
    # window wider than any group: median of everything seen so far
    one = pd.DataFrame({"k": np.zeros(3, np.int64),
                        "o": np.arange(3, dtype=np.int64),
                        "v": np.array([10, 20, 99], np.int64)})
    g1 = (rolling_median(rd.from_pandas(one), "k", ["o"], "v", k=100)
          .to_pandas().sort_values("o"))
    assert g1["roll_median"].tolist() == [10.0, 15.0, 20.0]
    # float value column is refused loudly
    bad = one.assign(v=one["v"].astype(np.float64))
    with pytest.raises(Exception, match="must be integer"):
        rolling_median(rd.from_pandas(bad), "k", ["o"], "v",
                       k=2).to_pandas()
