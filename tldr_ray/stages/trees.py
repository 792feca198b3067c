"""Tree-ensemble stages built the histogram way.

Two classic ensemble algorithms re-expressed for Ray Data's
streaming model — the LightGBM insight that tree learning over big
data is GROUPED COUNTING, not row access:

- AdaBoost decision stumps: each boosting round is ONE map_batches
  pass emitting (misclassification-pattern, feature, bin, label)
  counts; the driver holds a histogram of size bins x 2^round x 2
  (never rows) and does exact-rational stump selection with
  ``fractions.Fraction`` weights — no float epsilon anywhere, so the
  learned model is bit-deterministic and provably equal to the
  sequential reference (pinned by pytest).

- Isolation forest: per-tree samples are drawn by a splitmix64
  threshold filter in ONE streaming pass (bounded candidates reach
  the driver, never the table), trees are built driver-side from
  <=sample_size rows each, and scoring is ONE vectorized map_batches
  descent over all trees with INTEGER total path length as the
  anomaly score (no harmonic-number floats -> deterministic top-k).

Both keep driver state O(model), not O(rows).
"""

from __future__ import annotations

from fractions import Fraction

import numpy as np
import pandas as pd
import pyarrow as pa


# --------------------------------------------------------------- AdaBoost


def _stump_predict(feat: np.ndarray, thresh: int,
                   polarity: int) -> np.ndarray:
    """+1 where (feat <= thresh) == (polarity == 1), else -1."""
    m = feat <= thresh
    return np.where(m, polarity, -polarity).astype(np.int64)


def adaboost_stumps(ds, feature_cols: list[str], label_col: str,
                    rounds: int = 3):
    """Train ``rounds`` AdaBoost decision stumps over integer
    features. Returns (stumps, train_err_num, train_err_den) where
    each stump is (feat_idx, thresh, polarity, eps: Fraction).

    Distributed shape: round r broadcasts the r learned stumps in
    the task closure; ONE pass histograms
    (pattern, feat, bin, label) counts (pattern = bitmask of which
    stumps misclassify the row — weights depend on nothing else);
    the driver enumerates thresholds on the histogram with exact
    Fraction weights w(pattern) = prod_miss eps_i/(1-eps_i)-style
    odds. Final training error re-scans once with the exact
    rational vote comparison (cross-multiplied integers, no log
    alphas)."""
    from ray.data.aggregate import Sum

    F = len(feature_cols)
    stumps: list[tuple[int, int, int, Fraction]] = []

    def hist_pass(cur_stumps):
        cs = list(cur_stumps)

        def fn(batch: pa.Table) -> pa.Table:
            feats = [np.asarray(batch[c], dtype=np.int64)
                     for c in feature_cols]
            y = np.asarray(batch[label_col], dtype=np.int64)
            pat = np.zeros(y.size, np.int64)
            for i, (fi, th, pol, _) in enumerate(cs):
                pred = _stump_predict(feats[fi], th, pol)
                pat |= (pred != y).astype(np.int64) << i
            out = {"pattern": [], "feat": [], "bin": [],
                   "label": [], "n": []}
            for fi in range(F):
                key = pd.MultiIndex.from_arrays(
                    [pat, feats[fi], y])
                u, c = np.unique(key, return_counts=True)
                out["pattern"].extend(int(k[0]) for k in u)
                out["feat"].extend([fi] * len(u))
                out["bin"].extend(int(k[1]) for k in u)
                out["label"].extend(int(k[2]) for k in u)
                out["n"].extend(c.astype(np.int64))
            return pa.table({
                "pattern": pa.array(out["pattern"], pa.int64()),
                "feat": pa.array(out["feat"], pa.int64()),
                "bin": pa.array(out["bin"], pa.int64()),
                "label": pa.array(out["label"], pa.int64()),
                "n": pa.array(out["n"], pa.int64())})

        return (ds.map_batches(fn, batch_format="pyarrow")
                .groupby(["pattern", "feat", "bin", "label"])
                .aggregate(Sum("n", alias_name="n")).to_pandas())

    for _ in range(rounds):
        h = hist_pass(stumps)
        # exact rational weight per pattern
        wmap = {}
        for p in h["pattern"].unique():
            w = Fraction(1)
            for i, (_, _, _, eps) in enumerate(stumps):
                if int(p) >> i & 1:
                    w *= (1 - eps) / eps    # misclassified upweight
            wmap[int(p)] = w
        # each row appears once PER FEATURE in the histogram — total
        # weight must come from a single feature's slice
        total_w = Fraction(0)
        for p, g in h[h["feat"] == 0].groupby("pattern"):
            total_w += wmap[int(p)] * int(g["n"].sum())
        best = None                          # (eps, fi, th, pol)
        for fi in range(F):
            g = h[h["feat"] == fi]
            bins = np.sort(g["bin"].unique())
            # weighted (label=+1, label=-1) mass per bin
            wp = {int(b): Fraction(0) for b in bins}
            wm = {int(b): Fraction(0) for b in bins}
            for _, r in g.iterrows():
                tgt = wp if int(r["label"]) == 1 else wm
                tgt[int(r["bin"])] += \
                    wmap[int(r["pattern"])] * int(r["n"])
            cum_p, cum_m = Fraction(0), Fraction(0)
            tot_p = sum(wp.values(), Fraction(0))
            tot_m = sum(wm.values(), Fraction(0))
            for b in bins:
                cum_p += wp[int(b)]
                cum_m += wm[int(b)]
                # polarity +1: predict +1 on <=b  -> errors are
                # minus-mass below + plus-mass above
                e1 = cum_m + (tot_p - cum_p)
                e2 = cum_p + (tot_m - cum_m)   # polarity -1
                for pol, e in ((1, e1), (-1, e2)):
                    k = (e, fi, int(b), pol)
                    if best is None or k < best:
                        best = k
        eps = best[0] / total_w
        stumps.append((best[1], best[2], best[3], eps))

    # exact final training error: vote by cross-multiplied odds
    num_odds = [(1 - s[3]).numerator * s[3].denominator
                for s in stumps]   # (1-eps)/eps numerators
    den_odds = [(1 - s[3]).denominator * s[3].numerator
                for s in stumps]

    # the 2^rounds possible vote patterns, each decided ONCE with
    # exact python-int cross-multiplied odds; rows then just index
    R = len(stumps)
    fin_by_pat = np.empty(1 << R, np.int64)
    for q in range(1 << R):
        lhs, rhs = 1, 1
        for i in range(R):
            if q >> i & 1:                   # stump i votes +1
                lhs *= num_odds[i]
                rhs *= den_odds[i]
            else:
                lhs *= den_odds[i]
                rhs *= num_odds[i]
        fin_by_pat[q] = 1 if lhs > rhs else -1

    def err_pass(batch: pa.Table) -> pa.Table:
        feats = [np.asarray(batch[c], dtype=np.int64)
                 for c in feature_cols]
        y = np.asarray(batch[label_col], dtype=np.int64)
        q = np.zeros(y.size, np.int64)
        for i, (fi, th, pol, _) in enumerate(stumps):
            q |= (_stump_predict(feats[fi], th, pol)
                  == 1).astype(np.int64) << i
        wrong = fin_by_pat[q] != y
        return pa.table({
            "w": pa.array([int(wrong.sum())], pa.int64()),
            "n": pa.array([y.size], pa.int64())})

    tot = (ds.map_batches(err_pass, batch_format="pyarrow")
           .to_pandas().sum())
    return stumps, int(tot["w"]), int(tot["n"])


def adaboost_reference(X: np.ndarray, y: np.ndarray,
                       rounds: int = 3):
    """Sequential per-row AdaBoost with the same exact-Fraction
    arithmetic and tie order — the pytest oracle."""
    n, F = X.shape
    w = [Fraction(1) for _ in range(n)]
    stumps = []
    for _ in range(rounds):
        total = sum(w, Fraction(0))
        best = None
        for fi in range(F):
            for th in sorted(set(int(v) for v in X[:, fi])):
                for pol in (1, -1):
                    pred = _stump_predict(X[:, fi], th, pol)
                    e = sum((wi for wi, p, yy in zip(w, pred, y)
                             if p != yy), Fraction(0))
                    k = (e, fi, th, pol)
                    if best is None or k < best:
                        best = k
        e, fi, th, pol = best
        eps = e / total
        pred = _stump_predict(X[:, fi], th, pol)
        fac = (1 - eps) / eps
        w = [wi * fac if p != yy else wi
             for wi, p, yy in zip(w, pred, y)]
        stumps.append((fi, th, pol, eps))
    return stumps


# -------------------------------------------------------- isolation forest


def _splitmix_py(x: int) -> int:
    x = (x + 0x9E3779B97F4A7C15) % (1 << 64)
    x ^= x >> 30
    x = (x * 0xBF58476D1CE4E5B9) % (1 << 64)
    x ^= x >> 27
    x = (x * 0x94D049BB133111EB) % (1 << 64)
    x ^= x >> 31
    return x


def _build_itree(sample: np.ndarray, seed: int,
                 max_depth: int) -> list:
    """Deterministic isolation tree over integer features. Node =
    (feat, thresh, left, right) or (-1, depth_adjust_size, -1, -1)
    leaf. Splits: feat = h % F, thresh uniform integer in
    [min, max) via a second splitmix draw."""
    nodes = []

    def rec(rows: np.ndarray, depth: int, node_id: int) -> int:
        my = len(nodes)
        nodes.append(None)
        lo = sample[rows].min(axis=0)
        hi = sample[rows].max(axis=0)
        if (depth >= max_depth or rows.size <= 1
                or (lo == hi).all()):
            nodes[my] = (-1, int(rows.size), -1, -1)
            return my
        F = sample.shape[1]
        h = _splitmix_py(seed * 1_000_003 + node_id)
        order = [(f + h) % F for f in range(F)]
        feat = next((f for f in order if lo[f] < hi[f]))
        h2 = _splitmix_py(h)
        th = int(lo[feat]) + h2 % int(hi[feat] - lo[feat])
        m = sample[rows, feat] <= th
        li = rec(rows[m], depth + 1, 2 * node_id + 1)
        ri = rec(rows[~m], depth + 1, 2 * node_id + 2)
        nodes[my] = (feat, th, li, ri)
        return my

    rec(np.arange(sample.shape[0]), 0, 0)
    return nodes


def isolation_forest(ds, id_col: str, feature_cols: list[str],
                     n_trees: int = 64, sample_size: int = 128,
                     top_k: int = 20):
    """Deterministic isolation forest. Returns a pandas frame of the
    ``top_k`` most anomalous ids by INTEGER total path length
    (smallest = most isolated; ties by id).

    Pass 1 streams once and forwards only per-tree sample
    CANDIDATES: row r belongs to tree t's candidate set when
    splitmix64(id * n_trees + t) clears a threshold sized for ~2x
    sample_size survivors — O(n_trees * sample_size) rows reach the
    driver regardless of table size. Trees build driver-side; pass 2
    broadcasts the (tiny) node arrays and descends all trees
    vectorized, emitting per-block top-k partials."""
    import ray
    from ray.data.aggregate import Sum

    from tldr_ray.stages.dedup import _mix64

    F = len(feature_cols)
    n_total = ds.count()
    frac = min(1.0, (2.0 * sample_size) / max(1, n_total))
    thresh = np.uint64(int(frac * float(2 ** 64 - 1)))
    T = n_trees

    def cand(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[id_col], dtype=np.int64)
        feats = np.column_stack(
            [np.asarray(batch[c], dtype=np.int64)
             for c in feature_cols])
        out = []
        for t in range(T):
            h = _mix64((ids * T + t).astype(np.uint64))
            m = h <= thresh
            if not m.any():
                continue
            out.append(pa.table({
                "tree": pa.array(np.full(int(m.sum()), t,
                                         np.int64)),
                "h": pa.array(h[m].view(np.int64)),
                "id": pa.array(ids[m]),
                **{c: pa.array(feats[m, i])
                   for i, c in enumerate(feature_cols)}}))
        if not out:
            return pa.table({
                "tree": pa.array([], pa.int64()),
                "h": pa.array([], pa.int64()),
                "id": pa.array([], pa.int64()),
                **{c: pa.array([], pa.int64())
                   for c in feature_cols}})
        return pa.concat_tables(out)

    cands = ds.map_batches(cand, batch_format="pyarrow").to_pandas()
    max_depth = max(1, int(np.ceil(np.log2(max(2, sample_size)))))
    trees = []
    for t in range(T):
        g = cands[cands["tree"] == t].sort_values(
            ["h", "id"]).head(sample_size)
        sample = g[feature_cols].to_numpy(np.int64)
        if sample.shape[0] == 0:
            trees.append([(-1, 0, -1, -1)])
            continue
        trees.append(_build_itree(sample, seed=t,
                                  max_depth=max_depth))
    # flatten for vectorized descent
    packed = []
    for nodes in trees:
        arr = np.array([(f, th, l, r) for f, th, l, r in nodes],
                       dtype=np.int64).reshape(-1, 4)
        packed.append(arr)
    ref = ray.put(packed)

    def score(batch: pa.Table) -> pa.Table:
        import ray as _ray

        tr = _ray.get(ref)
        ids = np.asarray(batch[id_col], dtype=np.int64)
        feats = np.column_stack(
            [np.asarray(batch[c], dtype=np.int64)
             for c in feature_cols])
        # integer stand-in for the harmonic c(m) leaf credit:
        # floor(log2(leaf_sample_size)) extra depth — a leaf holding
        # many sample points is NOT isolation
        bl = np.array([0] + [int(m).bit_length() - 1
                             for m in range(1, 4097)], np.int64)
        total = np.zeros(ids.size, np.int64)
        for arr in tr:
            node = np.zeros(ids.size, np.int64)
            depth = np.zeros(ids.size, np.int64)
            for _ in range(64):              # bounded by max_depth
                f = arr[node, 0]
                live = f >= 0
                if not live.any():
                    break
                th = arr[node, 1]
                go_l = np.zeros(ids.size, bool)
                idx = np.flatnonzero(live)
                go_l[idx] = feats[idx, f[idx]] <= th[idx]
                node = np.where(live,
                                np.where(go_l, arr[node, 2],
                                         arr[node, 3]), node)
                depth = depth + live.astype(np.int64)
            leaf_sz = np.where(arr[node, 0] < 0, arr[node, 1], 0)
            total += depth + bl[np.minimum(leaf_sz, 4096)]
        order = np.lexsort((ids, total))[:top_k]
        return pa.table({
            "id": pa.array(ids[order]),
            "path_sum": pa.array(total[order])})

    parts = ds.map_batches(score, batch_format="pyarrow") \
        .to_pandas()
    parts = parts.sort_values(["path_sum", "id"]).head(top_k)
    return parts.reset_index(drop=True)
