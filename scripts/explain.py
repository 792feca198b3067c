"""Per-stage execution profile for any registered driver query:

  python scripts/explain.py tpch_q1 [sf_dir] [--cpus N]

Runs QUERIES[name] against sf_dir (default /root/testdata/sf0.01),
consumes the result, and prints Ray Data's per-operator stats
(wall time, blocks, rows, task counts) — the feedback loop used to
keep every stage's wall time dominated by useful compute. For queries
that return a driver-side pyarrow Table (already-reduced results),
prints the row count and wall only. Owns its Ray session (CLI entry
point)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    if not args:
        print(__doc__)
        return 2
    name = args[0]
    sf_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.01"
    ncpu = 8
    for a in sys.argv[1:]:
        if a.startswith("--cpus"):
            ncpu = int(a.split("=")[1] if "=" in a
                       else sys.argv[sys.argv.index(a) + 1])

    import ray

    ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from tldr_ray.queries import QUERIES

    if name not in QUERIES:
        print(f"unknown query {name!r}; known: "
              f"{', '.join(sorted(QUERIES)[:12])} ...")
        return 2
    t0 = time.time()
    res = QUERIES[name](sf_dir)
    if hasattr(res, "stats"):                 # a Dataset — execute it
        res = res.materialize()               # stats need a real run
        n = res.count()
        wall = time.time() - t0
        print(res.stats())
        print(f"\n=== {name}: {n} rows in {wall:.2f}s "
              f"(sf_dir={sf_dir}, cpus={ncpu}) ===")
    else:                                     # driver-reduced table
        n = len(res)
        wall = time.time() - t0
        print(f"=== {name}: driver-side result, {n} rows in "
              f"{wall:.2f}s (stages already reduced; see the query "
              f"docstring for its pipeline shape) ===")
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
