"""Run any registered driver query from the CLI and write its result:

  python scripts/run_query.py <name> [sf_dir] [--out DIR] [--cpus N]

Executes QUERIES[name] against sf_dir (default /root/testdata/sf0.01)
and writes the result as parquet — a Dataset result streams via
write_parquet (never collected on the driver); an already-reduced
pyarrow/pandas result writes as one file. Prints one JSON metrics
line. Owns its Ray session (CLI entry point)."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    if not args:
        print(__doc__)
        return 2
    name = args[0]
    sf_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.01"
    out = "/tmp/tldr_ray_query_out"
    ncpu = 8
    for a in sys.argv[1:]:
        if a.startswith("--out="):
            out = a.split("=", 1)[1]
        if a.startswith("--cpus="):
            ncpu = int(a.split("=", 1)[1])

    import ray

    ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
             logging_level="ERROR")
    try:
        from tldr_ray.queries import QUERIES

        if name not in QUERIES:
            print(f"unknown query {name!r}; choose from "
                  f"{len(QUERIES)} registered names "
                  "(see COVERAGE.md)", file=sys.stderr)
            return 2
        os.makedirs(out, exist_ok=True)
        t0 = time.perf_counter()
        res = QUERIES[name](sf_dir)
        if hasattr(res, "write_parquet"):          # Dataset: stream out
            res.write_parquet(out)
            n = None
        else:
            import pyarrow as pa
            import pyarrow.parquet as pq

            t = (pa.Table.from_pandas(res)
                 if not isinstance(res, pa.Table) else res)
            pq.write_table(t, os.path.join(out, f"{name}.parquet"))
            n = t.num_rows
        wall = time.perf_counter() - t0
        if n is None:
            import pyarrow.dataset as pads

            n = pads.dataset(out).count_rows()
        print(json.dumps({"query": name, "sf_dir": sf_dir,
                          "rows": int(n), "out": out,
                          "wall_sec": round(wall, 3)}))
        return 0
    finally:
        ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
