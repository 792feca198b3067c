"""Summarization job entry point (``ray job submit`` compatible).

    ray job submit -- python scripts/run_summarize.py \
        --input /data/transcripts --kind transcripts --num 3 \
        --algorithm pagerank --weighing hamming --out /data/out/summary
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--kind", default="transcripts",
                   choices=["transcripts", "documents"])
    p.add_argument("--num", type=int, default=3)
    p.add_argument("--algorithm", default="pagerank")
    p.add_argument("--weighing", default="hamming")
    p.add_argument("--max-characters", type=int, default=0)
    p.add_argument("--presplit-words", type=int, default=0)
    p.add_argument("--out", required=True)
    p.add_argument("--num-cpus", type=int, default=0)
    args = p.parse_args()

    if not os.path.exists(args.input):
        print(f"error: --input path not found: {args.input}", file=sys.stderr)
        sys.exit(2)

    import ray

    if not ray.is_initialized():
        kw = {"include_dashboard": False, "ignore_reinit_error": True}
        if args.num_cpus:
            kw.update(address="local", num_cpus=args.num_cpus)
        ray.init(**kw)

    import ray.data as rd

    from tldr_ray.api import Summarizer

    s = Summarizer()
    s.config.algorithm = args.algorithm
    s.config.weighing = args.weighing
    s.config.max_characters = args.max_characters

    t0 = time.time()
    ds = rd.read_parquet(args.input)
    kwargs = {}
    if args.kind == "documents" and args.presplit_words:
        kwargs["presplit_words"] = args.presplit_words
    out = s.summarize_dataset(ds, num=args.num, kind=args.kind, **kwargs)
    out.write_parquet(args.out)
    print(json.dumps({"out": args.out, "wall_sec": round(time.time() - t0, 2)}))
    ray.shutdown()


if __name__ == "__main__":
    main()
