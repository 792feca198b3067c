"""Text-side volume soak: stream a ~1M-document synthetic corpus
(planted exact + near duplicates) through the FULL curation pipeline
(quality gate -> exact dedup -> MinHash-LSH near-dedup -> cluster
resolve -> anti-join -> partitioned parquet sink) while sampling peak
plasma and driver RSS — the memory-flat evidence for the dedup/text
stages, complementing scripts/soak.py's graph-side soak.

  RAY_GRAFT_SOAK_DOCS=1000000 python scripts/soak_docs.py

Prints ONE JSON line. Owns its Ray session (CLI entry point).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from soak import PeakSampler  # noqa: E402  (same scripts/ dir)

_VOCAB_N = 4000
_DOC_WORDS = 120


def _gen_block(bid: int, per_block: int, seed: int):
    """Deterministic block of synthetic docs. Duplicates are planted
    BLOCK-LOCALLY (j%12==7 copies j-7 exactly; j%17==13 copies j-5
    with two words swapped) so the generator stays embarrassingly
    parallel while the dedup stages still see ~8% exact and ~5% near
    duplicates — which cross blocks later anyway via content shuffles."""
    import numpy as np

    rng = np.random.default_rng(seed + bid)
    # vocab: mostly 4-8 char lowercase words + common stopwords so the
    # quality heuristics see realistic ratios
    base = np.array(
        ["".join(chr(97 + c) for c in rng.integers(0, 26, int(l)))
         for l in rng.integers(4, 9, _VOCAB_N)], dtype=object)
    stop = np.array(["the", "a", "of", "and", "in", "to"], dtype=object)
    picks = rng.integers(0, _VOCAB_N, (per_block, _DOC_WORDS))
    words = base[picks]
    # sprinkle stopwords at fixed columns (every 7th word)
    words[:, ::7] = stop[rng.integers(0, stop.size,
                                      (per_block, (_DOC_WORDS + 6) // 7))]
    texts = [" ".join(row) for row in words]
    for j in range(per_block):
        if j % 12 == 7 and j >= 7:
            texts[j] = texts[j - 7]                  # exact duplicate
        elif j % 17 == 13 and j >= 5:
            w = texts[j - 5].split()
            w[3], w[40] = "changed", "tokens"        # near duplicate
            texts[j] = " ".join(w)
    ids = bid * per_block + np.arange(per_block, dtype=np.int64)
    return ids, texts


def main():
    import pyarrow as pa
    import ray
    import ray.data as rd

    n_docs = int(os.environ.get("RAY_GRAFT_SOAK_DOCS", "1000000"))
    ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    seed = 42
    cache = f"/tmp/tldr_ray/soak_docs_n{n_docs}_s{seed}"
    out_dir = f"/tmp/tldr_ray/soak_docs_out_{n_docs}"

    ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from tldr_ray.pipelines.curation import curate_documents
    from tldr_ray.sources.tabular import read_table

    blocks = max(ncpu * 4, 64)
    per_block = n_docs // blocks

    t0 = time.time()
    if not os.path.exists(f"{cache}/_SUCCESS"):
        shutil.rmtree(cache, ignore_errors=True)
        os.makedirs(cache, exist_ok=True)

        def gen(batch):
            out = []
            for bid in batch["id"].tolist():
                ids, texts = _gen_block(int(bid), per_block, seed)
                out.append(pa.table({
                    "doc_id": pa.array(ids),
                    "text": pa.array(texts, pa.string())}))
            return pa.concat_tables(out)

        rd.range(blocks, override_num_blocks=blocks) \
            .map_batches(gen, batch_format="numpy") \
            .write_parquet(cache)
        open(f"{cache}/_SUCCESS", "w").close()
    synth_sec = round(time.time() - t0, 1)

    sampler = PeakSampler()
    sampler.start()

    shutil.rmtree(out_dir, ignore_errors=True)
    t0 = time.time()
    curated, report = curate_documents(
        read_table(cache, columns=["doc_id", "text"]),
        min_quality=0.05, quality_concurrency=max(4, ncpu // 4),
        out_dir=out_dir)
    wall = round(time.time() - t0, 1)
    sampler.stop()
    sampler.join(timeout=2)

    print(json.dumps({
        "metric": "soak_docs_curation",
        "n_docs": n_docs,
        "num_cpus": ncpu,
        "synth_sec": synth_sec,
        "curation_sec": wall,
        "docs_per_sec": int(n_docs / wall) if wall else 0,
        "report": report,
        "peak_plasma_gib": round(sampler.peak_shm / 2**30, 2),
        "peak_driver_rss_gib": round(sampler.peak_rss / 2**30, 2),
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
