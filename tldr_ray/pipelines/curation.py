"""Training-data curation pipeline: the full pre-training data path
composed from the engine's operators, end to end and streaming:

    read -> quality score (actor pool) -> quality filter
         -> exact dedup (content-hash groupby, keep min id)
         -> near-dedup (MinHash-LSH pairs -> duplicate clusters ->
            drop non-representatives)
         -> deterministic hash sample
         -> resumable partitioned parquet (+ curation report)

Every stage is a Ray Data transform; nothing materializes on the
driver except the (small) near-dup pair set and the final report.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from tldr_ray.stages.dedup import exact_dedup, minhash_lsh_pairs, resolve_clusters
from tldr_ray.stages.text_analysis import quality_scores


def curate_documents(docs, id_col: str = "doc_id", text_col: str = "text",
                     min_quality: float = 0.3, near_dup_threshold: float = 0.8,
                     sample_hex_prefixes: str = "0123456789abcdef",
                     quality_concurrency: int = 2,
                     out_dir: str | None = None):
    """Returns (curated Dataset, report dict).

    ``sample_hex_prefixes``: md5-first-hex-digit keep set ("0123" = ~25%
    deterministic sample; default keeps everything).
    ``quality_concurrency``: size of the scoring actor pool — it must
    leave CPUs for the feeding read tasks or the pipeline deadlocks
    (a pool that reserves every CPU starves its own input).
    """
    import ray

    report: dict = {"input_rows": docs.count()}

    # 1. quality gate (vectorized scoring in an actor pool)
    scored = quality_scores(docs.select_columns([id_col, text_col]),
                            concurrency=quality_concurrency)

    def quality_gate(batch: pa.Table) -> pa.Table:
        q = np.asarray(batch["quality_score"], dtype=np.float64)
        return batch.filter(pa.array(q >= min_quality)) \
            .select([id_col, text_col])

    kept_q = scored.map_batches(quality_gate,
                                batch_format="pyarrow").materialize()
    report["after_quality"] = kept_q.count()

    # 2. exact dedup: keep each cluster's min id
    clusters = exact_dedup(kept_q, id_col, text_col)

    def representatives(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[id_col])
        keep = np.asarray(batch["keep_id"])
        return batch.filter(pa.array(ids == keep)).select([id_col])

    keep_ids = clusters.map_batches(representatives, batch_format="pyarrow")
    keep_set = set(keep_ids.to_pandas()[id_col])
    keep_ref = ray.put(keep_set)

    def keep_exact(batch: pa.Table) -> pa.Table:
        s = ray.get(keep_ref)
        mask = [i in s for i in batch[id_col].to_pylist()]
        return batch.filter(pa.array(mask))

    deduped = kept_q.map_batches(keep_exact, batch_format="pyarrow") \
        .materialize()
    report["after_exact_dedup"] = deduped.count()

    # 3. near-dedup: MinHash-LSH pairs -> clusters -> keep representatives
    pairs = minhash_lsh_pairs(deduped, id_col, text_col,
                              threshold=near_dup_threshold)
    cl = resolve_clusters(pairs)
    drop = set(cl.loc[cl["id"] != cl["cluster_id"], "id"])
    drop_ref = ray.put(drop)

    def drop_near(batch: pa.Table) -> pa.Table:
        d = ray.get(drop_ref)
        mask = [i not in d for i in batch[id_col].to_pylist()]
        return batch.filter(pa.array(mask))

    near = deduped.map_batches(drop_near, batch_format="pyarrow")
    report["near_dup_dropped"] = len(drop)

    # 4. deterministic hash sample
    def sample(batch: pa.Table) -> pa.Table:
        mask = [hashlib.md5((t or "").encode()).hexdigest()[0]
                in sample_hex_prefixes
                for t in batch[text_col].to_pylist()]
        return batch.filter(pa.array(mask))

    curated = near.map_batches(sample, batch_format="pyarrow")
    curated = curated.materialize()
    report["output_rows"] = curated.count()

    if out_dir:
        curated.write_parquet(out_dir)
        report["out_dir"] = out_dir
    return curated, report
