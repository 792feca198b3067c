"""Training-data curation pipeline: the full pre-training data path
composed from the engine's operators, end to end and streaming:

    read -> quality score (actor pool) -> quality filter
         -> exact dedup (content-hash groupby, keep min id)
         -> near-dedup (MinHash-LSH pairs -> duplicate clusters ->
            drop non-representatives)
         -> deterministic hash sample
         -> resumable partitioned parquet (+ curation report)

Every stage is a Ray Data transform; nothing materializes on the
driver except the (size-gated) near-dup cluster table and the final
report — exact dedup keeps its surviving rows in-flow and the near-dup
drop is a bucketed anti-join, so no id-set is ever broadcast as a
Python set.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from tldr_ray.stages.dedup import (exact_dedup_representatives,
                                   minhash_lsh_pairs, resolve_clusters)
from tldr_ray.stages.joins import bucketed_anti_join
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

    # 2. exact dedup: keep each cluster's min-id row IN-FLOW (the
    # surviving text rides the hash shuffle; no driver id-set)
    deduped = exact_dedup_representatives(kept_q, id_col, text_col) \
        .materialize()
    report["after_exact_dedup"] = deduped.count()

    # 3. near-dedup: MinHash-LSH pairs -> clusters -> drop
    # non-representatives via a bucketed anti-join (distributed; the
    # cluster table itself is size-gated inside resolve_clusters)
    pairs = minhash_lsh_pairs(deduped, id_col, text_col,
                              threshold=near_dup_threshold)
    cl = resolve_clusters(pairs)
    drop_df = cl.loc[cl["id"] != cl["cluster_id"], ["id"]] \
        .rename(columns={"id": id_col})
    report["near_dup_dropped"] = len(drop_df)
    if len(drop_df):
        import ray.data as rd

        near = bucketed_anti_join(deduped, rd.from_pandas(drop_df),
                                  on=id_col)
    else:
        near = deduped

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
