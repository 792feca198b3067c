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
report. Exactly ONE dataset-level ``materialize()`` exists in the whole
pipeline — the exact-dedup survivors, which two downstream consumers
genuinely share (the MinHash pair build and the anti-join's left side).
The quality- and dedup-stage report counts are folded into that single
intermediate (``exact_dedup_representatives(with_count=True)``: kept
rows = after_exact_dedup, sum of cluster sizes = after_quality), and
the output count comes from written parquet metadata when ``out_dir``
is given — no extra corpus-sized pins in the object store.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from tldr_ray.stages.dedup import (exact_dedup_representatives,
                                   minhash_lsh_pairs, resolve_clusters)
from tldr_ray.stages.joins import bucketed_anti_join
from tldr_ray.stages.text_analysis import quality_scores


def curate_documents(docs, id_col: str = "doc_id", text_col: str = "text",
                     min_quality: float = 0.3, near_dup_threshold: float = 0.8,
                     sample_fraction: float = 1.0,
                     quality_concurrency: int = 2,
                     out_dir: str | None = None):
    """Returns (curated Dataset, report dict).

    ``sample_fraction``: deterministic content-hash sample in [0, 1]
    (vectorized 64-bit text hash <= fraction * 2^64 — reproducible
    across runs and engines, unlike rng-state sampling); 1.0 keeps
    everything.
    ``quality_concurrency``: size of the scoring actor pool — it must
    leave CPUs for the feeding read tasks or the pipeline deadlocks
    (a pool that reserves every CPU starves its own input).

    Without ``out_dir`` the returned Dataset re-executes the (cheap)
    post-dedup stages from the materialized dedup survivors when
    consumed; pass ``out_dir`` at scale so the result is written once
    and handed back as a parquet-backed Dataset.
    """
    report: dict = {"input_rows": docs.count()}

    # 1. quality gate (vectorized scoring in an actor pool) — lazy; it
    # flows straight into the exact-dedup shuffle below
    scored = quality_scores(docs.select_columns([id_col, text_col]),
                            concurrency=quality_concurrency)

    def quality_gate(batch: pa.Table) -> pa.Table:
        q = np.asarray(batch["quality_score"], dtype=np.float64)
        return batch.filter(pa.array(q >= min_quality)) \
            .select([id_col, text_col])

    kept_q = scored.map_batches(quality_gate, batch_format="pyarrow")

    # 2. exact dedup: keep each cluster's min-id row IN-FLOW (the
    # surviving text rides the hash shuffle; no driver id-set). This is
    # the pipeline's ONE materialize: the survivors feed BOTH the
    # MinHash pair build and the anti-join, and carry the report counts.
    deduped_counted = exact_dedup_representatives(
        kept_q, id_col, text_col, with_count=True).materialize()
    report["after_exact_dedup"] = deduped_counted.count()
    report["after_quality"] = int(deduped_counted.sum("__n_dupes"))
    deduped = deduped_counted.drop_columns(["__n_dupes"])

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

    # 4. deterministic hash sample (vectorized; no per-row hashing)
    def sample(batch: pa.Table) -> pa.Table:
        from tldr_ray.hashing import poly_hash_batch

        thresh = np.uint64(int(sample_fraction * float((1 << 64) - 1)))
        keep = poly_hash_batch(batch[text_col]) <= thresh
        return batch.filter(pa.array(keep))

    curated = near if sample_fraction >= 1.0 else \
        near.map_batches(sample, batch_format="pyarrow")

    if out_dir:
        curated.write_parquet(out_dir)
        # row count from parquet metadata — no re-execution, no pin
        import pyarrow.dataset as pads
        import ray.data as rd

        report["output_rows"] = pads.dataset(out_dir,
                                             format="parquet").count_rows()
        report["out_dir"] = out_dir
        curated = rd.read_parquet(out_dir)
    else:
        report["output_rows"] = curated.count()
    return curated, report
