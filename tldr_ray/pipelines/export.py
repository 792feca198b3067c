"""Training-shard export: the last mile of a curation pipeline.

    docs -> token counts (one vectorized pass)
         -> deterministic token-budget packing (two-pass distributed
            prefix scan over (id, weight) — O(P) driver state)
         -> shard ids joined back to the text rows (bucketed join;
            only ids+weights ever moved through the scan)
         -> resumable hive-partitioned parquet (shard_id=K/ dirs with
            _DONE markers — a re-run rewrites only unfinished shards)

Shard assignment is a pure function of (doc_id, token count, budget),
so re-running after a crash reproduces the identical layout and the
resume filter is sound.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def export_training_shards(docs, out_dir: str, budget: int = 20_000,
                           id_col: str = "doc_id",
                           text_col: str = "text") -> dict:
    """Pack ``docs`` into token-budget shards and write one partition
    directory per shard. Returns the write manifest plus shard count:
    {"written": [...], "skipped": [...], "n_shards": int}."""
    from tldr_ray.sinks import write_partitioned_parquet
    from tldr_ray.stages.agg import pack_token_shards
    from tldr_ray.stages.joins import bucketed_hash_join

    def with_tokens(batch: pa.Table) -> pa.Table:
        toks = pc.list_value_length(pc.split_pattern_regex(
            pc.utf8_trim_whitespace(batch[text_col]), r"\s+"))
        empty = pc.equal(pc.utf8_length(
            pc.utf8_trim_whitespace(batch[text_col])), 0)
        n = pc.if_else(empty, pa.scalar(0), toks).cast(pa.int64())
        return pa.table({id_col: batch[id_col].cast(pa.int64()),
                         text_col: batch[text_col],
                         "n_tokens": n})

    docs_t = docs.select_columns([id_col, text_col]) \
        .map_batches(with_tokens, batch_format="pyarrow").materialize()

    weights = docs_t.select_columns([id_col, "n_tokens"])
    shards = pack_token_shards(weights, id_col, "n_tokens", budget)

    def shard_only(batch: pa.Table) -> pa.Table:
        return pa.table({
            id_col: batch[id_col].cast(pa.int64()),
            "shard_id": batch["shard_id"].cast(pa.int64())})

    assigned = bucketed_hash_join(
        docs_t, shards.map_batches(shard_only, batch_format="pyarrow"),
        on=id_col)
    report = write_partitioned_parquet(assigned, out_dir, by="shard_id")
    report["n_shards"] = len(report["written"]) + len(report["skipped"])
    return report
