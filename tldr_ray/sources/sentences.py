"""Pre-split sentences source (reference entry point 2, O28).

A ``sentences`` Parquet table (doc_id, sent_idx, text) feeds the kernel
directly, bypassing the sentence splitter — the dataset-level analog of
assigning ``Bag.OriginalSentences`` (/root/reference/tldr.go:116,
354-359; demo sentences_test.go:9-25).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa

from tldr_ray.config import SummarizeConfig
from tldr_ray.kernel.lexrank import summarize_with_indices


def summarize_sentences_table(sentences, num: int = 3,
                              cfg: Optional[SummarizeConfig] = None,
                              id_col: str = "doc_id",
                              num_parts: int = 64):
    """sentences Dataset (id, sent_idx, text) -> summary per document.

    One coarse shuffle on ``hash(id) % num_parts``; each partition task
    sweeps its documents (ordered by sent_idx) and runs the kernel with
    the pre-split list — the dictionary is built from the joined
    sentences exactly as the reference does when no text is given
    (tldr.go:120-123).
    """
    cfg = cfg or SummarizeConfig()

    def assign(batch: pa.Table) -> pa.Table:
        from tldr_ray.stages.joins import _hash_any

        part = (_hash_any(batch[id_col].to_pylist())
                % np.uint64(num_parts)).astype(np.int32)
        return batch.append_column("__part", pa.array(part))

    def per_part(group: pd.DataFrame) -> pd.DataFrame:
        ids, ranks, locs, texts = [], [], [], []
        for doc, g in group.groupby(id_col, sort=False):
            g = g.sort_values("sent_idx")
            picked = summarize_with_indices(
                "", num, cfg, presplit=g["text"].tolist())
            for r, (li, t) in enumerate(picked):
                ids.append(doc)
                ranks.append(r)
                locs.append(li)
                texts.append(t)
        return pd.DataFrame(
            {
                id_col: ids,
                "rank": pd.array(ranks, dtype="int32"),
                "local_idx": pd.array(locs, dtype="int32"),
                "text": texts,
            }
        )

    return (
        sentences.select_columns([id_col, "sent_idx", "text"])
        .map_batches(assign, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(per_part, batch_format="pandas")
    )
