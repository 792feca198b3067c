"""Pre-split sentences source (reference entry point 2, O28).

A ``sentences`` Parquet table (doc_id, sent_idx, text) feeds the kernel
directly, bypassing the sentence splitter — the dataset-level analog of
assigning ``Bag.OriginalSentences`` (/root/reference/tldr.go:116,
354-359; demo sentences_test.go:9-25).
"""

from __future__ import annotations

from typing import Optional

import pandas as pd

from tldr_ray.config import SummarizeConfig
from tldr_ray.kernel.lexrank import summarize_with_indices


def summarize_sentences_table(sentences, num: int = 3,
                              cfg: Optional[SummarizeConfig] = None,
                              id_col: str = "doc_id"):
    """sentences Dataset (id, sent_idx, text) -> summary per document.

    Groups by document, orders by sent_idx, and runs the kernel with the
    pre-split list — the dictionary is built from the joined sentences
    exactly as the reference does when no text is given
    (tldr.go:120-123).
    """
    cfg = cfg or SummarizeConfig()

    def fn(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values("sent_idx")
        doc = g[id_col].iloc[0]
        picked = summarize_with_indices(
            "", num, cfg, presplit=g["text"].tolist())
        return pd.DataFrame(
            {
                id_col: [doc] * len(picked),
                "rank": pd.array(range(len(picked)), dtype="int32"),
                "local_idx": pd.array([p[0] for p in picked], dtype="int32"),
                "text": [p[1] for p in picked],
            }
        )

    return (
        sentences.select_columns([id_col, "sent_idx", "text"])
        .groupby(id_col)
        .map_groups(fn, batch_format="pandas")
    )
