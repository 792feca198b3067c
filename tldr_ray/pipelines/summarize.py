"""Flagship pipeline: per-conversation LexRank summarization.

Ray-Data-first layout (SURVEY.md §3.1 redrawn for distribution):

    read_parquet(transcripts)
      -> groupby("conv_id")                      # the only shuffle
      -> map_groups(kernel)                      # whole reference path per conv
      -> summary table (conv_id, rank, local_idx, text)

A conversation is the reference's document boundary: turns sorted by
``turn_idx`` and joined with a single space reproduce the reference
input contract ("per-turn text equality under stable turn ordering" —
BASELINE.json input_hint). Conversations are small (human-scale
transcripts), so the dense O(n^2) kernel runs comfortably inside one
``map_groups`` call; the global/cross-conversation graph path lives in
``tldr_ray.graph`` instead.

Scale notes (100 TB thinking):
- the groupby shuffles only (conv_id, turn_idx, text) — project before
  grouping; all heavy lifting happens after the shuffle, vectorized.
- no driver-side materialization: the result is a streaming Dataset.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa

from tldr_ray.config import SummarizeConfig
from tldr_ray.kernel.lexrank import summarize_with_indices
from tldr_ray.kernel.text import tokenize_sentences


def _with_conv_part(ds, num_parts: int = 64):
    """Append a coarse int partition key for conv_id (the only shuffle
    key — per-conversation map_groups pays ~ms of invocation overhead
    per micro-group; a partition task sweeps its conversations with a
    local pandas groupby instead)."""
    def assign(batch: pa.Table) -> pa.Table:
        from tldr_ray.hashing import part_key

        return batch.append_column(
            "__part", pa.array(part_key(batch["conv_id"], num_parts)))

    return ds.map_batches(assign, batch_format="pyarrow")


def _summarize_group_fn(num: int, cfg: Optional[SummarizeConfig],
                        id_col: str = "conv_id",
                        presplit_words: Optional[int] = None):
    cfg = cfg or SummarizeConfig()

    def fn(group: pd.DataFrame) -> pd.DataFrame:
        group = group.sort_values("turn_idx")
        conv_id = group[id_col].iloc[0]
        text = " ".join(t for t in group["text"].tolist() if t).strip()
        presplit = None
        if presplit_words and not tokenize_sentences(text):
            words = text.split()
            presplit = [" ".join(words[j : j + presplit_words])
                        for j in range(0, len(words), presplit_words)] or None
        picked = summarize_with_indices(text, num, cfg, presplit=presplit)
        return pd.DataFrame(
            {
                id_col: [conv_id] * len(picked),
                "rank": pd.array(range(len(picked)), dtype="int32"),
                "local_idx": pd.array([p[0] for p in picked], dtype="int32"),
                "text": [p[1] for p in picked],
            }
        )

    return fn


def summarize_transcripts(transcripts, num: int = 3,
                          cfg: Optional[SummarizeConfig] = None,
                          presplit_words: Optional[int] = None,
                          num_parts: int = 64):
    """transcripts Dataset -> summary Dataset (conv_id, rank, local_idx,
    text); one coarse shuffle, conversations swept per partition."""
    per_conv = _summarize_group_fn(num, cfg, presplit_words=presplit_words)

    def per_part(group: pd.DataFrame) -> pd.DataFrame:
        outs = [per_conv(g) for _, g in group.groupby("conv_id", sort=False)]
        if not outs:
            return pd.DataFrame({"conv_id": pd.array([], dtype=object),
                                 "rank": pd.array([], dtype="int32"),
                                 "local_idx": pd.array([], dtype="int32"),
                                 "text": pd.array([], dtype=object)})
        return pd.concat(outs, ignore_index=True)

    return (
        _with_conv_part(
            transcripts.select_columns(["conv_id", "turn_idx", "text"]),
            num_parts)
        .groupby("__part")
        .map_groups(per_part, batch_format="pandas")
    )


def assemble_documents(transcripts, num_parts: int = 64):
    """transcripts -> (conv_id, text) one row per conversation.

    Turn texts joined with a single space in turn_idx order — the
    document-assembly contract shared by every per-conversation stage.
    """

    def per_part(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["conv_id", "turn_idx"])
        convs, texts = [], []
        for conv_id, sub in g.groupby("conv_id", sort=False):
            convs.append(conv_id)
            texts.append(" ".join(t for t in sub["text"].tolist()
                                  if t).strip())
        return pd.DataFrame({"conv_id": convs, "text": texts})

    return (
        _with_conv_part(
            transcripts.select_columns(["conv_id", "turn_idx", "text"]),
            num_parts)
        .groupby("__part")
        .map_groups(per_part, batch_format="pandas")
    )


def summarize_documents(documents, num: int = 3,
                        cfg: Optional[SummarizeConfig] = None,
                        id_col: str = "doc_id", text_col: str = "text",
                        batch_size: int = 256,
                        presplit_words: Optional[int] = None):
    """documents Dataset (id, text) -> summary (id, rank, local_idx, text).

    Documents are independent rows, so NO shuffle is needed at all: a
    stateless ``map_batches`` runs the kernel per row — the
    embarrassingly-parallel fast path (each batch is a few hundred docs;
    the kernel is O(n_sentences^2) per doc, still micro-scale).

    ``presplit_words``: for corpora without sentence punctuation (where
    the reference splitter's Q1 tail-drop would discard everything),
    chunk the text into pseudo-sentences of this many words and feed
    them through the reference's pre-split entry point (O28,
    /root/reference/tldr.go:116,354-359). None = strict splitter only.
    """
    cfg = cfg or SummarizeConfig()

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        ids, ranks, locals_, texts = [], [], [], []
        for i, text in zip(batch[id_col].tolist(), batch[text_col].tolist()):
            text = text or ""
            presplit = None
            if presplit_words and not tokenize_sentences(text):
                words = text.split()
                presplit = [" ".join(words[j : j + presplit_words])
                            for j in range(0, len(words), presplit_words)]
                if not presplit:
                    continue
            for r, (li, t) in enumerate(
                    summarize_with_indices(text, num, cfg, presplit=presplit)):
                ids.append(i)
                ranks.append(r)
                locals_.append(li)
                texts.append(t)
        return pd.DataFrame(
            {
                id_col: ids,
                "rank": pd.array(ranks, dtype="int32"),
                "local_idx": pd.array(locals_, dtype="int32"),
                "text": texts,
            }
        )

    return (
        documents.select_columns([id_col, text_col])
        .map_batches(fn, batch_format="pandas", batch_size=batch_size)
    )
