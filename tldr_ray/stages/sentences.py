"""Sentence-split stage (reference O2, /root/reference/util.go:16-34).

A stateless ``map_batches`` flat-map turn -> sentences with
``batch_format="pyarrow"``. The reference tail-drop quirk (Q1) applies
per unit of text: text after the last ``[.?!]``+whitespace/EOT is
discarded.

Two granularities:

- ``split_turns_batch``: per-turn split — the scalable streaming form
  (no shuffle; a sentence can never span turns).
- document-level splitting (exact reference semantics over a whole
  conversation) happens inside the per-conversation kernel
  (``tldr_ray.pipelines.summarize``) after turns are joined with a
  single space in ``turn_idx`` order.
"""

from __future__ import annotations

import pyarrow as pa

from tldr_ray.kernel import tokenize_sentences


def split_turns_batch(batch: pa.Table) -> pa.Table:
    """(conv_id, turn_idx, text, ...) -> one row per sentence.

    Output: conv_id, turn_idx, sent_idx (within turn), text, n_chars.
    Rows whose text yields no sentence (quirk Q1) vanish.
    """
    conv_ids = batch["conv_id"].to_pylist()
    turn_idxs = batch["turn_idx"].to_pylist()
    texts = batch["text"].to_pylist()

    out_conv: list[str] = []
    out_turn: list[int] = []
    out_sent: list[int] = []
    out_text: list[str] = []
    for conv_id, turn_idx, text in zip(conv_ids, turn_idxs, texts):
        for i, sent in enumerate(tokenize_sentences(text or "")):
            out_conv.append(conv_id)
            out_turn.append(turn_idx)
            out_sent.append(i)
            out_text.append(sent)

    return pa.table(
        {
            "conv_id": pa.array(out_conv, pa.string()),
            "turn_idx": pa.array(out_turn, pa.int32()),
            "sent_idx": pa.array(out_sent, pa.int32()),
            "text": pa.array(out_text, pa.string()),
            "n_chars": pa.array([len(t) for t in out_text], pa.int32()),
        }
    )


def split_documents_batch(batch: pa.Table,
                          id_col: str = "doc_id",
                          text_col: str = "text") -> pa.Table:
    """(doc_id, text) -> one row per sentence with its appearance index."""
    ids = batch[id_col].to_pylist()
    texts = batch[text_col].to_pylist()
    out_id, out_idx, out_text = [], [], []
    for i, text in zip(ids, texts):
        for j, sent in enumerate(tokenize_sentences(text or "")):
            out_id.append(i)
            out_idx.append(j)
            out_text.append(sent)
    return pa.table(
        {
            id_col: pa.array(out_id),
            "sent_idx": pa.array(out_idx, pa.int32()),
            "text": pa.array(out_text, pa.string()),
            "n_chars": pa.array([len(t) for t in out_text], pa.int32()),
        }
    )
