"""Pretraining-mix preparation: the FineWeb-style tail of a curation
run — normalize, per-language quality gating, per-language token
budgets, deterministic packing into training shards.

Composes only already-proven stages (each individually hash-checked or
pytest-oracled); the composition itself is rows-only by nature and is
pinned by stage-level count tests. One coarse shuffle for the quality
quantiles, one for the budget ranking, two passes for the packing
scan — nothing materializes the corpus on the driver."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def prepare_pretraining_mix(docs, lang_budget_tokens: int = 2000,
                            shard_budget_tokens: int = 512,
                            id_col: str = "doc_id",
                            text_col: str = "text",
                            lang_col: str = "lang"):
    """Returns (packed Dataset(id, n_tokens, shard_id), report).

    Steps:
    1. canonical normalization (trim / collapse ws / lower / NFC);
    2. per-language DISCRETE-median quality gate (keep >= median —
       the honest relative gate when absolute thresholds are unknown);
    3. per-language token budget, longest documents first
       (stages.agg.budget_cap — the data-mixing balancer);
    4. deterministic packing into ``shard_budget_tokens`` training
       shards (stages.agg.pack_token_shards two-pass scan).
    """
    from tldr_ray.stages.agg import (budget_cap, grouped_quantiles,
                                     pack_token_shards)
    from tldr_ray.stages.text_analysis import quality_scores

    def normalize(batch: pa.Table) -> pa.Table:
        t = pc.utf8_trim_whitespace(batch[text_col])
        t = pc.replace_substring_regex(t, r"\s+", " ")
        t = pc.utf8_lower(t)
        t = pc.utf8_normalize(t, form="NFC")
        return pa.table({id_col: batch[id_col].cast(pa.int64()),
                         lang_col: batch[lang_col],
                         text_col: t})

    norm = docs.select_columns([id_col, lang_col, text_col]) \
        .map_batches(normalize, batch_format="pyarrow").materialize()
    n_in = norm.count()

    scored = quality_scores(norm, concurrency=2).materialize()
    med = grouped_quantiles(
        scored.select_columns([lang_col, "quality_score"]),
        lang_col, "quality_score", qs=(0.5,)).to_pandas()
    langs = np.sort(med[lang_col].to_numpy(object))
    meds = med.set_index(lang_col)["p50"].loc[langs] \
        .to_numpy(np.float64)

    def gate(batch: pa.Table) -> pa.Table:
        lv = np.asarray(batch[lang_col])
        qv = np.asarray(batch["quality_score"], dtype=np.float64)
        m = qv >= meds[np.searchsorted(langs, lv)]
        t = batch.filter(pa.array(m))
        n_tok = t["n_tokens"].cast(pa.int64())   # from quality_scores
        return pa.table({
            id_col: t[id_col].cast(pa.int64()),
            lang_col: t[lang_col],
            "n_tokens": n_tok,
            "neg_tokens": pc.negate(n_tok)})

    gated = scored.map_batches(gate, batch_format="pyarrow") \
        .materialize()
    n_gated = gated.count()

    capped = budget_cap(gated, lang_col, "n_tokens",
                        ["neg_tokens", id_col],
                        budget=lang_budget_tokens).materialize()
    n_capped = capped.count()

    packed = pack_token_shards(
        capped.select_columns([id_col, lang_col, "n_tokens"]),
        id_col, "n_tokens", budget=shard_budget_tokens)
    report = {"n_input": int(n_in), "n_after_quality_gate": int(n_gated),
              "n_after_lang_budget": int(n_capped),
              "lang_budget_tokens": lang_budget_tokens,
              "shard_budget_tokens": shard_budget_tokens}
    return packed, report
