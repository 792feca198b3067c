"""Text-analysis operators for training-data pipelines.

All stateful setup (compiled regexes, stopword tables, n-gram profiles)
lives in actor ``__init__``; per-batch work is vectorized pandas/pyarrow.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

# tiny built-in stopword profiles for the n-gram/stopword language
# heuristic (public common-word lists; good enough for a coarse router)
_LANG_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "it", "for",
           "was", "with", "as", "on", "be", "at", "by", "this", "have"},
    "de": {"der", "die", "das", "und", "ist", "von", "mit", "den", "nicht",
           "ein", "eine", "zu", "im", "für", "auf", "des", "sich", "auch"},
    "es": {"el", "la", "de", "que", "y", "en", "un", "una", "los", "las",
           "es", "por", "con", "para", "del", "se", "no", "su", "al"},
    "fr": {"le", "la", "les", "de", "des", "et", "un", "une", "est", "que",
           "dans", "pour", "qui", "sur", "pas", "au", "du", "il", "ne"},
    "it": {"il", "la", "di", "che", "e", "un", "una", "per", "con", "del",
           "non", "sono", "da", "si", "le", "nel", "alla", "come"},
    "pt": {"o", "a", "de", "que", "e", "do", "da", "em", "um", "uma",
           "para", "com", "não", "os", "as", "no", "na", "por", "se"},
}


class LanguageId:
    """Stopword-overlap language heuristic (actor-pool stage).

    Output: lang_pred (best profile) + lang_score (overlap ratio).
    Ties and empty texts resolve to 'und'.
    """

    def __init__(self):
        import re

        self.word_re = re.compile(r"[^\W\d_]+", re.UNICODE)
        self.profiles = {k: frozenset(v) for k, v in _LANG_STOPWORDS.items()}

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        preds, scores = [], []
        for text in batch["text"]:
            words = self.word_re.findall((text or "").lower())
            if not words:
                preds.append("und")
                scores.append(0.0)
                continue
            n = len(words)
            best_lang, best = "und", 0.0
            for lang in sorted(self.profiles):
                prof = self.profiles[lang]
                hits = sum(1 for w in words if w in prof)
                score = hits / n
                if score > best:
                    best_lang, best = lang, score
            preds.append(best_lang)
            scores.append(best)
        batch = batch.copy()
        batch["lang_pred"] = preds
        batch["lang_score"] = np.asarray(scores, dtype=np.float64)
        return batch


def language_id(ds, concurrency: int = 4, batch_size: int = 1024):
    return ds.map_batches(LanguageId, batch_format="pandas",
                          concurrency=concurrency, batch_size=batch_size)


class QualityScore:
    """Heuristic document quality: length / punctuation / stopword /
    digit / repetition signals -> per-signal columns + composite score in
    [0, 1]. All string work is vectorized pandas str ops."""

    def __init__(self):
        self.stop = _LANG_STOPWORDS["en"]

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        text = batch["text"].fillna("")
        n_chars = text.str.len().astype(np.int64)
        toks = text.str.lower().str.split()
        n_tokens = toks.map(len).astype(np.int64)
        safe_tokens = n_tokens.replace(0, 1)
        mean_tok = (toks.map(lambda ws: float(np.mean([len(w) for w in ws]))
                             if ws else 0.0))
        stop_ratio = toks.map(
            lambda ws: sum(1 for w in ws if w in self.stop) / max(1, len(ws)))
        uniq_ratio = toks.map(
            lambda ws: len(set(ws)) / max(1, len(ws)))
        punct_ratio = (text.str.count(r"[^\w\s]") / n_chars.replace(0, 1))
        digit_ratio = (text.str.count(r"\d") / n_chars.replace(0, 1))

        # composite: reward sane token length (3-8), some stopwords,
        # lexical diversity; punish punctuation/digit walls
        score = (
            np.clip(1 - np.abs(mean_tok - 5.5) / 5.5, 0, 1) * 0.25
            + np.clip(stop_ratio * 4, 0, 1) * 0.25
            + np.clip(uniq_ratio, 0, 1) * 0.30
            + np.clip(1 - punct_ratio * 5, 0, 1) * 0.10
            + np.clip(1 - digit_ratio * 5, 0, 1) * 0.10
        )
        out = batch.copy()
        out["n_tokens"] = n_tokens
        out["mean_token_len"] = mean_tok.astype(np.float64)
        out["stopword_ratio"] = stop_ratio.astype(np.float64)
        out["unique_token_ratio"] = uniq_ratio.astype(np.float64)
        out["punct_ratio"] = punct_ratio.astype(np.float64)
        out["digit_ratio"] = digit_ratio.astype(np.float64)
        out["quality_score"] = score.astype(np.float64)
        return out


def quality_scores(ds, concurrency: int = 4, batch_size: int = 1024):
    return ds.map_batches(QualityScore, batch_format="pandas",
                          concurrency=concurrency, batch_size=batch_size)


def token_counts(ds, id_col: str = "doc_id", text_col: str = "text"):
    """Whitespace tokens + BPE-ish subunit count ("\\w+|[^\\w\\s]" pieces),
    fully vectorized pyarrow; SQL-checkable (regexp_extract_all)."""
    def fn(batch: pa.Table) -> pa.Table:
        t = batch[text_col]
        ws = pc.list_value_length(
            pc.split_pattern_regex(pc.utf8_trim_whitespace(t), r"\s+"))
        bpe = pc.list_value_length(pc.extract_regex_span(t, r"\w+|[^\w\s]")) \
            if hasattr(pc, "extract_regex_span") else None
        if bpe is None:
            # portable fallback: count matches via split on the pattern
            bpe = pc.list_value_length(
                pc.split_pattern_regex(t, r"\w+|[^\w\s]"))
            bpe = pc.subtract(bpe, 1)
        return pa.table(
            {
                id_col: batch[id_col],
                "n_ws_tokens": pc.cast(ws, pa.int64()),
                "n_bpe_pieces": pc.cast(bpe, pa.int64()),
            }
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        fn, batch_format="pyarrow")


def fingerprints(ds, id_col: str = "doc_id", text_col: str = "text"):
    """Content fingerprints: md5 hex (SQL-checkable vs DuckDB md5()) and
    a 64-bit FNV-1a rolling token hash (order-sensitive)."""
    def fn(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        md5s = [hashlib.md5((t or "").encode("utf-8")).hexdigest()
                for t in texts]
        fnv = []
        for t in texts:
            h = 0xCBF29CE484222325
            for tok in (t or "").split():
                for b_ in tok.encode("utf-8"):
                    h = ((h ^ b_) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
                h = ((h ^ 0x20) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
            fnv.append(np.int64(np.uint64(h).astype(np.int64)))
        return pa.table(
            {
                id_col: batch[id_col],
                "md5": pa.array(md5s, pa.string()),
                "fnv64": pa.array(fnv, pa.int64()),
            }
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        fn, batch_format="pyarrow")
