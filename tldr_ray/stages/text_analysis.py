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
        self.langs = sorted(_LANG_STOPWORDS)
        # one Arrow value_set per profile, built once per actor
        self.profiles = {k: pa.array(sorted(v), pa.string())
                         for k, v in _LANG_STOPWORDS.items()}

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        D = len(batch)
        texts = pa.array(batch["text"].fillna("").tolist(), pa.string())
        # word extraction ~= re [^\W\d_]+ (unicode letters): split on the
        # complement — RE2's \W is ASCII-only, so spell out \p{L}
        toks = pc.split_pattern_regex(pc.utf8_lower(texts), r"[^\p{L}]+")
        flat = pc.list_flatten(toks)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        off = np.asarray(toks.offsets, dtype=np.int64)
        doc_of = np.repeat(np.arange(D, dtype=np.int64), np.diff(off))
        nonempty = np.asarray(pc.greater(pc.utf8_length(flat), 0))
        doc_of = doc_of[nonempty]
        flat = flat.filter(pa.array(nonempty))
        n_words = np.bincount(doc_of, minlength=D).astype(np.float64)
        scores = np.zeros((len(self.langs), D), dtype=np.float64)
        safe = np.where(n_words == 0, 1.0, n_words)
        for li, lang in enumerate(self.langs):
            hits = np.asarray(pc.is_in(flat, value_set=self.profiles[lang]))
            scores[li] = np.bincount(doc_of, weights=hits,
                                     minlength=D) / safe
        best = scores.max(axis=0)
        # ties resolve to the alphabetically-first profile (argmax picks
        # the first max; self.langs is sorted); all-zero -> 'und'
        pred_idx = scores.argmax(axis=0)
        langs_arr = np.asarray(self.langs + ["und"])
        pred_idx = np.where(best > 0, pred_idx, len(self.langs))
        batch = batch.copy()
        batch["lang_pred"] = langs_arr[pred_idx]
        batch["lang_score"] = best
        return batch


def language_id(ds, concurrency: int = 4, batch_size: int = 1024):
    return ds.map_batches(LanguageId, batch_format="pandas",
                          concurrency=concurrency, batch_size=batch_size)


class QualityScore:
    """Heuristic document quality: length / punctuation / stopword /
    digit / repetition signals -> per-signal columns + composite score in
    [0, 1]. All string work is vectorized pandas str ops."""

    def __init__(self):
        self.stop_set = pa.array(sorted(_LANG_STOPWORDS["en"]), pa.string())

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        D = len(batch)
        text = batch["text"].fillna("")
        texts = pa.array(text.tolist(), pa.string())
        n_chars = pd.Series(np.asarray(pc.utf8_length(texts),
                                       dtype=np.int64), index=batch.index)
        toks = pc.utf8_split_whitespace(pc.utf8_lower(texts))
        flat = pc.list_flatten(toks)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        off = np.asarray(toks.offsets, dtype=np.int64)
        doc_of = np.repeat(np.arange(D, dtype=np.int64), np.diff(off))
        tok_len = np.asarray(pc.utf8_length(flat), dtype=np.int64)
        nonempty = tok_len > 0            # Arrow split emits '' at edges
        doc_of, tok_len = doc_of[nonempty], tok_len[nonempty]
        flat = flat.filter(pa.array(nonempty))
        n_tok = np.bincount(doc_of, minlength=D).astype(np.int64)
        safe = np.maximum(n_tok, 1).astype(np.float64)
        mean_tok = pd.Series(
            np.bincount(doc_of, weights=tok_len, minlength=D) / safe
            * (n_tok > 0), index=batch.index)
        stops = np.asarray(pc.is_in(flat, value_set=self.stop_set))
        stop_ratio = pd.Series(
            np.bincount(doc_of, weights=stops, minlength=D) / safe,
            index=batch.index)
        # distinct tokens per doc: factorize once, count (doc, code)
        # boundary changes in sorted order — no per-doc set() loop
        codes = pd.factorize(pd.Series(np.asarray(flat)))[0]
        if codes.size:
            order = np.lexsort((codes, doc_of))
            dd, cc = doc_of[order], codes[order]
            first = np.concatenate([[True],
                                    (dd[1:] != dd[:-1]) | (cc[1:] != cc[:-1])])
            n_uniq = np.bincount(dd[first], minlength=D).astype(np.float64)
        else:
            n_uniq = np.zeros(D)
        uniq_ratio = pd.Series(n_uniq / safe, index=batch.index)
        n_tokens = pd.Series(n_tok, index=batch.index)
        denom = n_chars.replace(0, 1)
        # RE2's \w and \d are ASCII-only; use unicode property classes to
        # match the Python-re semantics these ratios were defined with
        punct_ratio = pd.Series(
            np.asarray(pc.count_substring_regex(
                texts, r"[^\p{L}\p{N}_\s]"), dtype=np.float64),
            index=batch.index) / denom
        digit_ratio = pd.Series(
            np.asarray(pc.count_substring_regex(texts, r"\p{Nd}"),
                       dtype=np.float64), index=batch.index) / denom

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
        # token-stream FNV-1a == FNV-1a over "tok1 tok2 ... tokN " (a
        # 0x20 separator follows EVERY token) — vectorize by iterating
        # over byte POSITION with a live-docs mask instead of per-doc
        # Python byte loops
        streams = [(" ".join((t or "").split()) + " ").encode("utf-8")
                   if (t or "").split() else b"" for t in texts]
        D = len(streams)
        lens = np.fromiter((len(s) for s in streams), np.int64, D)
        L = int(lens.max()) if D else 0
        flat = np.frombuffer(b"".join(streams), np.uint8)
        starts = np.cumsum(lens) - lens
        h = np.full(D, 0xCBF29CE484222325, dtype=np.uint64)
        prime = np.uint64(0x100000001B3)
        for j in range(L):
            live = np.flatnonzero(lens > j)
            h[live] = (h[live] ^ flat[starts[live] + j].astype(np.uint64)) \
                * prime
        return pa.table(
            {
                id_col: batch[id_col],
                "md5": pa.array(md5s, pa.string()),
                "fnv64": pa.array(h.view(np.int64)),
            }
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        fn, batch_format="pyarrow")
