"""Jaro-variant string similarity + positional set helpers.

``distance`` is a faithful transliteration of the reference's
``Distance`` (/root/reference/util.go:40-135, itself adapted from
NaturalNode's jaro-winkler *without* the Winkler prefix bonus). The Go
code indiscriminately mixes rune iteration (``for i, v := range s``
yields byte offsets + runes) with byte indexing (``rune(s2[i])`` reads a
single byte) — the transliteration preserves that behavior exactly, so
it operates on UTF-8 byte offsets, not character offsets. For ASCII
inputs the two coincide.

``symmetric_difference`` / ``intersection`` are the exported positional
helpers of util.go:137-157 (unused by the pipeline, kept for API
parity).
"""

from __future__ import annotations

import math


def _runes_with_byte_offsets(s: str):
    """Yield (byte_offset, codepoint) like Go's ``for i, v := range s``."""
    off = 0
    for ch in s:
        yield off, ord(ch)
        off += len(ch.encode("utf-8"))


def distance(str1: str, str2: str) -> float:
    """Jaro similarity variant, bit-compatible with util.go:40-135."""
    if len(str1) == 0 and len(str2) == 0:
        return 0.0
    if str1 == str2:
        return 1.0
    str1 = str1.lower()
    str2 = str2.lower()
    b1 = str1.encode("utf-8")
    b2 = str2.encode("utf-8")
    # s1 is the byte-shorter string (util.go:51-58 compares byte lengths)
    if len(b1) <= len(b2):
        s1, bs1, bs2 = str1, b1, b2
    else:
        s1, bs1, bs2 = str2, b2, b1

    n1, n2 = len(bs1), len(bs2)
    match_window = int(math.floor(max(n1, n2) / 2.0) - 1.0)
    matches1 = bytearray(n1)
    matches2 = bytearray(n2)
    m = 0.0

    # hoisted loop invariant of the Go inner loop (dif/x are constant)
    dif = n2 - n1
    bound = n2 - (0 if dif < 2 else dif - 2)

    # ASCII fast path: rune iteration == byte iteration
    s1_iter = enumerate(bs1) if s1.isascii() else _runes_with_byte_offsets(s1)
    for i, v in s1_iter:
        matched = False
        if v == bs2[i]:
            matches1[i] = 1
            matches2[i] = 1
            matched = True
            m += 1
        else:
            k = 0 if i <= match_window else i - match_window
            i_hi = i + match_window
            while k != bound:
                if v == bs2[k]:
                    if not matches1[i] and not matches2[k]:
                        m += 1
                    matches1[i] = 1
                    matches2[k] = 1
                    matched = True
                k += 1
                if matched and k <= i_hi and k < n2:
                    break

    if m == 0:
        return 0.0

    # transposition count (util.go:113-129): k walks byte positions while
    # v walks runes of s1
    t = 0.0
    k = 0
    vals = bs1 if s1.isascii() else [ord(c) for c in s1]
    for v in vals:
        if k >= n1 - 1:
            break
        if matches1[k]:
            while k < n2 and not matches2[k]:
                k += 1
            if k < n2 and v != bs2[k]:
                t += 1
            k += 1

    t /= 2.0
    x1 = m / n1
    x2 = m / n2
    return (x1 + x2 + ((m - t) / m)) / 3


def distance_upper_bound(len1: int, len2: int) -> float:
    """Cheap EXACT upper bound on ``distance`` from byte lengths alone.

    With L1 = min byte length, L2 = max: m <= L1, so
    jaro = (m/L1 + m/L2 + (m-t)/m) / 3 <= (1 + L1/L2 + 1) / 3.
    Pairs whose bound is below the dedup threshold cannot be rejected —
    the dedup pass skips the full O(n*window) scan for them without any
    semantic change. Degenerate zero lengths return 1.0 (no pruning)."""
    lo, hi = (len1, len2) if len1 <= len2 else (len2, len1)
    if hi == 0:
        return 1.0
    return (2.0 + lo / hi) / 3.0


def symmetric_difference(src, dst) -> list[int]:
    """Indexes where the two equal-length int vectors differ (util.go:137-145)."""
    return [i for i, v in enumerate(src) if v != dst[i]]


def intersection(src, dst) -> list[int]:
    """Indexes where the two equal-length int vectors are equal (util.go:147-157)."""
    return [i for i, v in enumerate(src) if v == dst[i]]


def jaro_standard(a: str, b: str) -> float:
    """TEXTBOOK Jaro similarity (Winkler 1990 base metric) — distinct
    from the reference's quirky byte/rune variant above (util.go:40-135
    keeps its bit-parity transliteration in ``distance``). This one is
    the interoperable formula: match window max(|a|,|b|)/2 - 1,
    greedy left-to-right flag matching, half-transpositions, score
    (m/|a| + m/|b| + (m-t)/m) / 3. Verified bit-equal to DuckDB's
    jaro_similarity, so corpus-scale fuzzy joins built on it are
    SQL-hash-checkable."""
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return 0.0          # DuckDB convention: empty vs anything = 0
    if a == b:
        return 1.0
    md = max(la, lb) // 2 - 1
    fa = [False] * la
    fb = [False] * lb
    m = 0
    for i in range(la):
        lo, hi = max(0, i - md), min(lb, i + md + 1)
        for j in range(lo, hi):
            if not fb[j] and a[i] == b[j]:
                fa[i] = fb[j] = True
                m += 1
                break
    if m == 0:
        return 0.0
    t = 0
    k = 0
    for i in range(la):
        if fa[i]:
            while not fb[k]:
                k += 1
            if a[i] != b[k]:
                t += 1
            k += 1
    t //= 2
    return (m / la + m / lb + (m - t) / m) / 3.0


def jaro_winkler(a: str, b: str) -> float:
    """Jaro-Winkler similarity, bit-equal to DuckDB's
    jaro_winkler_similarity (fuzz-verified, 0/500 mismatches): the
    Winkler prefix boost l*0.1*(1-j) applies ONLY when the base Jaro
    exceeds 0.7 (the gated variant; l = common prefix capped at 4)."""
    j = jaro_standard(a, b)
    if j <= 0.7:
        return j
    l = 0
    for x, y in zip(a[:4], b[:4]):
        if x != y:
            break
        l += 1
    return j + l * 0.1 * (1.0 - j)
