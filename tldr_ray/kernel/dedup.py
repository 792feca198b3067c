"""Near-duplicate sentence removal (reference ``UniqSentences``).

Reproduces the *rejection decisions* of /root/reference/util.go:159-221:

1. Jaro pass: scanning i < j in order, reject j when
   ``distance(msens[i], msens[j]) >= threshold`` (msens = tokens joined
   with single spaces — empty tokens produce doubled spaces, which is
   part of the comparison semantics and is preserved here).
2. CSIS pass: for surviving i < j, reject i when msens[i] is a substring
   of msens[j] (break), reject j when msens[j] is a substring of msens[i].

DOCUMENTED DIVERGENCE (quirk Q4, SURVEY.md §2.5): the reference's
write-back reassigns a local slice header (util.go:214-220), so the
caller's list keeps its original length with a stale tail, desyncing
bags from ``OriginalSentences``. This engine instead returns the kept
ORIGINAL indices and callers drop rejected rows while preserving the
original index as the vertex id — the sane semantics. For inputs where
nothing is rejected (including the reference's own golden corpus
``sample.txt`` at threshold 0.95) the two behaviors are identical.
"""

from __future__ import annotations

import numpy as np

from tldr_ray.kernel.distance import distance, distance_upper_bound


def _pairwise_jaro_bound(msens: list[str]) -> np.ndarray:
    """EXACT per-pair upper bound on ``distance`` (the Jaro variant).

    Per character value c, the match count m gains at most one increment
    per s1 rune (the branches are exclusive per i), each else-branch
    increment consumes a fresh flagged s2 position, and the DIAGONAL
    branch (util.go:68-72) increments WITHOUT flag guards — an already
    else-matched s2 position can be counted twice. Hence per char
    m(c) <= min(h_s1(c), 2*h_s2(c)) with s1 the byte-shorter string, and
    m <= L1 overall; the score (m/L1 + m/L2 + (m-t)/m)/3 is then bounded
    by (b/L1 + b/L2 + 1)/3 with b = min(sum_c min(h_s1, 2*h_s2), L1).
    ASCII-only (non-ASCII codepoints can equal continuation bytes,
    breaking the histogram argument) — other pairs fall back to the
    length-ratio bound. Pruned pairs skip the O(n*window) scan with no
    semantic change.
    """
    n = len(msens)
    lowered = [s.lower().encode("utf-8") for s in msens]
    int_lens = np.fromiter((len(b) for b in lowered), np.int64, n)
    lens = int_lens.astype(np.float64)
    is_ascii = np.array([s.lower().isascii() for s in msens])
    # one bincount for the whole histogram block (row*256 + byte codes)
    all_bytes = np.frombuffer(b"".join(lowered), dtype=np.uint8)
    rows = np.repeat(np.arange(n, dtype=np.int64), int_lens)
    hist = np.bincount(rows * 256 + all_bytes,
                       minlength=n * 256).reshape(n, 256).astype(np.int32)
    # only byte values that actually occur contribute to the min-sum
    used = np.flatnonzero(hist.any(axis=0))
    hu = hist[:, used]
    lmin = np.minimum(lens[:, None], lens[None, :])
    lmax = np.maximum(lens[:, None], lens[None, :])
    with np.errstate(divide="ignore", invalid="ignore"):
        ratio_bound = (2.0 + lmin / lmax) / 3.0
        # D[i, j] = sum_c min(h_i(c), 2*h_j(c))  (i in the "short" role)
        d = np.zeros((n, n))
        for lo in range(0, n, 64):  # row blocks cap the n*n*K intermediate
            hi = min(lo + 64, n)
            d[lo:hi] = np.minimum(hu[lo:hi, None, :],
                                  2 * hu[None, :, :]).sum(axis=2)
        short_is_row = lens[:, None] <= lens[None, :]
        b = np.where(short_is_row, d, d.T)
        b = np.minimum(b, lmin)
        bound = (b / lmin + b / lmax + 1.0) / 3.0
    usable = is_ascii[:, None] & is_ascii[None, :] & (lmin > 0)
    return np.where(usable, bound, np.where(lmax > 0, ratio_bound, 1.0))


def uniq_sentence_indices(token_lists: list[list[str]], threshold: float) -> list[int]:
    """Return kept original indices after the two rejection passes."""
    msens = [" ".join(toks) for toks in token_lists]
    n = len(msens)
    reject: set[int] = set()

    # exact upper bounds prune most of the O(n^2) Jaro pass
    bound = _pairwise_jaro_bound(msens) if n > 1 else None

    for i in range(n - 1):
        if i in reject:
            continue
        sen = msens[i]
        for j in range(i + 1, n):
            if j in reject or bound[i, j] < threshold:
                continue
            if distance(sen, msens[j]) >= threshold:
                reject.add(j)

    for i in range(n - 1):
        if i in reject:
            continue
        psen = msens[i]
        for j in range(i + 1, n):
            if j not in reject:
                nsen = msens[j]
                if psen in nsen:      # i subset of j -> reject i
                    reject.add(i)
                    break
                if nsen in psen:      # j subset of i -> reject j
                    reject.add(j)

    return [i for i in range(n) if i not in reject]
