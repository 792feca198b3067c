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

from tldr_ray.kernel.distance import distance, distance_upper_bound


def uniq_sentence_indices(token_lists: list[list[str]], threshold: float) -> list[int]:
    """Return kept original indices after the two rejection passes."""
    msens = [" ".join(toks) for toks in token_lists]
    n = len(msens)
    reject: set[int] = set()

    # byte lengths after lowercasing, for the exact length-ratio bound
    # (the O(n^2) Jaro pass dominates kernel cost; most pairs are pruned)
    blen = [len(s.lower().encode("utf-8")) for s in msens]

    for i in range(n - 1):
        if i in reject:
            continue
        sen = msens[i]
        li = blen[i]
        for j in range(i + 1, n):
            if j in reject or distance_upper_bound(li, blen[j]) < threshold:
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
