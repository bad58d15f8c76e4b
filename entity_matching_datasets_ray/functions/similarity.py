"""Pairwise string-similarity kernels (public algorithms, no external deps).

These are the deterministic feature kernels that replace the reference's
LLM-based pair judgment (reference enrichment loop:
/root/reference/DeepMather/Amazon/prompt.py:151-206). All are pure
functions; the stateful pieces (IDF vector) are fitted once and broadcast
(see stages.scoring).

- ``levenshtein`` uses Myers' 1999 bit-parallel algorithm (O(ceil(m/64)*n))
  for the common short-string case, with a two-row DP fallback.
- ``jaro_winkler`` is the standard Winkler variant (prefix scale 0.1, max
  prefix 4).
- ``token_jaccard`` / ``tfidf_cosine`` operate on pre-split token lists.
"""

from __future__ import annotations

import math
from typing import Iterable, Optional, Sequence

# --------------------------------------------------------------------------
# Levenshtein
# --------------------------------------------------------------------------


def _levenshtein_myers(a: str, b: str) -> int:
    """Myers bit-parallel edit distance; requires len(a) <= 64."""
    m = len(a)
    peq: dict[str, int] = {}
    for i, ch in enumerate(a):
        peq[ch] = peq.get(ch, 0) | (1 << i)
    pv = (1 << m) - 1
    mv = 0
    score = m
    high = 1 << (m - 1)
    for ch in b:
        eq = peq.get(ch, 0)
        xv = eq | mv
        xh = (((eq & pv) + pv) ^ pv) | eq
        ph = mv | ~(xh | pv)
        mh = pv & xh
        if ph & high:
            score += 1
        if mh & high:
            score -= 1
        ph = (ph << 1) | 1
        mh = mh << 1
        pv = (mh | ~(xv | ph)) & ((1 << m) - 1)
        mv = ph & xv
    return score


def _levenshtein_dp(a: str, b: str) -> int:
    if len(a) > len(b):
        a, b = b, a
    prev = list(range(len(a) + 1))
    for j, cb in enumerate(b, 1):
        cur = [j] + [0] * len(a)
        for i, ca in enumerate(a, 1):
            cur[i] = min(prev[i] + 1, cur[i - 1] + 1, prev[i - 1] + (ca != cb))
        prev = cur
    return prev[-1]


def levenshtein(a: str, b: str) -> int:
    """Exact edit distance."""
    if a == b:
        return 0
    if not a:
        return len(b)
    if not b:
        return len(a)
    if len(a) > len(b):
        a, b = b, a
    if len(a) <= 64:
        return _levenshtein_myers(a, b)
    return _levenshtein_dp(a, b)


def levenshtein_ratio(a: Optional[str], b: Optional[str]) -> float:
    """1 - dist/max_len in [0, 1]; both-empty -> 1.0, one-empty -> 0.0."""
    a = a or ""
    b = b or ""
    if not a and not b:
        return 1.0
    n = max(len(a), len(b))
    return 1.0 - levenshtein(a, b) / n


# --------------------------------------------------------------------------
# Jaro-Winkler
# --------------------------------------------------------------------------


def jaro(a: str, b: str) -> float:
    if a == b:
        return 1.0
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return 0.0
    window = max(la, lb) // 2 - 1
    if window < 0:
        window = 0
    a_flags = [False] * la
    b_flags = [False] * lb
    matches = 0
    for i, ca in enumerate(a):
        lo = max(0, i - window)
        hi = min(lb, i + window + 1)
        for j in range(lo, hi):
            if not b_flags[j] and b[j] == ca:
                a_flags[i] = b_flags[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    transpositions = 0
    j = 0
    for i in range(la):
        if a_flags[i]:
            while not b_flags[j]:
                j += 1
            if a[i] != b[j]:
                transpositions += 1
            j += 1
    t = transpositions // 2
    return (matches / la + matches / lb + (matches - t) / matches) / 3.0


def jaro_winkler(a: Optional[str], b: Optional[str], prefix_weight: float = 0.1) -> float:
    a = a or ""
    b = b or ""
    if not a and not b:
        return 1.0
    j = jaro(a, b)
    if j > 0.7:
        prefix = 0
        for ca, cb in zip(a[:4], b[:4]):
            if ca == cb:
                prefix += 1
            else:
                break
        j += prefix * prefix_weight * (1.0 - j)
    return j


# --------------------------------------------------------------------------
# token-set similarities
# --------------------------------------------------------------------------


def token_jaccard(a: Iterable[str], b: Iterable[str]) -> float:
    sa, sb = set(a), set(b)
    if not sa and not sb:
        return 1.0
    if not sa or not sb:
        return 0.0
    inter = len(sa & sb)
    return inter / (len(sa) + len(sb) - inter)


def ngram_shingles(s: str, n: int = 3) -> set[str]:
    """Character n-gram shingle set (padding-free)."""
    if len(s) < n:
        return {s} if s else set()
    return {s[i : i + n] for i in range(len(s) - n + 1)}


def ngram_jaccard(a: Optional[str], b: Optional[str], n: int = 3) -> float:
    return token_jaccard(ngram_shingles(a or "", n), ngram_shingles(b or "", n))


def tfidf_cosine(
    a_tokens: Sequence[str],
    b_tokens: Sequence[str],
    idf: dict[str, float],
    default_idf: float = 1.0,
) -> float:
    """Cosine between TF-IDF-weighted token multisets.

    ``idf`` maps token -> idf weight; unseen tokens fall back to
    ``default_idf`` (treat rare-as-informative). Fitted corpus-wide via a
    groupby(token).count() pass (stages.scoring.fit_idf).
    """
    if not a_tokens or not b_tokens:
        return 1.0 if not a_tokens and not b_tokens else 0.0

    def vec(tokens: Sequence[str]) -> dict[str, float]:
        tf: dict[str, int] = {}
        for t in tokens:
            tf[t] = tf.get(t, 0) + 1
        return {t: c * idf.get(t, default_idf) for t, c in tf.items()}

    va, vb = vec(a_tokens), vec(b_tokens)
    dot = sum(w * vb[t] for t, w in va.items() if t in vb)
    na = math.sqrt(sum(w * w for w in va.values()))
    nb = math.sqrt(sum(w * w for w in vb.values()))
    if na == 0.0 or nb == 0.0:
        return 0.0
    return dot / (na * nb)


# --------------------------------------------------------------------------
# numeric / exact features
# --------------------------------------------------------------------------


def numeric_closeness(a: Optional[float], b: Optional[float]) -> float:
    """1 at equality, decaying with relative difference; 0.5 when either
    side is missing (uninformative), matching the reference's
    never-fabricate stance (Amazon/prompt.py:23-39)."""
    if a is None or b is None:
        return 0.5
    denom = max(abs(a), abs(b), 1e-9)
    return max(0.0, 1.0 - abs(a - b) / denom)


def exact_or_missing(a: Optional[str], b: Optional[str]) -> float:
    """1 exact match, 0 mismatch, 0.5 either missing."""
    if not a or not b:
        return 0.5
    return 1.0 if a == b else 0.0
