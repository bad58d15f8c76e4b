"""Batched (numpy-vectorized-across-pairs) edit-similarity kernels.

Numerically identical to the scalar kernels in ``similarity.py`` (same
algorithms, same float op order) — property-tested equal. The scorer's
per-batch hot loop hands the non-gated, non-memoized pair population to
these in one call instead of per-pair Python (VERDICT r01 item 6).

Vectorization strategy:
- strings are encoded once per batch as codepoint matrices (uint8 when the
  batch is Latin-1-pure — the common case for normalized names — else
  uint32), 0-padded; NUL never appears in normalized text;
- pairs are processed sorted by length descending, so position loops touch
  a shrinking *prefix* of the batch: total work is O(sum(len) x Lmax), not
  O(N x Lmax^2).
"""

from __future__ import annotations

import numpy as np

_U64_ONE = np.uint64(1)
_U64_MAX = np.uint64(0xFFFFFFFFFFFFFFFF)


def encode_pair_batch(
    a_strs: list[str], b_strs: list[str], max_len: int = 64
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """two string lists -> (A, la, B, lb) codepoint matrices of equal width.

    dtype is uint8 when every char fits Latin-1, else uint32.
    """
    n = len(a_strs)
    la = np.fromiter((min(len(s), max_len) for s in a_strs), dtype=np.int64, count=n)
    lb = np.fromiter((min(len(s), max_len) for s in b_strs), dtype=np.int64, count=n)
    lmax = max(1, int(la.max()) if n else 1, int(lb.max()) if n else 1)
    A32 = np.zeros((n, lmax), dtype=np.uint32)
    B32 = np.zeros((n, lmax), dtype=np.uint32)
    for i, s in enumerate(a_strs):
        li = la[i]
        if li:
            A32[i, :li] = np.frombuffer(s[:li].encode("utf-32-le"), dtype=np.uint32)
    for i, s in enumerate(b_strs):
        li = lb[i]
        if li:
            B32[i, :li] = np.frombuffer(s[:li].encode("utf-32-le"), dtype=np.uint32)
    if (A32 < 256).all() and (B32 < 256).all():
        return A32.astype(np.uint8), la, B32.astype(np.uint8), lb
    return A32, la, B32, lb


def jaro_winkler_batch(
    a_strs: list[str], b_strs: list[str], prefix_weight: float = 0.1, max_len: int = 64
) -> np.ndarray:
    """Vectorized ``similarity.jaro_winkler`` over N pairs.

    ``max_len`` is an encoding cap only (the Jaro recurrence has no
    64-lane limit, unlike Myers); pass a large value for uncapped fields.
    """
    n = len(a_strs)
    if n == 0:
        return np.empty(0)
    A, la, B, lb = encode_pair_batch(a_strs, b_strs, max_len)
    L = A.shape[1]

    # process longest-first so the per-position loop scans a shrinking prefix
    order = np.argsort(-la, kind="stable")
    A, B, la, lb = A[order], B[order], la[order], lb[order]

    window = np.maximum(np.maximum(la, lb) // 2 - 1, 0)
    matched_a = np.zeros((n, L), dtype=bool)
    matched_b = np.zeros((n, L), dtype=bool)
    jidx = np.arange(L)[None, :]
    # number of rows with la > i (prefix sizes), la sorted descending
    for i in range(int(la.max()) if n else 0):
        k = int(np.searchsorted(-la, -(i + 1), side="right"))
        if k == 0:
            break
        wmax = int(window[:k].max())
        c0 = max(0, i - wmax)
        c1 = min(L, i + wmax + 1)
        lo = np.maximum(0, i - window[:k])[:, None]
        hi = np.minimum(lb[:k], i + window[:k] + 1)[:, None]
        jj = jidx[:, c0:c1]
        cand = (
            (jj >= lo)
            & (jj < hi)
            & ~matched_b[:k, c0:c1]
            & (B[:k, c0:c1] == A[:k, i : i + 1])
        )
        has = cand.any(axis=1)
        j1 = cand.argmax(axis=1) + c0
        rows = np.flatnonzero(has)
        matched_b[rows, j1[rows]] = True
        matched_a[rows, i] = True

    matches = matched_a.sum(axis=1)
    # compact matched chars preserving order (stable sort: matched first)
    order_a = np.argsort(~matched_a, axis=1, kind="stable")
    order_b = np.argsort(~matched_b, axis=1, kind="stable")
    a_m = np.take_along_axis(A, order_a, axis=1)
    b_m = np.take_along_axis(B, order_b, axis=1)
    k_mask = jidx < matches[:, None]
    trans = ((a_m != b_m) & k_mask).sum(axis=1)
    t = trans // 2

    with np.errstate(divide="ignore", invalid="ignore"):
        j = (matches / la + matches / lb + (matches - t) / matches) / 3.0
    j = np.where(matches == 0, 0.0, j)

    # Winkler prefix bonus (same guard/op order as the scalar kernel)
    p4 = min(4, L)
    valid = np.arange(p4)[None, :] < np.minimum(np.minimum(la, lb), 4)[:, None]
    eq4 = (A[:, :p4] == B[:, :p4]) & valid
    prefix = np.cumprod(eq4, axis=1).sum(axis=1)
    jw = np.where(j > 0.7, j + prefix * prefix_weight * (1.0 - j), j)
    jw = np.where((la == 0) & (lb == 0), 1.0, jw)

    out = np.empty(n)
    out[order] = jw
    return out


def _myers_batch(A: np.ndarray, la: np.ndarray, B: np.ndarray, lb: np.ndarray) -> np.ndarray:
    """Vectorized Myers bit-parallel edit distance; requires la <= 64 and
    lb sorted DESCENDING (prefix-active optimization).

    The pattern side is A (the shorter string, as in the scalar kernel);
    identical update recurrence on uint64 lanes.
    """
    n = A.shape[0]
    # per-batch codepoint vocabulary of the pattern side
    codes, inv = np.unique(A, return_inverse=True)
    inv = inv.reshape(A.shape)
    pm = np.zeros((n, len(codes)), dtype=np.uint64)
    rows = np.arange(n)
    for i in range(A.shape[1]):
        active = i < la
        r = rows[active]
        np.bitwise_or.at(pm, (r, inv[active, i]), _U64_ONE << np.uint64(i))

    mask = np.where(la >= 64, _U64_MAX, (_U64_ONE << la.astype(np.uint64)) - _U64_ONE)
    high = _U64_ONE << np.maximum(la - 1, 0).astype(np.uint64)
    pv = mask.copy()
    mv = np.zeros(n, dtype=np.uint64)
    score = la.astype(np.int64).copy()

    for i in range(B.shape[1]):
        k = int(np.searchsorted(-lb, -(i + 1), side="right"))
        if k == 0:
            break
        bi = B[:k, i]
        idx = np.searchsorted(codes, bi)
        idx = np.minimum(idx, len(codes) - 1)
        eq = np.where(codes[idx] == bi, pm[rows[:k], idx], np.uint64(0))
        pvk = pv[:k]
        mvk = mv[:k]
        xv = eq | mvk
        with np.errstate(over="ignore"):
            xh = (((eq & pvk) + pvk) ^ pvk) | eq
        ph = mvk | ~(xh | pvk)
        mh = pvk & xh
        score[:k] += ((ph & high[:k]) != 0).astype(np.int64)
        score[:k] -= ((mh & high[:k]) != 0).astype(np.int64)
        ph = (ph << _U64_ONE) | _U64_ONE
        mh = mh << _U64_ONE
        pv[:k] = (mh | ~(xv | ph)) & mask[:k]
        mv[:k] = ph & xv
    return score


def levenshtein_ratio_batch(a_strs: list[str], b_strs: list[str]) -> np.ndarray:
    """Vectorized ``similarity.levenshtein_ratio`` over N pairs (strings
    must be <= 64 chars, the scorer's EDIT_KERNEL_CAP)."""
    n = len(a_strs)
    if n == 0:
        return np.empty(0)
    A, la, B, lb = encode_pair_batch(a_strs, b_strs)

    # pattern = shorter side (scalar kernel swaps the same way)
    swap = la > lb
    A2 = np.where(swap[:, None], B, A)
    B2 = np.where(swap[:, None], A, B)
    la2 = np.where(swap, lb, la)
    lb2 = np.where(swap, la, lb)

    # longest-text-first so the Myers loop scans a shrinking prefix
    order = np.argsort(-lb2, kind="stable")
    dist = _myers_batch(A2[order], la2[order], B2[order], lb2[order])
    undone = np.empty(n, dtype=np.int64)
    undone[order] = dist
    dist = undone

    equal = (la == lb) & (A == B).all(axis=1)
    maxlen = np.maximum(la, lb)
    with np.errstate(divide="ignore", invalid="ignore"):
        ratio = 1.0 - dist / maxlen
    both_empty = maxlen == 0
    ratio = np.where(equal | both_empty, 1.0, ratio)
    # one-empty: exact zero, as in the scalar kernel
    return np.where((la == 0) ^ (lb == 0), 0.0, ratio)
