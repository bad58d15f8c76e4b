"""Deterministic hashing primitives: stable 64-bit hashes, MinHash, SimHash.

Everything here is seed-deterministic and independent of
``PYTHONHASHSEED`` (we never use builtin ``hash``). MinHash permutation
parameters are a pure function of the config seed, so signatures computed
in different workers / sessions agree — required for reproducible LSH
blocking (SURVEY.md §2.4 J2) and for the content-addressed dedup that
replaces the reference's md5 pair cache
(/root/reference wdc.zip -> wdc/computers/prompt.py:13-20,169-176).
"""

from __future__ import annotations

import hashlib

import numpy as np

_MERSENNE_61 = (1 << 61) - 1
_MAX64 = np.uint64(0xFFFFFFFFFFFFFFFF)


def hash64(s: str) -> int:
    """Stable 64-bit hash of a string (blake2b, 8-byte digest)."""
    return int.from_bytes(hashlib.blake2b(s.encode("utf-8"), digest_size=8).digest(), "big")


def hash_bytes64(b: bytes) -> int:
    return int.from_bytes(hashlib.blake2b(b, digest_size=8).digest(), "big")


def content_hash(*parts: str) -> str:
    """Stable hex content hash for deterministic ids / cache keys.

    Replaces the reference's ``md5(s1||s2)`` cache key
    (wdc/computers/prompt.py:169) with an order-independent-capable
    variant: callers pass parts already ordered (e.g. ``min_id, max_id``).
    """
    h = hashlib.blake2b(digest_size=16)
    for p in parts:
        h.update(p.encode("utf-8"))
        h.update(b"\x1f")
    return h.hexdigest()


def token_hashes(tokens: list[str]) -> np.ndarray:
    """uint64 hash per token (vector)."""
    if not tokens:
        return np.empty(0, dtype=np.uint64)
    return np.fromiter((hash64(t) for t in tokens), dtype=np.uint64, count=len(tokens))


def make_perm_params(num_perm: int, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    """(a, b) universal-hash parameters over the Mersenne prime 2^61-1."""
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE_61, size=num_perm, dtype=np.uint64)
    b = rng.randint(0, _MERSENNE_61, size=num_perm, dtype=np.uint64)
    return a, b


def minhash_signature(hashes: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """MinHash signature: min over tokens of (a*x + b) mod p, per permutation.

    ``hashes``: uint64[n_tokens]; returns uint64[num_perm]. Empty input ->
    all-max sentinel signature (never collides with real docs in a band).
    """
    if hashes.size == 0:
        return np.full(a.shape[0], _MAX64, dtype=np.uint64)
    # uint64 wrap-around multiply-add: deterministic, uniform enough for
    # blocking (same scheme as minhash_signature_matrix — keep in sync).
    with np.errstate(over="ignore"):
        vals = (a[:, None] * hashes[None, :]) + b[:, None]
    return vals.min(axis=1)


def minhash_signature_matrix(
    hash_lists: list[np.ndarray], a: np.ndarray, b: np.ndarray
) -> np.ndarray:
    """Batched signatures: one row per document — a thin adapter that
    flattens the per-doc lists and delegates to the single segmented-min
    kernel (``minhash_signature_flat``), so the two entry points can
    never drift apart (r5 code-review)."""
    n = len(hash_lists)
    lens = np.fromiter((h.size for h in hash_lists), dtype=np.int64, count=n)
    if n == 0 or not (lens > 0).any():
        return np.full((n, a.shape[0]), _MAX64, dtype=np.uint64)
    flat = np.concatenate([h for h in hash_lists if h.size])
    return minhash_signature_flat(flat, lens, a, b)


def minhash_signature_flat(
    flat: np.ndarray,
    lens: np.ndarray,
    a: np.ndarray,
    b: np.ndarray,
    max_chunk_bytes: int = 1 << 26,
) -> np.ndarray:
    """Segmented-min MinHash kernel over a pre-flattened (token-hash,
    per-doc-count) layout. ``flat`` must be grouped by doc in ``lens``
    order. Duplicate hashes within a doc are fine: min over a multiset
    equals min over its set, so signatures are bit-identical to the
    set-based path.

    Vectorized with uint64 overflow-tolerant arithmetic (a*x+b computed
    mod 2^64 — universal-hash quality is preserved well enough for
    blocking; verification is exact downstream). The (num_perm x tokens)
    multiply-add transient is bounded at ``max_chunk_bytes`` (64 MiB) by
    splitting the batch at DOC boundaries — an unchunked pass over a
    document batch with millions of total shingles would transiently
    allocate gigabytes (r5 code-review). Per-doc mins are independent, so
    chunking is bit-identical to the one-shot pass.
    """
    lens = np.asarray(lens, dtype=np.int64)
    n = len(lens)
    num_perm = a.shape[0]
    out = np.full((n, num_perm), _MAX64, dtype=np.uint64)
    nz_idx = np.flatnonzero(lens > 0)
    if nz_idx.size == 0:
        return out
    nz_lens = lens[nz_idx]
    ends = np.cumsum(nz_lens)
    starts = ends - nz_lens
    chunk_tokens = max(1, int(max_chunk_bytes // (num_perm * 8)))
    d0 = 0
    while d0 < nz_idx.size:
        # include docs until the token budget is reached (always >= 1 doc;
        # a single huge doc makes one over-budget chunk — unavoidable)
        d1 = int(np.searchsorted(ends, starts[d0] + chunk_tokens, side="left")) + 1
        d1 = min(max(d1, d0 + 1), nz_idx.size)
        seg = flat[starts[d0] : ends[d1 - 1]]
        with np.errstate(over="ignore"):
            vals = (a[:, None] * seg[None, :]) + b[:, None]
        rel_starts = starts[d0:d1] - starts[d0]
        out[nz_idx[d0:d1]] = np.minimum.reduceat(vals, rel_starts, axis=1).T
        d0 = d1
    return out


# 3-gram shingles packed 21 bits/codepoint (max Unicode 0x10FFFF < 2^21).
# Length is recoverable from the value range: 1-char < 2^21, 2-char
# < 2^42, 3-char >= 2^42 (the leading codepoint is never 0) — matching
# ngram_shingles' short-string edge ({s} when 0 < len(s) < n).
_SHIFT21 = np.uint64(21)
_SHIFT42 = np.uint64(42)


def _unpack_shingle(packed: int) -> str:
    if packed < (1 << 21):
        return chr(packed)
    if packed < (1 << 42):
        return chr(packed >> 21) + chr(packed & 0x1FFFFF)
    return chr(packed >> 42) + chr((packed >> 21) & 0x1FFFFF) + chr(packed & 0x1FFFFF)


def batch_shingle_hashes(
    names: list, memo: dict
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized char-3-gram shingle hashing for a whole batch of
    (already-normalized, NUL-free) strings: ``(flat uint64 hashes grouped
    by row, per-row counts)`` — the input layout of
    ``minhash_signature_flat``.

    The batch packs into one UCS-4 codepoint matrix; 3-gram windows are
    three shifted slices OR-ed into packed uint64 ids; only the DISTINCT
    packed grams in the batch hit blake2b (``hash64`` of the unpacked
    string — same values as the scalar path), memoized across batches.
    Replaces the per-name ``BandEmitter._hashes`` loop, which profiled as
    ~70% of fused key emission.
    """
    n = len(names)
    arr = np.array([nm or "" for nm in names], dtype="U")
    width = arr.dtype.itemsize // 4
    if width == 0:
        return np.empty(0, np.uint64), np.zeros(n, dtype=np.int64)
    cp = arr.view(np.uint32).reshape(n, width).astype(np.uint64)
    clen = (cp != 0).sum(axis=1)
    if width >= 3:
        grams_m = (cp[:, :-2] << _SHIFT42) | (cp[:, 1:-1] << _SHIFT21) | cp[:, 2:]
        valid = (cp[:, 2:] != 0).ravel()
        grams = grams_m.ravel()[valid]
        rows = np.repeat(np.arange(n, dtype=np.int64), width - 2)[valid]
    else:
        grams = np.empty(0, np.uint64)
        rows = np.empty(0, np.int64)
    short = np.flatnonzero((clen > 0) & (clen < 3))
    if short.size:
        packed_short = np.where(
            clen[short] == 1, cp[short, 0], (cp[short, 0] << _SHIFT21) | cp[short, 1]
        )
        grams = np.concatenate([grams, packed_short])
        rows = np.concatenate([rows, short])
        order = np.argsort(rows, kind="stable")
        rows = rows[order]
        grams = grams[order]
    uniq, inv = np.unique(grams, return_inverse=True)
    lut = np.empty(len(uniq), np.uint64)
    for j, g in enumerate(uniq.tolist()):
        h = memo.get(g)
        if h is None:
            h = hash64(_unpack_shingle(g))
            if len(memo) >= 2_000_000:
                memo.clear()
            memo[g] = h
        lut[j] = h
    flat = lut[inv] if len(grams) else np.empty(0, np.uint64)
    return flat, np.bincount(rows, minlength=n).astype(np.int64)


# splitmix64 constants — public-domain mixer (Steele et al., "Fast
# Splittable Pseudorandom Number Generators", OOPSLA'14).
_SM64_GAMMA = np.uint64(0x9E3779B97F4A7C15)
_SM64_M1 = np.uint64(0xBF58476D1CE4E5B9)
_SM64_M2 = np.uint64(0x94D049BB133111EB)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    with np.errstate(over="ignore"):
        x = (x ^ (x >> np.uint64(30))) * _SM64_M1
        x = (x ^ (x >> np.uint64(27))) * _SM64_M2
    return x ^ (x >> np.uint64(31))


def band_key_matrix(sigs: np.ndarray, num_bands: int, rows_per_band: int) -> np.ndarray:
    """Vectorized LSH band keys: uint64[n_docs, num_bands].

    Chains each band's ``rows_per_band`` signature values through a
    splitmix64-style combine (seeded by the band index), fully vectorized
    over (docs x bands). Key VALUES differ from the retired scalar blake2b
    band_key — only the grouping matters for blocking (identical band
    bytes -> identical key; distinct bytes collide w.p. ~2^-64), and every
    internal banding consumer uses this matrix form, so groupings agree
    everywhere.
    """
    n = sigs.shape[0]
    # tolerate num_perm not divisible by num_bands exactly like the scalar
    # band_key did (each band slices lo:hi; tail permutations are unused)
    bands = sigs[:, : num_bands * rows_per_band].reshape(n, num_bands, rows_per_band)
    band_idx = np.arange(num_bands, dtype=np.uint64)
    with np.errstate(over="ignore"):
        h = _splitmix64(band_idx * _SM64_GAMMA + np.uint64(1))[None, :]
        h = np.broadcast_to(h, (n, num_bands)).copy()
        for j in range(rows_per_band):
            h = _splitmix64(h ^ bands[:, :, j])
    return h


def simhash64(hashes: np.ndarray, weights: np.ndarray | None = None) -> int:
    """64-bit SimHash over token hashes (optionally weighted)."""
    if hashes.size == 0:
        return 0
    bits = ((hashes[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
        np.float64
    )
    if weights is None:
        weights = np.ones(hashes.size)
    acc = ((bits * 2.0 - 1.0) * weights[:, None]).sum(axis=0)
    out = 0
    for bit in range(64):
        if acc[bit] > 0:
            out |= 1 << bit
    return out


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def pandas_bucket(obj, num_buckets: int) -> np.ndarray:
    """Deterministic int32 bucket ids for a pandas Series OR DataFrame
    (multi-key: one combined row hash) — the shared two-level-grouping
    hash used by fusion / grouped_collect / mutual-best. Vectorized
    (``pd.util.hash_pandas_object``; stable cross-process)."""
    import pandas as pd

    h = pd.util.hash_pandas_object(obj, index=False)
    return (h.to_numpy(dtype=np.uint64) % np.uint64(num_buckets)).astype(np.int32)


_BLOOM_SALT = np.uint64(0xA5A5_5A5A_DEAD_BEEF)


def bloom_key_hashes(series) -> np.ndarray:
    """Canonical uint64 hash per key for Bloom membership tests.

    Both sides of a bloom join MUST hash logically-equal keys to the same
    value or a true member can bloom-test negative (a correctness bug, not
    a performance one). Canonicalization before hashing: integer dtypes ->
    int64, float dtypes -> float64 (the int32/int64 join-key gotcha, again);
    everything else hashes its pandas representation as-is. ``series`` must
    be NULL-free — callers hash the valid subset only.
    """
    import pandas as pd

    s = series
    if pd.api.types.is_integer_dtype(s.dtype):
        s = s.astype("int64")
    elif pd.api.types.is_float_dtype(s.dtype):
        s = s.astype("float64")
    h = pd.util.hash_pandas_object(s, index=False).to_numpy(dtype=np.uint64)
    return _splitmix64(h)


def bloom_bit_positions(h: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """(n, k) bit positions via double hashing (Kirsch-Mitzenmacher:
    pos_j = h1 + j*h2 mod m needs only two independent hashes for k
    probes). ``h`` is the output of ``bloom_key_hashes``."""
    with np.errstate(over="ignore"):
        h1 = h
        h2 = _splitmix64(h ^ _BLOOM_SALT) | np.uint64(1)
        j = np.arange(k, dtype=np.uint64)[None, :]
        pos = h1[:, None] + j * h2[:, None]
    return (pos % np.uint64(m_bits)).astype(np.int64)
