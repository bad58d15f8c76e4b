"""Leakage-safe dataset splitting: train/valid/test assignment that never
separates members of the same entity/near-dup cluster.

The classic training-data leak in entity matching / dedup corpora is a
near-duplicate pair straddling train and test (the reference's corpora ship
pre-split pair files for exactly this reason — e.g. DeepMather/*/ train.csv
vs test.csv carry disjoint pair sets). At 100 TB the only split mechanism
that survives is a PURE FUNCTION of the cluster key: no shuffle, no global
state, embarrassingly parallel, and trivially stable under re-runs,
incremental folds, and resharding — every member of a cluster hashes to the
same split because the hash sees only the cluster key.

Two keyed paths:
- integer keys: a multiplicative Fibonacci hash on uint64 with natural
  mod-2^64 wraparound. Deliberately SQL-reproducible (DuckDB HUGEINT:
  ``(key * 11400714819323198485) % 18446744073709551616``), so the whole
  operator is oracle-checkable end to end.
- string keys: FNV-1a 64 over Unicode CODE POINTS, vectorized by character
  position (no per-row Python). Also SQL-reproducible — DuckDB::
    list_reduce(list_prepend(CAST(14695981039346656037 AS UBIGINT),
      list_transform(regexp_extract_all(s, '.'), c -> CAST(unicode(c) AS UBIGINT))),
      (h, cp) -> CAST((CAST(xor(h, cp) AS HUGEINT) * 1099511628211)
                      % 18446744073709551616 AS UBIGINT))
  (verified equal incl. non-ASCII), so string-keyed splits/samples/mixes are
  oracle-checkable end to end too.
- any other dtype: ``pd.util.hash_pandas_object`` (deterministic across
  processes/workers — fixed default key), not SQL-expressible; queries over
  such keys get the rows-only check.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

# 0x9E3779B97F4A7C15 — 2^64 / golden ratio; SQL literal 11400714819323198485
_FIB = np.uint64(0x9E3779B97F4A7C15)
_RESOLUTION = 1_000_000


def split_boundaries(weights: dict[str, float]) -> tuple[list[str], np.ndarray]:
    """Cumulative integer boundaries over [0, _RESOLUTION) in dict order.

    Buckets are half-open: split i covers ``[bound[i-1], bound[i])``; the
    last boundary is forced to _RESOLUTION so rounding never drops rows.
    """
    names = list(weights)
    w = np.asarray([float(weights[n]) for n in names], dtype=np.float64)
    if (w < 0).any() or w.sum() <= 0:
        raise ValueError(f"weights must be non-negative and sum > 0: {weights}")
    cum = np.floor(np.cumsum(w / w.sum()) * _RESOLUTION).astype(np.int64)
    cum[-1] = _RESOLUTION
    return names, cum


def _hash_int_keys(keys: np.ndarray, salt: int) -> np.ndarray:
    """(key + salt) * FIB mod 2^64, then mod _RESOLUTION — matches the SQL
    HUGEINT expression exactly for non-negative int64 keys."""
    with np.errstate(over="ignore"):
        h = (keys.astype(np.uint64) + np.uint64(salt)) * _FIB
    return (h % np.uint64(_RESOLUTION)).astype(np.int64)


# FNV-1a 64-bit (public domain, Fowler/Noll/Vo)
_FNV_OFFSET = np.uint64(14695981039346656037)
_FNV_PRIME = np.uint64(1099511628211)


def _fnv1a_str(strs: np.ndarray) -> np.ndarray:
    """Vectorized FNV-1a over Unicode code points (uint64 per string).

    ``astype('U')`` packs the batch into one fixed-width UCS-4 matrix; the
    fold loops over CHARACTER POSITIONS (bounded by the longest key, ~tens)
    with every position vectorized across all rows — no per-row Python.
    Code-point basis (not UTF-8 bytes) so DuckDB ``unicode(c)`` reproduces
    it exactly (see module docstring) for the oracle.
    """
    n = len(strs)
    u = strs.astype("U")
    if u.dtype.itemsize == 0:  # all-empty batch
        return np.full(n, _FNV_OFFSET, np.uint64)
    mat = u.view(np.uint32).reshape(n, -1).astype(np.uint64)
    h = np.full(n, _FNV_OFFSET, np.uint64)
    with np.errstate(over="ignore"):
        for j in range(mat.shape[1]):
            cp = mat[:, j]
            m = cp != 0  # NUL = padding; never in real keys
            h[m] = (h[m] ^ cp[m]) * _FNV_PRIME
    return h


def _hash_frac(col: pa.ChunkedArray, salt: int) -> np.ndarray:
    """Column -> deterministic position in [0, _RESOLUTION): the
    SQL-reproducible multiplicative hash for integer keys, the
    SQL-reproducible FNV-1a code-point hash for string keys, pandas
    siphash for everything else."""
    if pa.types.is_integer(col.type):
        keys = col.combine_chunks().to_numpy(zero_copy_only=False)
        return _hash_int_keys(keys, salt)
    if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
        s = pd.Series(col.to_pandas()).fillna("")
        if salt:
            s = s + f"|{salt}"
        h = _fnv1a_str(s.to_numpy(dtype=object))
        return (h % np.uint64(_RESOLUTION)).astype(np.int64)
    s = pd.Series(col.to_pandas())
    if salt:
        s = s.astype(str) + f"|{salt}"
    h = pd.util.hash_pandas_object(s, index=False)
    return (h.to_numpy(dtype=np.uint64) % np.uint64(_RESOLUTION)).astype(np.int64)


def assign_splits(
    ds,
    cluster_col: str,
    weights: dict[str, float] | None = None,
    out_col: str = "split",
    salt: int = 0,
):
    """Add ``out_col`` with a deterministic split name per row, constant
    within each ``cluster_col`` value (leakage-safe by construction).

    Pure ``map_batches`` — ZERO shuffle at any scale; the groupby-free
    design is the point (splitting 10^12 docs must not be an all-to-all).
    Integer cluster keys use the SQL-reproducible multiplicative hash;
    other dtypes fall back to the deterministic pandas siphash.
    """
    weights = weights or {"train": 0.8, "valid": 0.1, "test": 0.1}
    names, bounds = split_boundaries(weights)
    names_arr = np.asarray(names, dtype=object)

    def add_split(t: pa.Table) -> pa.Table:
        frac = _hash_frac(t.column(cluster_col), salt)
        idx = np.searchsorted(bounds, frac, side="right")
        return t.append_column(out_col, pa.array(names_arr[idx], pa.string()))

    return ds.map_batches(add_split, batch_format="pyarrow")


def deterministic_sample(
    ds,
    key_col: str,
    fraction: float,
    salt: int = 0,
):
    """Reproducible row sampling: keep rows whose key hashes below
    ``fraction`` of the hash space. Zero shuffle, resharding-stable, and
    REPEATABLE — the same (key, salt) always makes the same keep/drop
    decision, so a resumed or re-run 100 TB job samples identically, and
    sampling by a CLUSTER key keeps near-dup groups intact (the
    leakage-safe property applied to subsampling). Integer keys use the
    SQL-reproducible hash (``assign_splits``); others the pandas siphash.
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1]: {fraction}")
    cut = int(round(fraction * _RESOLUTION))

    def keep(t: pa.Table) -> pa.Table:
        frac = _hash_frac(t.column(key_col), salt)
        return t.filter(pa.array(frac < cut))

    return ds.map_batches(keep, batch_format="pyarrow")


def stratified_sample(
    ds,
    key_col: str,
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    salt: int = 0,
):
    """Per-stratum deterministic sampling — the training-data MIXTURE
    primitive: re-weight sources/languages/quality tiers by keeping a
    different hash-space slice per stratum (e.g. ``{"en": 0.3, "de":
    1.0}``), still zero-shuffle and key-reproducible. Strata absent from
    ``fractions`` keep ``default_fraction`` of their rows."""
    for k, v in fractions.items():
        if not 0.0 <= v <= 1.0:
            raise ValueError(f"fraction must be in [0, 1]: {k}={v}")
    cuts = {k: int(round(v * _RESOLUTION)) for k, v in fractions.items()}
    default_cut = int(round(default_fraction * _RESOLUTION))

    def keep(t: pa.Table) -> pa.Table:
        frac = _hash_frac(t.column(key_col), salt)
        strata = pd.Series(t.column(strata_col).to_pandas())
        cut = strata.map(cuts).fillna(default_cut).to_numpy(dtype=np.int64)
        return t.filter(pa.array(frac < cut))

    return ds.map_batches(keep, batch_format="pyarrow")


def mix_corpora(
    sources: list[tuple[str, "object", float]],
    key_col: str = "doc_id",
    salt: int = 0,
    columns: list[str] | None = None,
    tiebreak_cols: tuple[str, ...] = (),
):
    """Deterministic multi-corpus TRAINING MIXTURE: sample each source at
    its own rate, tag provenance, and give the union a reproducible
    interleave order — the data-mixing step every LLM training pipeline
    runs over its source corpora (web / books / code at chosen ratios).

    ``sources`` is ``[(name, dataset, fraction), ...]``. ``key_col`` may
    be integer OR string — both hash SQL-reproducibly (multiplicative /
    FNV-1a code-point, see ``_hash_frac``), so the whole operator has an
    exact oracle either way. Heterogeneous source schemas are supported
    via ``columns``: each source is projected to that shared column set
    (which must include ``key_col``) before the union; with
    ``columns=None`` all sources must already share a schema.

    Reproducible ORDER requires unique sort keys: the final sort is
    ``(mix_key, source, key_col, *tiebreak_cols)``. If ``key_col`` can
    repeat within one source (e.g. many chunks per doc), pass
    ``tiebreak_cols`` naming column(s) that make rows unique per source —
    otherwise tied rows land in nondeterministic relative order across
    runs/partitionings (the set of rows is still deterministic).

    Mechanics — all deterministic, resharding-stable, resumable:
    - per-source ``deterministic_sample`` at ``fraction`` with a
      per-source salt (zero shuffle; the same key always makes the same
      keep/drop decision, so a re-run 100 TB mix is identical);
    - a ``source`` provenance tag and a ``mix_key`` interleave position
      (hash of the key under a different per-source salt — sources
      interleave uniformly rather than concatenating);
    - ONE global sort on the key tuple above = the reproducible shuffled
      training order. The sort is the operator's single all-to-all, and
      it is exactly the "deterministic shuffle" a training-data run
      needs anyway.
    """
    if not sources:
        raise ValueError("mix_corpora needs at least one source")
    names = [n for n, _, _ in sources]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate source names: {names}")
    if columns is not None and key_col not in columns:
        raise ValueError(f"columns={columns} must include key_col={key_col!r}")

    parts = []
    for i, (name, ds, fraction) in enumerate(sources):
        if columns is not None:
            ds = ds.select_columns(list(columns))
        kept = deterministic_sample(ds, key_col, fraction, salt=salt + i)

        def tag(t: pa.Table, name=name, i=i) -> pa.Table:
            # interleave salt offset is a large odd constant so the
            # mix_key stream is unrelated to the sampling decision
            mk = _hash_frac(t.column(key_col), salt + 1_000_003 + i)
            out = t.append_column(
                "source", pa.array([name] * t.num_rows, pa.string())
            )
            return out.append_column("mix_key", pa.array(mk, pa.int64()))

        parts.append(kept.map_batches(tag, batch_format="pyarrow"))

    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out.sort(["mix_key", "source", key_col, *tiebreak_cols])


def weighted_sample(
    ds,
    key_col: str,
    weight_col: str,
    rate_num: int,
    rate_den: int,
    salt: int = 0,
):
    """Deterministic WEIGHT-PROPORTIONAL sampling: keep a row with
    probability ``min(1, weight * rate_num / rate_den)`` — the standard
    mixture-construction primitive (sample documents proportionally to
    token count / quality so longer or better docs are over-represented),
    with :func:`deterministic_sample`'s guarantees: zero shuffle,
    resharding-stable, repeatable per (key, salt).

    The keep decision is PURE INTEGER math, so the SQL oracle is
    bit-identical: keep iff ``h * rate_den < weight * rate_num * 1e6``
    with ``h = hash_frac(key) in [0, 1e6)``. The ``min(1, ...)`` cap is
    implicit (when ``weight * rate_num >= rate_den`` the RHS clears every
    possible h); weights <= 0 never sample. ``weight_col`` must be an
    integer column — float weights would put an ulp on the threshold
    boundary and break cross-engine determinism; scale floats to integer
    millionths upstream instead.
    """
    if rate_num < 0 or rate_den <= 0:
        raise ValueError(f"need rate_num >= 0 and rate_den > 0: {rate_num}/{rate_den}")

    def keep(t: pa.Table) -> pa.Table:
        if not pa.types.is_integer(t.schema.field(weight_col).type):
            raise TypeError(
                f"weighted_sample needs an integer weight column, got "
                f"{t.schema.field(weight_col).type} for {weight_col!r}"
            )
        h = _hash_frac(t.column(key_col), salt)
        w = t.column(weight_col).combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        return t.filter(pa.array(h * rate_den < w * rate_num * _RESOLUTION))

    return ds.map_batches(keep, batch_format="pyarrow")
