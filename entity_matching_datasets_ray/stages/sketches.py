"""Distributed cardinality sketches.

KMV (k-minimum-values / bottom-k) distinct-count estimation: hash every
key with the SQL-reproducible multiplicative hash, keep the k smallest
DISTINCT hash values, estimate |D| ~= (k-1) * 2^64 / kth_min. Unlike
HyperLogLog the sketch state is a plain sorted id list, the estimator is
a closed-form expression of the k-th order statistic, and — because the
hash is the documented Fibonacci multiplier on uint64 — the WHOLE
operator (hash, bottom-k, estimate) is reproducible in ANSI SQL, so even
an *approximate* operator gets an exact oracle.

Scale shape: per-batch bottom-k (each batch emits <= k rows of uint64)
-> global sort + limit k (a k-row all-to-all, never the corpus) ->
one-row estimate. Merging per-batch bottom-k sets is exactly the KMV
union operation, so the result is independent of partitioning.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

# 2^64 / golden ratio — the same SQL-reproducible multiplier as
# stages/splits.py (HUGEINT literal 11400714819323198485)
_FIB = np.uint64(0x9E3779B97F4A7C15)
_TWO64 = float(2**64)


def kmv_sketch(ds, key_col: str, k: int = 1024, allow_any_dtype: bool = False):
    """Dataset of the k smallest distinct key hashes (uint64, ascending).

    ``allow_any_dtype=True`` hashes non-integer keys with
    ``hash_pandas_object`` (deterministic cross-process) — NOT
    SQL-reproducible, for internal planning probes (e.g. the semi/anti
    broadcastability check), never for oracle-checked queries."""

    def bottom_k(df: pd.DataFrame) -> pd.DataFrame:
        keys = df[key_col].to_numpy()
        if np.issubdtype(keys.dtype, np.integer):
            with np.errstate(over="ignore"):
                h = keys.astype(np.uint64) * _FIB
        elif allow_any_dtype:
            h = pd.util.hash_pandas_object(df[key_col], index=False).to_numpy(
                dtype=np.uint64
            )
        else:
            raise TypeError(
                f"kmv_sketch needs an integer key for SQL-reproducible "
                f"hashing; got {keys.dtype} (hash externally first, or pass "
                f"allow_any_dtype=True for planning-only estimates)"
            )
        h = np.unique(h)  # sorted distinct
        return pd.DataFrame({"hv": h[:k]})

    from ray.data.aggregate import Count

    # the same key (hence hash) can appear in many batches; a plain
    # sort+limit would let duplicates occupy bottom-k slots and bias the
    # k-th order statistic, so dedup through a tiny groupby first
    # (<= k rows per batch enter the shuffle)
    return (
        ds.select_columns([key_col])
        # whole-BLOCK batches: the default 1024-row batch equals k, which
        # would make the per-batch bottom-k a no-op combiner
        .map_batches(bottom_k, batch_format="pandas", batch_size=None)
        .groupby("hv")
        .aggregate(Count(alias_name="_n"))
        .select_columns(["hv"])
        .sort("hv")
        .limit(k)
    )


def kmv_distinct(ds, key_col: str, k: int = 1024, allow_any_dtype: bool = False):
    """One-row Dataset: (n_distinct_est int64, k_used int64).

    If fewer than k distinct hashes exist the count is EXACT (the sketch
    saw every distinct value); otherwise the standard KMV estimator
    ``(k-1) * 2^64 / kth_min`` — float64 in the same operation order as
    the SQL oracle, so the estimate is bit-identical, not just close.
    """

    def estimate(df: pd.DataFrame) -> pd.DataFrame:
        n = len(df)
        if n == 0:
            return pd.DataFrame({"n_distinct_est": pd.array([0], dtype="int64"),
                                 "k_used": pd.array([0], dtype="int64")})
        kth = float(df["hv"].max())
        if n < k or kth == 0.0:
            # kth == 0 only when every bottom-k hash is 0 (k == 1 and a
            # key hashing to 0): one distinct hash seen -> exact count
            est = n
        else:
            est = int(np.floor((k - 1) * _TWO64 / kth))
        return pd.DataFrame({"n_distinct_est": pd.array([est], dtype="int64"),
                             "k_used": pd.array([n], dtype="int64")})

    # the sketch is <= k rows; a single-partition pandas pass is exact
    return kmv_sketch(ds, key_col, k, allow_any_dtype=allow_any_dtype).repartition(
        1
    ).map_batches(estimate, batch_format="pandas", batch_size=None)
