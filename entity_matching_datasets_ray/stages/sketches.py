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


def heavy_hitters(ds, text_col: str = "text", min_frac_num: int = 1,
                  min_frac_den: int = 1000, lowercase: bool = True,
                  safety: int = 2):
    """EXACT heavy hitters at unbounded vocabulary: every token whose
    global occurrence count satisfies ``cnt * min_frac_den >= min_frac_num
    * N`` (N = total token count), with its exact count.

    ``vocab_topk`` shuffles one row per DISTINCT token per batch through a
    ``groupby`` — at 100 TB the vocabulary itself (urls, ids, typos) is
    billions of rows and that groupby becomes the bottleneck. This is the
    classic two-pass exact plan whose shuffle volume is bounded by the
    THRESHOLD, not the vocabulary:

    pass 1 — candidates, zero shuffle: each batch keeps tokens with
      ``batch_cnt * C > batch_total`` (C = ceil(safety*den/num)), <= C
      survivors per batch plus one batch-total row, straight to the
      driver. Completeness is a pigeonhole fact: if a token's GLOBAL
      count >= (num/den)*N but NO batch kept it, then summing the
      per-batch bounds gives cnt <= N/C <= (num/den)*N/safety < cnt —
      contradiction (safety > 1). So the union of batch survivors
      contains every global heavy hitter; it also contains batch-local
      noise, which pass 2 removes.
    pass 2 — exact recount: broadcast the candidate set (``ray.put``,
      read once per actor), count ONLY candidates per batch (one row per
      candidate per batch crosses the shuffle), ``groupby(token).sum``,
      keep ``cnt * den >= num * N``. Exact membership AND exact counts.

    The threshold compare is pure INTEGER math on both sides (``cnt*den
    >= num*N``) — no float ceil, so the SQL oracle (``HAVING count(*) *
    den >= num * (SELECT n ...)``) is bit-identical by construction.
    Tokenization matches ``vocab_topk``: optional lowercase, whitespace
    split, empties dropped. Deterministic order: cnt desc, token asc.
    """
    import math

    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    if min_frac_num <= 0 or min_frac_den <= 0:
        raise ValueError("min_frac must be a positive fraction")
    if safety <= 1:
        # the pigeonhole completeness proof needs N/C STRICTLY below the
        # threshold; safety == 1 lets a globally-heavy token hide from
        # every batch filter and the "EXACT" result silently loses rows
        raise ValueError("safety must be > 1 for candidate completeness")
    C = math.ceil(safety * min_frac_den / min_frac_num)

    def tokenize(df: pd.DataFrame) -> pd.Series:
        s = df[text_col].dropna().astype(str)
        if lowercase:
            s = s.str.lower()
        return s.str.split().explode().dropna()

    def candidates(df: pd.DataFrame) -> pd.DataFrame:
        toks = tokenize(df)
        total = len(toks)
        vc = toks.value_counts()
        heavy = vc[vc.to_numpy() * C > total]
        return pd.DataFrame(
            {
                "token": np.concatenate(
                    [heavy.index.to_numpy(dtype=object), [None]]
                ),
                "cnt": np.concatenate([heavy.to_numpy(), [total]]).astype("int64"),
            }
        )

    summ = (
        ds.select_columns([text_col])
        .map_batches(candidates, batch_format="pandas")
        .to_pandas()  # <= (C+1) x num_batches rows — summaries, never tokens
    )
    n_total = int(summ.loc[summ["token"].isna(), "cnt"].sum())
    cand = np.unique(summ.loc[summ["token"].notna(), "token"].to_numpy(dtype=object))
    if n_total == 0 or len(cand) == 0:
        # from_arrow with explicit types: a 0-row from_pandas loses the schema
        return rd.from_arrow(
            pa.table({"token": pa.array([], pa.string()),
                      "cnt": pa.array([], pa.int64())})
        )
    cand_ref = ray.put(cand)

    class RecountCandidates:
        def __init__(self):
            self.cand = pd.Index(ray.get(cand_ref))

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            vc = tokenize(df).value_counts()
            vc = vc[vc.index.isin(self.cand)]
            return pd.DataFrame(
                {"token": vc.index.to_numpy(dtype=object),
                 "cnt": vc.to_numpy("int64")}
            )

    lhs_num, lhs_den = int(min_frac_num), int(min_frac_den)

    def threshold_filter(df: pd.DataFrame) -> pd.DataFrame:
        keep = df["cnt"].to_numpy("int64") * lhs_den >= lhs_num * n_total
        return df[keep]

    return (
        ds.select_columns([text_col])
        .map_batches(RecountCandidates, batch_format="pandas", concurrency=(1, 8))
        .groupby("token")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .map_batches(threshold_filter, batch_format="pandas")
        .sort(["cnt", "token"], descending=[True, False])
    )


def quantile_sketch(ds, value_col: str, qs: tuple[float, ...] = (0.5, 0.9, 0.99),
                    k: int = 4096):
    """Mergeable approximate quantiles with an exactness mode —
    the sketch alternative to ``relational.global_quantiles``.

    ``global_quantiles`` is exact but pays a full global SORT (an
    all-to-all of the corpus). At 100 TB an epsilon-approximate answer
    from O(k) state per block is usually the right trade: each block
    compacts its value distribution to <= k (value, weight) rows; the
    driver merges <= k x num_blocks summary rows and answers every q
    from one weighted scan — the corpus never moves.

    Compaction keeps cumulative weights HONEST: per block, distinct
    values sorted ascending are grouped into <= k consecutive runs of
    ~equal weight; the representative is the LAST value of its run, so
    the cumulative weight at each representative equals that value's
    exact within-block rank (count of block elements <= v). Merged
    across blocks, the cumulative weight at any representative is
    therefore an exact global "count <= v"; the only error is the gap
    BETWEEN consecutive representatives, bounded per block by
    ``n_b/k + max_single_value_count_b`` (a single hot value never
    splits). Rank error <= sum_b(n_b/k) + max hot count — epsilon ~ 1/k
    for distinct-heavy data.

    EXACT mode, for free: when every block has <= k distinct values, no
    grouping happens, weights are exact per-value counts, and the result
    is bit-identical to SQL ``quantile_disc`` (selection rule: first
    value whose cumulative count >= ceil(q*N) — the element at
    1-indexed rank ceil(q*N), matching ``global_quantiles``). That makes
    an *approximate* operator exactly oracle-checkable on bounded-domain
    columns (e.g. lineitem quantities).
    """
    import math

    import ray.data as rd

    def compact(df: pd.DataFrame) -> pd.DataFrame:
        s = df[value_col].dropna()
        vc = s.value_counts().sort_index()  # ascending distinct values
        vals = vc.index.to_numpy()
        w = vc.to_numpy().astype("int64")
        if len(vals) > k:
            cw = np.cumsum(w)
            total = int(cw[-1])
            # run boundaries at ~equal cumulative weight; searchsorted on
            # the exact cumsum keeps every kept cum weight an exact rank
            targets = np.ceil(np.arange(1, k + 1) * (total / k))
            idx = np.unique(
                np.searchsorted(cw, targets, side="left").clip(0, len(vals) - 1)
            )
            idx[-1] = len(vals) - 1  # always keep the block max
            keep_cw = cw[idx]
            w = np.diff(np.concatenate(([0], keep_cw))).astype("int64")
            vals = vals[idx]
        return pd.DataFrame({"v": vals, "w": w})

    # whole-BLOCK batches: the sketch contract ("<= k rows per block")
    # and the error bound are per block, not per 1024-row slice
    sk = (
        ds.select_columns([value_col])
        .map_batches(compact, batch_format="pandas", batch_size=None)
        .to_pandas()  # <= k x num_blocks summary rows — never the corpus
    )
    if len(sk) == 0:
        return rd.from_arrow(
            pa.table({"q": pa.array([], pa.float64()),
                      value_col: pa.array([], pa.float64())})
        )
    merged = sk.groupby("v", sort=True)["w"].sum()
    cw = merged.cumsum().to_numpy()
    n_total = int(cw[-1])
    vals = merged.index.to_numpy()
    out_q, out_v = [], []
    for q in qs:
        r = max(1, math.ceil(q * n_total))
        i = int(np.searchsorted(cw, r, side="left"))
        out_q.append(float(q))
        out_v.append(vals[min(i, len(vals) - 1)])
    return rd.from_pandas(pd.DataFrame({"q": out_q, value_col: out_v}))


def profile_columns(ds, cols: list[str], k: int = 1024, num_partitions: int | None = None):
    """Column profiler — the ANALYZE-TABLE surface: per column, exact
    row/null counts plus a KMV distinct estimate, SQL-reproducible for
    BOTH integer and string columns via the md5 bridge
    (``md5_lower64(value rendered as string)`` == DuckDB
    ``md5_number_lower(CAST(col AS VARCHAR))``; integer rendering uses
    Arrow string casts, never pandas — the int64->float64 null trap).

    Scale shape: ONE pass over the projected columns emits, per batch per
    column, the bottom-k distinct value hashes plus one (n, n_null)
    summary row; the tiny mapped stream is materialized (bounded:
    ~(k+1) x cols rows per block — the doc_top_terms precedent, never the
    corpus) because two consumers fork it. Counts merge in a groupby-sum;
    hashes dedup in a groupby, prune through an ARROW per-batch bottom-k
    (the top-k semigroup; kept in Arrow deliberately — uint64 columns in
    pandas blocks do not survive Ray's shuffle pickling), and the final
    <= k rows per column feed the same bit-exact estimator as
    :func:`kmv_distinct` (exact when a column has < k distinct values).

    Returns (column_name, n_rows, n_null, n_distinct_est, k_used), sorted.
    """
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from ..functions.text import md5_lower64

    def partials(t: pa.Table) -> pa.Table:
        out_col: list[str] = []
        out_kind: list[str] = []
        out_hv: list[int] = []
        out_n: list[int] = []
        out_nn: list[int] = []
        for c in cols:
            col = t.column(c).combine_chunks()
            distinct = set(pc.cast(col.drop_null(), pa.string()).to_pylist())
            # ORDER-PRESERVING shift into int64 (hv XOR 2^63 == hv - 2^63
            # in two's complement): Ray groupby keys on Arrow uint64
            # values above 2^63 overflow to a pickled-object fallback
            raw = np.fromiter((md5_lower64(v) for v in distinct), np.uint64, len(distinct))
            hs = np.unique((raw ^ np.uint64(1 << 63)).view(np.int64))[:k]
            out_col.extend([c] * (hs.size + 1))
            out_kind.extend(["h"] * hs.size + ["c"])
            out_hv.extend(hs.tolist() + [0])
            out_n.extend([0] * hs.size + [len(col)])
            out_nn.extend([0] * hs.size + [col.null_count])
        return pa.table(
            {
                "column_name": pa.array(out_col, pa.string()),
                "kind": pa.array(out_kind, pa.string()),
                "hv": pa.array(out_hv, pa.int64()),
                "n": pa.array(out_n, pa.int64()),
                "n_null": pa.array(out_nn, pa.int64()),
            }
        )

    mapped = (
        ds.select_columns(cols)
        .map_batches(partials, batch_format="pyarrow", batch_size=None)
        .materialize()
    )
    counts = (
        mapped.filter(expr="kind == 'c'")
        .select_columns(["column_name", "n", "n_null"])
        .groupby("column_name", num_partitions=num_partitions)
        .aggregate(Sum("n", alias_name="n_rows"), Sum("n_null", alias_name="n_null"))
    )
    # dedup hashes (same value seen in many batches), then the semigroup
    # prune: per-column bottom-k without ever grouping a whole column.
    # Both the prune and the estimator stay in ARROW blocks end to end.
    def prune(t: pa.Table) -> pa.Table:
        names = t.column("column_name").to_numpy(zero_copy_only=False)
        hvs = t.column("hv").to_numpy(zero_copy_only=False)
        keep_n, keep_h = [], []
        for c in np.unique(names):
            h = np.sort(hvs[names == c])[:k]
            keep_n.extend([c] * h.size)
            keep_h.append(h)
        return pa.table(
            {
                "column_name": pa.array(keep_n, pa.string()),
                "hv": pa.array(
                    np.concatenate(keep_h) if keep_h else np.empty(0, np.int64),
                    pa.int64(),
                ),
            }
        )

    from ray.data.aggregate import Count

    bottom = (
        mapped.filter(expr="kind == 'h'")
        .select_columns(["column_name", "hv"])
        .groupby(["column_name", "hv"], num_partitions=num_partitions)
        .aggregate(Count(alias_name="_drop"))
        .select_columns(["column_name", "hv"])
        .map_batches(prune, batch_format="pyarrow")
    )

    def estimate(t: pa.Table) -> pa.Table:
        h = np.sort(t.column("hv").to_numpy(zero_copy_only=False))[:k]
        n = h.size
        # un-shift back to the true uint64 hash for the estimator
        kth = float(int(h[-1]) + (1 << 63)) if n else 0.0
        est = n if (n < k or kth == 0.0) else int(np.floor((k - 1) * _TWO64 / kth))
        return pa.table(
            {
                "column_name": pa.array([t.column("column_name")[0].as_py()], pa.string()),
                "n_distinct_est": pa.array([est], pa.int64()),
                "k_used": pa.array([n], pa.int64()),
            }
        )

    ests = bottom.groupby("column_name").map_groups(estimate, batch_format="pyarrow")
    # both sides are ONE ROW PER PROFILED COLUMN — a driver-side merge of
    # a len(cols)-row result is the honest plan (a distributed hash join
    # over <= len(cols) rows is pure overhead)
    import ray.data as rd

    merged = counts.to_pandas().merge(ests.to_pandas(), on="column_name", how="inner")
    merged = merged[["column_name", "n_rows", "n_null", "n_distinct_est", "k_used"]]
    return rd.from_pandas(merged.sort_values("column_name").reset_index(drop=True))
