"""Relational pipelines over the driver's TPC-H-ish testdata tables.

Each function takes ``sf_dir`` and returns a Ray Dataset whose result is
checkable against an ANSI-SQL oracle (see __ray_entry__.oracle_sql). They
exercise the engine's core relational operators end to end: pruned parquet
reads, vectorized batch filters/projections, partial-aggregated groupbys,
hash joins, sort/limit, distinct, windowed (time-bucketed) aggregation.

Column names in every result match the oracle SQL exactly (the driver's
compare is name-sensitive).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data.aggregate import Count, Max, Mean, Min, Sum


def _read(sf_dir: str, table: str, columns: list[str] | None = None):
    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _cents(col, scale: float = 100.0) -> pa.Array:
    """Currency column -> exact int64 units (cents by default).

    Float summation is order-dependent: Ray's partial-aggregate combine
    order differs from any serial oracle, and at ~1e8 magnitudes the drift
    exceeds value-hash precision (CORRECTNESS_r01 pricing_summary). The
    driver's currency columns are cent-quantized, so summing int64 cents
    and dividing once at the end is bit-stable and order-independent —
    identical to the oracle SQL doing the same. The boundary-free rounding
    (values sit ~1e-6 from a half, never on it) makes half-even (Arrow /
    Python) vs half-away (DuckDB) moot.
    """
    return pc.cast(pc.round(pc.multiply(col, pa.scalar(scale))), pa.int64())


def _div_f64(col, scale: float) -> pa.Array:
    return pc.divide(pc.cast(col, pa.float64()), pa.scalar(scale))


def q_pricing_summary(sf_dir: str):
    """TPC-H Q1-style pricing summary over lineitem.

    Partial per-batch aggregation happens inside Ray's hash aggregate over
    exact int64 cent units (see ``_cents``); one float division at the end.
    """
    ds = _read(
        sf_dir,
        "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def project(t: pa.Table) -> pa.Table:
        price_c = _cents(t["l_extendedprice"])
        disc_c = _cents(t["l_discount"])
        # revenue in 1e-4 units: cents x (100 - discount_cents)
        rev_u = pc.multiply(price_c, pc.subtract(pa.scalar(100, pa.int64()), disc_c))
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "qty_c": _cents(t["l_quantity"]),
                "price_c": price_c,
                "rev_u": rev_u,
            }
        )

    agg = (
        ds.map_batches(project, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("qty_c", alias_name="sum_qty_c"),
            Sum("price_c", alias_name="sum_price_c"),
            Sum("rev_u", alias_name="sum_rev_u"),
            Count(alias_name="count_order"),
        )
    )

    def finalize(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "sum_qty": _div_f64(t["sum_qty_c"], 100.0),
                "sum_base_price": _div_f64(t["sum_price_c"], 100.0),
                "sum_disc_price": _div_f64(t["sum_rev_u"], 10000.0),
                "count_order": t["count_order"],
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow").sort(
        ["l_returnflag", "l_linestatus"]
    )


def q_top_orders(sf_dir: str):
    """Filter + global sort + limit: top 10 open orders by total price."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_orderstatus", "o_totalprice"])
    ds = ds.map_batches(
        lambda t: t.filter(pc.equal(t["o_orderstatus"], pa.scalar("O"))),
        batch_format="pyarrow",
    )
    return ds.sort(["o_totalprice", "o_orderkey"], descending=[True, False]).limit(10)


def q_revenue_by_nation(sf_dir: str):
    """Hash join (orders x customer) + join to nation + grouped sum
    (exact int64 cents, see ``_cents``)."""
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"]).map_batches(
        lambda t: pa.table(
            {"o_custkey": t["o_custkey"], "price_c": _cents(t["o_totalprice"])}
        ),
        batch_format="pyarrow",
    )
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).map_batches(
        lambda t: t.set_column(
            t.schema.get_field_index("n_nationkey"),
            "n_nationkey",
            pc.cast(t["n_nationkey"], pa.int64()),
        ),
        batch_format="pyarrow",
    )
    j = orders.join(cust, join_type="inner", num_partitions=8, on=("o_custkey",), right_on=("c_custkey",))
    # the hash-aggregate widens the int32 key to int64; nation side is cast
    # above so the join keys line up.
    agg = j.groupby("c_nationkey").aggregate(Sum("price_c", alias_name="rev_c"))
    out = agg.join(nation, join_type="inner", num_partitions=4, on=("c_nationkey",), right_on=("n_nationkey",))
    return (
        out.map_batches(
            lambda t: pa.table(
                {"n_name": t["n_name"], "revenue": _div_f64(t["rev_c"], 100.0)}
            ),
            batch_format="pyarrow",
        )
        .sort("n_name")
    )


def q_segment_counts(sf_dir: str):
    """Grouped count + exact cent sum over customer segments."""
    ds = _read(sf_dir, "customer", ["c_mktsegment", "c_acctbal"]).map_batches(
        lambda t: pa.table(
            {"c_mktsegment": t["c_mktsegment"], "bal_c": _cents(t["c_acctbal"])}
        ),
        batch_format="pyarrow",
    )
    out = ds.groupby("c_mktsegment").aggregate(
        Count(alias_name="n_customers"),
        Sum("bal_c", alias_name="bal_c"),
    )
    return out.map_batches(
        lambda t: pa.table(
            {
                "c_mktsegment": t["c_mktsegment"],
                "n_customers": t["n_customers"],
                "sum_acctbal": _div_f64(t["bal_c"], 100.0),
            }
        ),
        batch_format="pyarrow",
    ).sort("c_mktsegment")


def q_events_hourly(sf_dir: str):
    """Time-bucketed (tumbling-window) aggregate: events per type per hour.

    Ray Data has no event-time windows (and neither does the reference —
    SURVEY.md §2.8); tumbling windows are expressed as a groupby on the
    truncated timestamp, the documented pattern for stream-shaped tables.
    """
    ds = _read(sf_dir, "events", ["event_type", "ts", "value"])

    def bucket(t: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(t["ts"], unit="hour")
        return pa.table(
            {"event_type": t["event_type"], "ts_hour": hour, "value_c": _cents(t["value"])}
        )

    out = (
        ds.map_batches(bucket, batch_format="pyarrow")
        .groupby(["event_type", "ts_hour"])
        .aggregate(Count(alias_name="n_events"), Sum("value_c", alias_name="value_c"))
    )
    return out.map_batches(
        lambda t: pa.table(
            {
                "event_type": t["event_type"],
                "ts_hour": t["ts_hour"],
                "n_events": t["n_events"],
                "sum_value": _div_f64(t["value_c"], 100.0),
            }
        ),
        batch_format="pyarrow",
    ).sort(["event_type", "ts_hour"])


def q_part_type_stats(sf_dir: str):
    ds = _read(sf_dir, "part", ["p_type", "p_retailprice", "p_size"]).map_batches(
        lambda t: pa.table(
            {"p_type": t["p_type"], "price_c": _cents(t["p_retailprice"]), "p_size": t["p_size"]}
        ),
        batch_format="pyarrow",
    )
    out = ds.groupby("p_type").aggregate(
        Count(alias_name="n_parts"),
        Sum("price_c", alias_name="price_c"),
        Min("p_size", alias_name="min_size"),
        Max("p_size", alias_name="max_size"),
    )
    return out.map_batches(
        lambda t: pa.table(
            {
                "p_type": t["p_type"],
                "n_parts": t["n_parts"],
                "sum_price": _div_f64(t["price_c"], 100.0),
                "min_size": t["min_size"],
                "max_size": t["max_size"],
            }
        ),
        batch_format="pyarrow",
    ).sort("p_type")


def q_distinct_langs(sf_dir: str):
    """Distinct (shuffle) on a low-cardinality column."""
    ds = _read(sf_dir, "documents", ["lang"])
    out = ds.groupby("lang").aggregate(Count(alias_name="n_docs"))
    return out.sort("lang")


def q_customer_order_stats(sf_dir: str):
    """Per-customer order rollup then distribution over order counts —
    two-level aggregation."""
    orders = _read(sf_dir, "orders", ["o_custkey"])
    per_cust = orders.groupby("o_custkey").aggregate(Count(alias_name="n_orders"))
    out = per_cust.groupby("n_orders").aggregate(Count(alias_name="n_customers"))
    return out.sort("n_orders")


def grouped_topk(ds, key_cols: list[str], sort_cols: list[str], ascending: list[bool], k: int):
    """Scale-safe grouped top-k: per-BATCH partial top-k (top-k is a
    semigroup — the global top-k per key is contained in the union of
    per-batch top-ks), then the final per-key selection runs over
    <= k x num_batches rows per key. No whole-key pandas group ever forms,
    so a low-cardinality key (the r02 lag lesson) costs nothing."""
    import pandas as pd

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(sort_cols, ascending=ascending, kind="mergesort")
        return df.groupby(key_cols, sort=False).head(k)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(sort_cols, ascending=ascending, kind="mergesort")
        return df.groupby(key_cols, sort=False).head(k)

    pruned = ds.map_batches(partial, batch_format="pandas")
    return pruned.groupby(key_cols).map_groups(final, batch_format="pandas")


def q_top_orders_per_segment(sf_dir: str):
    """Top-k per group: 3 highest-value orders per market segment — the
    scale-safe partial-top-k plan (see ``grouped_topk``)."""
    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_totalprice"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    j = orders.join(
        cust, join_type="inner", num_partitions=8, on=("o_custkey",), right_on=("c_custkey",)
    )

    top = grouped_topk(
        j.select_columns(["c_mktsegment", "o_orderkey", "o_totalprice"]),
        ["c_mktsegment"], ["o_totalprice", "o_orderkey"], [False, True], 3,
    )
    return top.sort(
        ["c_mktsegment", "o_totalprice", "o_orderkey"], descending=[False, True, False]
    )


# Above this many distinct keys the anti-join's "small" side is no longer
# broadcastable (mirrors scoring.BROADCAST_MAX_DOCS) and the shuffle
# left-anti path is used instead.
ANTI_BROADCAST_MAX_KEYS = 1_000_000


def anti_join(left, right_keys, on: str, right_on: str, max_broadcast_keys: int = ANTI_BROADCAST_MAX_KEYS, num_partitions: int = 8):
    """left rows whose ``on`` value appears nowhere in ``right_keys``
    (SQL NOT EXISTS). See ``_membership_join`` for the adaptive plan."""
    return _membership_join(
        left, right_keys, on, right_on, keep=False,
        max_broadcast_keys=max_broadcast_keys, num_partitions=num_partitions,
    )


def semi_join(left, right_keys, on: str, right_on: str, max_broadcast_keys: int = ANTI_BROADCAST_MAX_KEYS, num_partitions: int = 8):
    """left rows whose ``on`` value appears in ``right_keys`` (SQL EXISTS
    — full left rows, never duplicated by right multiplicity)."""
    return _membership_join(
        left, right_keys, on, right_on, keep=True,
        max_broadcast_keys=max_broadcast_keys, num_partitions=num_partitions,
    )


def _membership_join(left, right_keys, on: str, right_on: str, keep: bool,
                     max_broadcast_keys: int, num_partitions: int):
    """Shared semi/anti plan.

    Adaptive: collect + broadcast the key set when it is small (zero
    shuffle; vectorized ``pc.is_in``); fall back to a partitioned
    left-outer join against the DISTINCT right keys + null filter when the
    collected set would blow the driver/worker heap.

    Plan choice is PREFIX-sample-first (ADVICE r4): the KMV distinct
    sketch (``stages/sketches.py`` — per-batch bottom-k, a <=k-row
    shuffle, never the corpus) runs over only the first
    ``4 x max_broadcast_keys`` right rows (``limit()`` — streaming
    executor stops scheduling upstream blocks once satisfied). A prefix
    distinct estimate over the cap PROVES the full side is over the cap
    (distinct counts are monotone in the stream), so a huge right side
    goes to the shuffle plan after reading only a few blocks — the probe
    no longer pays a full right-side execution when the shuffle plan
    wins. Under the cap, the collect enforces the hard count with an
    early break (the sketch has ~1/sqrt(k) error and a low-cardinality
    prefix can under-estimate; the cap is a guarantee, not a heuristic).

    Deliberate trade-off: when the broadcast plan wins, the (small) right
    side is executed twice (prefix probe + collect pass); when a
    low-cardinality prefix mis-probes a big side, the collect streams
    until the hard cap breaks and the shuffle plan re-executes it — the
    same worst case the full-stream probe had.

    NULL semantics (SQL EXISTS / NOT EXISTS over an equality predicate):
    a NULL key never matches anything — NULL right keys are dropped from
    the membership set on BOTH plans, so semi drops and anti keeps
    NULL-key left rows, consistently.
    """
    import ray

    # NULL-rejecting EXISTS: null right keys can never witness a match
    right_nn = right_keys.map_batches(
        lambda t: t.filter(pc.is_valid(t[right_on])), batch_format="pyarrow"
    )

    from ..stages.sketches import kmv_distinct

    probe_rows = 4 * max_broadcast_keys
    est = int(
        kmv_distinct(
            right_nn.select_columns([right_on]).limit(probe_rows), right_on,
            k=256, allow_any_dtype=True,
        )
        .to_pandas()["n_distinct_est"].iloc[0]
    )
    broadcast_ok = est <= max_broadcast_keys

    if broadcast_ok:
        keys: set = set()
        for b in right_nn.iter_batches(batch_size=65536, batch_format="pyarrow"):
            keys.update(b[right_on].to_pylist())
            if len(keys) > max_broadcast_keys:  # hard cap despite the sketch
                broadcast_ok = False
                break
        keys.discard(None)

    if broadcast_ok:
        keys_ref = ray.put(list(keys))

        class MemberFilter:
            def __init__(self):
                # value-set for pc.is_in: fully vectorized membership test
                self.keys = pa.array(ray.get(keys_ref))

            def __call__(self, t: pa.Table) -> pa.Table:
                if len(self.keys) == 0:
                    return t.slice(0, 0) if keep else t
                # fill_null(False): a NULL left key matches nothing
                mask = pc.fill_null(
                    pc.is_in(pc.cast(t[on], self.keys.type), value_set=self.keys),
                    False,
                )
                if not keep:
                    mask = pc.invert(mask)
                return t.filter(mask)

        return left.map_batches(MemberFilter, batch_format="pyarrow", concurrency=(1, 2))

    # shuffle path: distinct right keys -> left_outer join -> null filter
    return _membership_shuffle(left, right_nn, on, right_on, keep, num_partitions)


def _membership_shuffle(left, right_nn, on: str, right_on: str, keep: bool,
                        num_partitions: int):
    """Exact shuffle membership plan: distinct right keys -> left_outer
    join -> marker null-filter. ``right_nn`` must already be NULL-free on
    ``right_on``."""
    from ray.data.aggregate import Count as _Count

    marker = "__member_marker"
    distinct = right_nn.groupby(right_on, num_partitions=num_partitions).aggregate(
        _Count(alias_name=marker)
    )
    # the hash-aggregate widens int keys; re-cast to the left side's dtype
    # so the join keys line up (learned gotcha: int32/int64 mismatch).
    base = left.schema().base_schema
    if hasattr(base, "field"):  # pyarrow schema
        left_type = base.field(on).type
    else:  # PandasBlockSchema (from_pandas inputs): names + numpy dtypes
        np_dtype = dict(zip(base.names, base.types))[on]
        # object dtype = pandas strings; from_numpy_dtype can't map it
        left_type = pa.string() if np_dtype == object else pa.from_numpy_dtype(np_dtype)
    distinct = distinct.map_batches(
        lambda t: t.set_column(
            t.schema.get_field_index(right_on), right_on, pc.cast(t[right_on], left_type)
        ),
        batch_format="pyarrow",
    )
    joined = left.join(
        distinct, join_type="left_outer", num_partitions=num_partitions,
        on=(on,), right_on=(right_on,),
    )
    pred = pc.is_valid if keep else pc.is_null
    return joined.map_batches(
        lambda t: t.filter(pred(t[marker])).drop_columns([marker]),
        batch_format="pyarrow",
    )


def bloom_semi_join(left, right_keys, on: str, right_on: str,
                    expected_keys: int = 1_000_000, bits_per_key: int = 10,
                    num_partitions: int = 8):
    """EXISTS via a Bloom pre-filter (see ``_bloom_membership``)."""
    return _bloom_membership(left, right_keys, on, right_on, keep=True,
                             expected_keys=expected_keys,
                             bits_per_key=bits_per_key,
                             num_partitions=num_partitions)


def bloom_anti_join(left, right_keys, on: str, right_on: str,
                    expected_keys: int = 1_000_000, bits_per_key: int = 10,
                    num_partitions: int = 8):
    """NOT EXISTS via a Bloom pre-filter (see ``_bloom_membership``)."""
    return _bloom_membership(left, right_keys, on, right_on, keep=False,
                             expected_keys=expected_keys,
                             bits_per_key=bits_per_key,
                             num_partitions=num_partitions)


def _bloom_membership(left, right_keys, on: str, right_on: str, keep: bool,
                      expected_keys: int, bits_per_key: int,
                      num_partitions: int):
    """Bloom-filtered membership join — the middle tier between
    ``_membership_join``'s broadcast plan (exact key set fits the heap)
    and its shuffle plan (nothing fits): when the right key SET is too
    big to collect exactly but a bitmap over it fits
    (10 bits/key -> 100M keys = 125 MB, still ``ray.put``-broadcastable),
    pre-filter the LEFT side before the all-to-all.

    Plan (classic bloom join; exact by construction):
      1. build: per-block Bloom bitmaps over the right keys
         (``map_batches`` -> one ``m/8``-byte binary row per block),
         OR-merged on the driver. O(m) driver memory, O(m x blocks)
         driver traffic — at cluster scale the OR is associative, so a
         tree reduce over block bitmaps bounds fan-in; noted, not needed
         at this node's block counts.
      2. probe: an actor-pool batch filter tests each left key's k bit
         positions (vectorized gather + ``all(axis=1)``). False-positive
         rate ~0.6^ (bits_per_key); false negatives impossible (same
         canonical hash both sides — ``bloom_key_hashes``).
      3. finish EXACTLY: semi routes the surviving (member + fp) rows
         through ``_membership_shuffle(keep=True)`` — the join removes
         the fps. Anti SPLITS: bloom-negative rows are definitively
         non-members and bypass the shuffle entirely (kept directly —
         this is where the win is: at 1% selectivity, 99% of the left
         side never shuffles); bloom-positive rows go through
         ``_membership_shuffle(keep=False)`` and union back.

    NULL semantics match ``_membership_join``: a NULL left key matches
    nothing (semi drops it before the join; anti keeps it on the
    definite-non-member branch). NULL right keys never enter the bitmap.

    Deliberate trade-off: the anti path probes the left side TWICE
    (want=True for the shuffle branch, want=False for the bypass) — Ray
    Data does not share a forked sub-plan between two consumers, so the
    alternatives are (a) materialize the probed left (pins a full
    corpus-sized table in the object store — the thing this tier exists
    to avoid) or (b) re-run the scan + vectorized hash, two streaming
    passes. (b) costs one extra read of the PRUNED left columns; the
    all-to-all it avoids on the bloom-negative majority is far larger.
    """
    import ray

    from ..functions.hashing import bloom_bit_positions, bloom_key_hashes

    m_bits = max(1024, ((expected_keys * bits_per_key + 7) // 8) * 8)
    k = max(1, min(16, round(0.7 * bits_per_key)))

    right_nn = right_keys.map_batches(
        lambda t: t.filter(pc.is_valid(t[right_on])), batch_format="pyarrow"
    )

    def block_bloom(t: pa.Table) -> pa.Table:
        bits = np.zeros(m_bits, dtype=bool)
        if len(t):
            h = bloom_key_hashes(t[right_on].to_pandas())
            bits[bloom_bit_positions(h, m_bits, k).ravel()] = True
        return pa.table({"bloom": pa.array([np.packbits(bits).tobytes()], pa.binary())})

    merged = np.zeros(m_bits // 8, dtype=np.uint8)
    for b in right_nn.map_batches(block_bloom, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for buf in b["bloom"].to_pylist():
            merged |= np.frombuffer(buf, dtype=np.uint8)
    bloom_ref = ray.put(merged)

    class BloomProbe:
        """maybe-member batch filter; ``want`` selects which side survives."""

        def __init__(self, want: bool):
            self.bits = np.unpackbits(ray.get(bloom_ref)).view(bool)
            self.want = want

        def __call__(self, t: pa.Table) -> pa.Table:
            col = t[on]
            valid = pc.is_valid(col).to_numpy(zero_copy_only=False)
            maybe = np.zeros(len(t), dtype=bool)
            if valid.any():
                # drop_null BEFORE to_pandas: nulls would force ints to
                # float64 and break the canonical hash of the valid rows
                h = bloom_key_hashes(col.drop_null().to_pandas())
                pos = bloom_bit_positions(h, m_bits, k)
                maybe[np.flatnonzero(valid)] = self.bits[pos].all(axis=1)
            return t.filter(pa.array(maybe if self.want else ~maybe))

    probe = lambda ds, want: ds.map_batches(  # noqa: E731
        BloomProbe, fn_constructor_args=(want,), batch_format="pyarrow",
        concurrency=(1, 4),
    )

    if keep:
        return _membership_shuffle(
            probe(left, True), right_nn, on, right_on, True, num_partitions
        )
    survivors = _membership_shuffle(
        probe(left, True), right_nn, on, right_on, False, num_partitions
    )
    return probe(left, False).union(survivors)


def grouped_quantiles(
    ds,
    key_cols: list[str],
    value_col: str,
    qs: tuple[float, ...] = (0.5, 0.9),
    num_partitions: int | None = None,
    method: str = "disc",
):
    """Exact per-group quantiles — a thin dispatch to
    ``grouped_quantiles_sorted`` (VERDICT r3 item 7: the old per-group
    pandas path assumed one key's rows fit a partition; the sorted
    block-offset path is exact at ANY key cardinality with no such
    caveat, so the whole-key path is retired).

    - ``method="disc"``: the selected element is ``sorted[ceil(q*n) - 1]``
      — SQL ``quantile_disc`` semantics, a passthrough of a real row
      (bit-identical to any oracle).
    - ``method="cont"``: linear interpolation at position ``q*(n-1)``
      computed as ``lo*(1-frac) + hi*frac`` — verified bit-identical to
      DuckDB's ``quantile_cont`` on DOUBLE columns (the other algebraic
      form, ``lo + (hi-lo)*frac``, differs in the last bit).
    """
    del num_partitions  # the sorted path derives its own block layout
    return grouped_quantiles_sorted(ds, key_cols, value_col, qs=qs, method=method)


def q_segment_price_quantiles(sf_dir: str):
    """Per-segment exact order-price quantiles (p50/p90) — the grouped
    discrete-quantile aggregate vs DuckDB quantile_disc."""
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    j = orders.join(cust, join_type="inner", num_partitions=8, on=("o_custkey",), right_on=("c_custkey",))
    # the sorted (no-whole-key-group) path: c_mktsegment has 5 values, the
    # exact case where a per-key pandas group cannot scale
    return grouped_quantiles_sorted(j, "c_mktsegment", "o_totalprice").sort("c_mktsegment")


def q_segment_price_quantiles_cont(sf_dir: str):
    """Interpolated (percentile_cont) variant — bit-identical to DuckDB
    quantile_cont via the lo*(1-frac)+hi*frac form."""
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    j = orders.join(cust, join_type="inner", num_partitions=8, on=("o_custkey",), right_on=("c_custkey",))
    return grouped_quantiles_sorted(j, "c_mktsegment", "o_totalprice", method="cont").sort("c_mktsegment")


def q_orders_rollup(sf_dir: str):
    """ROLLUP(o_orderpriority, o_orderstatus): detail rows + per-priority
    subtotals + grand total, composed as a union of three partial-agg
    groupbys with NULL-filled rolled-up levels (exact cent sums)."""
    from ray.data.aggregate import Count, Sum

    base = _read(sf_dir, "orders", ["o_orderpriority", "o_orderstatus", "o_totalprice"]).map_batches(
        lambda t: pa.table(
            {
                "o_orderpriority": t["o_orderpriority"],
                "o_orderstatus": t["o_orderstatus"],
                "price_c": _cents(t["o_totalprice"]),
            }
        ),
        batch_format="pyarrow",
    ).materialize()

    detail = base.groupby(["o_orderpriority", "o_orderstatus"]).aggregate(
        Count(alias_name="n_orders"), Sum("price_c", alias_name="price_c")
    )
    sub = base.groupby("o_orderpriority").aggregate(
        Count(alias_name="n_orders"), Sum("price_c", alias_name="price_c")
    ).map_batches(
        lambda t: t.append_column("o_orderstatus", pa.nulls(t.num_rows, pa.string())),
        batch_format="pyarrow",
    )
    import ray.data as rd

    g = base.aggregate(Count(alias_name="n_orders"), Sum("price_c", alias_name="price_c"))
    total = rd.from_arrow(
        pa.table(
            {
                "o_orderpriority": pa.nulls(1, pa.string()),
                "o_orderstatus": pa.nulls(1, pa.string()),
                "n_orders": pa.array([g["n_orders"]], pa.int64()),
                "price_c": pa.array([g["price_c"]], pa.int64()),
            }
        )
    )

    def finalize(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderpriority": t["o_orderpriority"],
                "o_orderstatus": t["o_orderstatus"],
                "n_orders": t["n_orders"],
                "sum_price": _div_f64(t["price_c"], 100.0),
            }
        )

    out = detail.map_batches(finalize, batch_format="pyarrow")
    for extra in (sub, total):
        out = out.union(extra.map_batches(finalize, batch_format="pyarrow"))
    # no final sort: Ray's sort can't order NULL rollup levels, and the
    # correctness compare is order-insensitive (rows sorted by the harness)
    return out


def q_customers_with_orders(sf_dir: str):
    """Semi-join (EXISTS): full customer rows having at least one order —
    never duplicated by order multiplicity."""
    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"])
    orders = _read(sf_dir, "orders", ["o_custkey"])
    return semi_join(cust, orders, on="c_custkey", right_on="o_custkey").sort("c_custkey")


def q_customers_without_orders(sf_dir: str):
    """Anti-join: customers with no order above $300k (adaptive broadcast /
    shuffle, see ``anti_join``)."""
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"]).map_batches(
        lambda t: t.filter(pc.greater(t["o_totalprice"], pa.scalar(300000.0))).select(
            ["o_custkey"]
        ),
        batch_format="pyarrow",
    )
    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"])
    return anti_join(cust, orders, on="c_custkey", right_on="o_custkey").sort("c_custkey")


def q_bloom_semi_customers(sf_dir: str):
    """Semi-join through the Bloom middle tier (``bloom_semi_join``):
    same EXISTS semantics as ``q_customers_with_orders``, forced through
    bitmap-prefilter -> exact shuffle finish."""
    cust = _read(sf_dir, "customer", ["c_custkey", "c_acctbal"])
    orders = _read(sf_dir, "orders", ["o_custkey"])
    return bloom_semi_join(
        cust, orders, on="c_custkey", right_on="o_custkey", expected_keys=100_000
    ).sort("c_custkey")


def q_bloom_anti_customers(sf_dir: str):
    """Anti-join through the Bloom tier: customers with no order above
    $250k. Bloom-negative rows bypass the shuffle (the at-scale win);
    bloom-positive rows get the exact NOT-EXISTS finish."""
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"]).map_batches(
        lambda t: t.filter(pc.greater(t["o_totalprice"], pa.scalar(250000.0))).select(
            ["o_custkey"]
        ),
        batch_format="pyarrow",
    )
    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"])
    return bloom_anti_join(
        cust, orders, on="c_custkey", right_on="o_custkey", expected_keys=100_000
    ).sort("c_custkey")


def q_events_sliding_3h(sf_dir: str):
    """Sliding (hopping) window aggregate: 3-hour window, 1-hour hop, per
    event type (stages/windows.py::sliding_window_agg — flat-map into
    covering windows + exact-cents groupby)."""
    from ..stages.windows import sliding_window_agg

    ds = _read(sf_dir, "events", ["event_type", "ts", "value"])
    return sliding_window_agg(ds, "ts", ["event_type"], "value", 3, 1).sort(
        ["event_type", "window_start"]
    )


def q_events_lag(sf_dir: str):
    """Partitioned lag: previous event (id, value) within each event type
    ordered by (ts, event_id) — SQL LAG() OVER (PARTITION BY ...)."""
    from ..stages.windows import lag_partitioned

    ds = _read(sf_dir, "events", ["event_id", "event_type", "ts", "value"])
    return lag_partitioned(ds, "event_type", "ts", "event_id", "value").sort("event_id")


def q_events_row_number(sf_dir: str):
    """Per-user event sequence numbers: row_number() OVER (PARTITION BY
    user_id ORDER BY ts, event_id) — the general window-numbering
    primitive (global sort + per-block count carry, no whole-key group)."""
    from ..stages.windows import row_number_partitioned

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])
    return row_number_partitioned(ds, "user_id", "ts", "event_id").sort("event_id")


def q_events_rank_features(sf_dir: str):
    """percent_rank + ntile(4) per user over (ts, event_id) order."""
    from ..stages.windows import rank_features

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])
    return rank_features(ds, "user_id", "ts", "event_id", ntile_k=4).sort("event_id")


def q_events_asof(sf_dir: str):
    """Distributed as-of join: every purchase event gets the latest click
    event at-or-before its timestamp (stages/windows.py::asof_join —
    global sort + per-block backward fill + one carry row per block)."""
    from ..stages.windows import asof_join

    ev = _read(sf_dir, "events", ["event_id", "event_type", "ts"])
    purchases = ev.map_batches(
        lambda t: t.filter(pc.equal(t["event_type"], pa.scalar("purchase"))).select(
            ["event_id", "ts"]
        ),
        batch_format="pyarrow",
    )
    clicks = ev.map_batches(
        lambda t: t.filter(pc.equal(t["event_type"], pa.scalar("click"))).select(
            ["event_id", "ts"]
        ),
        batch_format="pyarrow",
    )
    return asof_join(
        purchases, clicks, "ts", "ts", ["event_id"], ["event_id"], num_partitions=8
    ).sort("event_id")


def q_lineitem_filter_project(sf_dir: str):
    """Vectorized filter + projection: high-discount lines."""
    ds = _read(
        sf_dir, "lineitem", ["l_orderkey", "l_linenumber", "l_discount", "l_extendedprice"]
    )

    def f(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater_equal(t["l_discount"], pa.scalar(0.08)))
        disc_price = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "l_linenumber": t["l_linenumber"],
                "disc_price": disc_price,
            }
        )

    return ds.map_batches(f, batch_format="pyarrow").sort(["l_orderkey", "l_linenumber"])


def set_op(a, b, on: str, op: str):
    """Distributed set semantics: DISTINCT ``a.on`` INTERSECT / EXCEPT
    DISTINCT ``b.on`` in ONE shuffle.

    Each side is batch-deduplicated (combiner), tagged with a side bit,
    unioned, and a single ``groupby(on).aggregate(Max(in_a), Max(in_b))``
    decides membership — intersect keeps keys seen on both sides, except
    keeps keys seen only in ``a``. Shuffle volume is one row per distinct
    key per batch, never the raw tables.
    """
    if op not in ("intersect", "except"):
        raise ValueError(op)
    from ray.data.aggregate import Max

    def tagger(flag_a: int):
        def tag(t: pa.Table) -> pa.Table:
            keys = pc.unique(t.column(on))
            n = len(keys)
            return pa.table(
                {
                    on: keys,
                    "in_a": pa.array([flag_a] * n, pa.int8()),
                    "in_b": pa.array([1 - flag_a] * n, pa.int8()),
                }
            )

        return tag

    tagged = a.select_columns([on]).map_batches(tagger(1), batch_format="pyarrow").union(
        b.select_columns([on]).map_batches(tagger(0), batch_format="pyarrow")
    )
    agg = tagged.groupby(on).aggregate(Max("in_a", alias_name="in_a"), Max("in_b", alias_name="in_b"))

    def keep(t: pa.Table) -> pa.Table:
        in_a = pc.equal(t.column("in_a"), 1)
        in_b = pc.equal(t.column("in_b"), 1)
        mask = pc.and_(in_a, in_b) if op == "intersect" else pc.and_(in_a, pc.invert(in_b))
        return t.filter(mask).select([on])

    return agg.map_batches(keep, batch_format="pyarrow")


def q_users_also_customers(sf_dir: str):
    """Cross-table set intersection: event user ids that are also order
    customer keys (SQL INTERSECT)."""
    ev = _read(sf_dir, "events", ["user_id"])
    orders = _read(sf_dir, "orders", ["o_custkey"]).map_batches(
        lambda t: pa.table({"user_id": t.column("o_custkey")}), batch_format="pyarrow"
    )
    return set_op(ev, orders, "user_id", "intersect").sort("user_id")


def q_customers_never_active(sf_dir: str):
    """Cross-table set difference: order customer keys that never appear
    as an event user (SQL EXCEPT)."""
    orders = _read(sf_dir, "orders", ["o_custkey"])
    ev = _read(sf_dir, "events", ["user_id"]).map_batches(
        lambda t: pa.table({"o_custkey": t.column("user_id")}), batch_format="pyarrow"
    )
    return set_op(orders, ev, "o_custkey", "except").sort("o_custkey")


def q_orders_cube(sf_dir: str):
    """CUBE(o_orderpriority, o_orderstatus): all four grouping sets.

    ONE corpus-wide shuffle (the detail groupby); the (priority), (status)
    and () grouping sets re-aggregate the tiny detail table instead of
    re-scanning orders — at 100 TB that's 3 free subtotal passes (the
    detail table is bounded by the key-combination count, not the corpus).
    """
    from ray.data.aggregate import Count, Sum

    base = _read(
        sf_dir, "orders", ["o_orderpriority", "o_orderstatus", "o_totalprice"]
    ).map_batches(
        lambda t: pa.table(
            {
                "o_orderpriority": t["o_orderpriority"],
                "o_orderstatus": t["o_orderstatus"],
                "price_c": _cents(t["o_totalprice"]),
            }
        ),
        batch_format="pyarrow",
    )
    detail = (
        base.groupby(["o_orderpriority", "o_orderstatus"])
        .aggregate(Count(alias_name="n_orders"), Sum("price_c", alias_name="price_c"))
        .materialize()  # tiny: one row per key combination
    )

    def null_col(ds, col):
        return ds.map_batches(
            lambda t, col=col: t.append_column(col, pa.nulls(t.num_rows, pa.string())),
            batch_format="pyarrow",
        )

    by_p = null_col(
        detail.groupby("o_orderpriority").aggregate(
            Sum("n_orders", alias_name="n_orders"), Sum("price_c", alias_name="price_c")
        ),
        "o_orderstatus",
    )
    by_s = null_col(
        detail.groupby("o_orderstatus").aggregate(
            Sum("n_orders", alias_name="n_orders"), Sum("price_c", alias_name="price_c")
        ),
        "o_orderpriority",
    )
    g = detail.aggregate(Sum("n_orders", alias_name="n_orders"), Sum("price_c", alias_name="price_c"))
    total = rd.from_arrow(
        pa.table(
            {
                "o_orderpriority": pa.nulls(1, pa.string()),
                "o_orderstatus": pa.nulls(1, pa.string()),
                "n_orders": pa.array([g["n_orders"]], pa.int64()),
                "price_c": pa.array([g["price_c"]], pa.int64()),
            }
        )
    )

    def finalize(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderpriority": t["o_orderpriority"],
                "o_orderstatus": t["o_orderstatus"],
                "n_orders": pc.cast(t["n_orders"], pa.int64()),
                "sum_price": _div_f64(t["price_c"], 100.0),
            }
        )

    out = detail.map_batches(finalize, batch_format="pyarrow")
    for extra in (by_p, by_s, total):
        out = out.union(extra.map_batches(finalize, batch_format="pyarrow"))
    # no final sort (NULL grouping levels); the harness compare is
    # order-insensitive
    return out


def grouped_collect(
    ds,
    key_cols: list[str],
    value_col: str,
    out_col: str = "items",
    sep: str = ",",
    num_buckets: int = 64,
):
    """Grouped ordered collect: per group, the ``sep``-joined string of
    values sorted ascending (SQL ``string_agg(v, sep ORDER BY v)``).

    Bucketed like ``fusion.fuse_records``: groups shuffle once on
    ``hash(key) % buckets`` and each bucket concatenates MANY whole groups
    with one vectorized sort + a cheap per-group join — no whole-key
    partition assumption beyond a single group's values fitting in memory.
    """
    import numpy as np
    import pandas as pd

    def bucket_of(df: pd.DataFrame) -> pd.DataFrame:
        from ..functions.hashing import pandas_bucket

        df = df.copy()
        df["__bucket"] = pandas_bucket(
            df[key_cols[0]] if len(key_cols) == 1 else df[key_cols], num_buckets
        )
        return df

    def collect(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(key_cols + [value_col], kind="mergesort")
        s = df[value_col].astype(str)
        out = (
            s.groupby([df[c] for c in key_cols], sort=True)
            .agg(sep.join)
            .rename(out_col)
            .reset_index()
        )
        return out

    return (
        ds.select_columns(key_cols + [value_col])
        .map_batches(bucket_of, batch_format="pandas")
        .groupby("__bucket")
        .map_groups(collect, batch_format="pandas")
    )


def q_priority_order_lists(sf_dir: str):
    """Grouped ordered collect: per order priority, the comma-joined
    ascending list of its 20 highest-value order keys — collect composed
    after a grouped top-k (both shuffle-once)."""
    import pandas as pd

    orders = _read(sf_dir, "orders", ["o_orderpriority", "o_orderkey", "o_totalprice"])
    top = grouped_topk(
        orders, ["o_orderpriority"], ["o_totalprice", "o_orderkey"], [False, True], 20
    ).select_columns(["o_orderpriority", "o_orderkey"])
    return grouped_collect(top, ["o_orderpriority"], "o_orderkey", out_col="order_keys").sort(
        "o_orderpriority"
    )


def global_quantiles(ds, value_col: str, qs: tuple[float, ...] = (0.5, 0.9, 0.99)):
    """EXACT corpus-wide discrete quantiles without a whole-corpus
    collect: global sort on the value column, then per-block row counts
    (one int per block) locate each quantile's block, and one tiny task
    per hit block fetches just the selected rows.

    SQL ``quantile_disc`` semantics: element at ``ceil(q*n) - 1`` of the
    ascending sort — a passthrough of a real row, bit-identical to the
    oracle. Driver state: one count per block + the len(qs)-row result;
    the sorted corpus itself stays in the object store.
    """
    import math

    import numpy as np
    import pandas as pd

    import ray
    from ray.data.block import BlockAccessor

    s = ds.select_columns([value_col]).sort(value_col).materialize()
    # ordered block refs of the sorted dataset (range-partitioned: block
    # order IS global order; each block is internally sorted)
    refs = []
    for bundle in s.iter_internal_ref_bundles():
        refs.extend(bundle.block_refs)

    @ray.remote
    def _nrows(block):
        acc = BlockAccessor.for_block(block)
        n = acc.num_rows()
        if n == 0:
            return (0, None, None)
        # boundary values via 1-row slices — never copy the whole block
        first = BlockAccessor.for_block(acc.slice(0, 1, copy=False)).to_pandas()
        last = BlockAccessor.for_block(acc.slice(n - 1, n, copy=False)).to_pandas()
        return (n, first[value_col].iloc[0], last[value_col].iloc[0])

    stats = ray.get([_nrows.remote(r) for r in refs])
    counts = [n for n, _, _ in stats]
    # block order IS global order after ds.sort — an undocumented internal
    # contract (iter_internal_ref_bundles); assert it cheaply so a Ray
    # upgrade that reorders bundles fails loudly instead of silently
    # returning wrong quantiles (ADVICE r3)
    prev_max = None
    for n, vmin, vmax in stats:
        if n == 0:
            continue
        if prev_max is not None and vmin < prev_max:
            raise AssertionError(
                "global_quantiles: sorted blocks arrived out of global order "
                f"(block min {vmin!r} < previous block max {prev_max!r})"
            )
        prev_max = vmax
    n_total = int(sum(counts))
    if n_total == 0:
        return ray.data.from_pandas(
            pd.DataFrame({"q": pd.Series(dtype="float64"),
                          value_col: pd.Series(dtype="float64")})
        )
    offsets = np.concatenate(([0], np.cumsum(counts)))
    by_block: dict[int, list] = {}
    for q in qs:
        pos = max(0, math.ceil(q * n_total) - 1)
        b = int(np.searchsorted(offsets, pos, side="right") - 1)
        by_block.setdefault(b, []).append((q, pos - int(offsets[b])))

    @ray.remote
    def _pick(block, items):
        df = BlockAccessor.for_block(block).to_pandas()
        return [(q, df[value_col].iloc[local]) for q, local in items]

    picked = ray.get([_pick.remote(refs[b], items) for b, items in by_block.items()])
    rows = sorted((q, v) for part in picked for q, v in part)
    return ray.data.from_pandas(
        pd.DataFrame({"q": [q for q, _ in rows], value_col: [v for _, v in rows]})
    )


def q_order_price_quantiles_global(sf_dir: str):
    """Corpus-wide exact p50/p90/p99 of order prices (global sort +
    block-offset selection; the corpus never reaches the driver)."""
    orders = _read(sf_dir, "orders", ["o_totalprice"])
    return global_quantiles(orders, "o_totalprice", (0.5, 0.9, 0.99))


def pivot_counts(ds, key_col: str, pivot_col: str, values: list[str], agg_col: str | None = None):
    """PIVOT: one row per key, one column per pivot value, cells = counts
    (or exact cent sums of ``agg_col``). Indicator projection inside
    ``map_batches`` + ONE partial-agg groupby — the classic conditional-
    aggregation plan; no per-value scan."""

    def project(t: pa.Table) -> pa.Table:
        cols = {key_col: t[key_col]}
        pv = t[pivot_col]
        for v in values:
            mask = pc.equal(pv, pa.scalar(v))
            ind = pc.cast(pc.fill_null(mask, False), pa.int64())
            if agg_col is not None:
                cols[f"{v}"] = pc.multiply(ind, _cents(t[agg_col]))
            else:
                cols[f"{v}"] = ind
        return pa.table(cols)

    aggs = [Sum(v, alias_name=v) for v in values]
    out = ds.map_batches(project, batch_format="pyarrow").groupby(key_col).aggregate(*aggs)
    if agg_col is not None:
        def finalize(t: pa.Table) -> pa.Table:
            cols = {key_col: t[key_col]}
            for v in values:
                cols[v] = _div_f64(t[v], 100.0)
            return pa.table(cols)
        out = out.map_batches(finalize, batch_format="pyarrow")
    return out


def unpivot(ds, key_col: str, value_cols: list[str], var_name: str = "name", value_name: str = "value"):
    """UNPIVOT / melt: wide columns -> (key, name, value) long rows. Pure
    vectorized flat-map: each batch emits len(value_cols) stacked copies
    of itself — zero shuffle."""

    def melt(t: pa.Table) -> pa.Table:
        n = t.num_rows
        keys, names, vals = [], [], []
        for c in value_cols:
            keys.append(t[key_col].combine_chunks())
            names.append(pa.array([c] * n, pa.string()))
            vals.append(pc.cast(t[c], pa.float64()))
        return pa.table(
            {
                key_col: pa.concat_arrays([k.combine_chunks() if isinstance(k, pa.ChunkedArray) else k for k in keys]),
                var_name: pa.concat_arrays(names),
                value_name: pa.concat_arrays([v.combine_chunks() if isinstance(v, pa.ChunkedArray) else v for v in vals]),
            }
        )

    return ds.map_batches(melt, batch_format="pyarrow")


def q_segment_status_pivot(sf_dir: str):
    """PIVOT: customer segments x order status -> order counts."""
    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderstatus"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    j = orders.join(cust, join_type="inner", num_partitions=8, on=("o_custkey",), right_on=("c_custkey",))
    return pivot_counts(j, "c_mktsegment", "o_orderstatus", ["F", "O", "P"]).sort("c_mktsegment")


def q_part_size_unpivot(sf_dir: str):
    """UNPIVOT: part (p_size, p_retailprice) wide columns -> long rows."""
    parts = _read(sf_dir, "part", ["p_partkey", "p_size", "p_retailprice"])
    return unpivot(parts, "p_partkey", ["p_size", "p_retailprice"]).sort(["p_partkey", "name"])


def q_shipping_priority(sf_dir: str):
    """TPC-H Q3-style composite: customer ⋈ orders ⋈ lineitem with date
    predicates pushed to the batch filters, exact-cent revenue groupby,
    global top-10 by revenue (deterministic tie-break). Exercises the
    multi-join plan: small side (filtered customers) first, fact table
    last, all reads column-pruned."""
    import datetime as _dt

    cutoff = _dt.datetime(1998, 6, 1)

    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).map_batches(
        lambda t: t.filter(pc.equal(t["c_mktsegment"], pa.scalar("BUILDING"))).select(
            ["c_custkey"]
        ),
        batch_format="pyarrow",
    )
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"]).map_batches(
        lambda t: t.filter(pc.less(t["o_orderdate"], pa.scalar(cutoff))),
        batch_format="pyarrow",
    )
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"]).map_batches(
        lambda t: pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                # revenue in exact 1e-4 units: cents x (100 - disc_cents)
                "rev_u": pc.multiply(
                    _cents(t["l_extendedprice"]),
                    pc.subtract(pa.scalar(100, pa.int64()), _cents(t["l_discount"])),
                ),
            }
        ).filter(pc.greater(t["l_shipdate"], pa.scalar(cutoff))),
        batch_format="pyarrow",
    )
    co = orders.join(cust, join_type="inner", num_partitions=8, on=("o_custkey",), right_on=("c_custkey",))
    col = li.join(
        co.select_columns(["o_orderkey", "o_orderdate", "o_orderpriority"]),
        join_type="inner", num_partitions=8, on=("l_orderkey",), right_on=("o_orderkey",),
    )
    agg = col.groupby(["l_orderkey", "o_orderdate", "o_orderpriority"]).aggregate(
        Sum("rev_u", alias_name="rev_u")
    )
    out = agg.map_batches(
        lambda t: pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "revenue": _div_f64(t["rev_u"], 10000.0),
                "o_orderdate": t["o_orderdate"],
                "o_orderpriority": t["o_orderpriority"],
            }
        ),
        batch_format="pyarrow",
    )
    return out.sort(
        ["revenue", "o_orderdate", "l_orderkey"], descending=[True, False, False]
    ).limit(10)


def grouped_quantiles_sorted(
    ds,
    key_col: str | list[str],
    value_col: str,
    qs: tuple[float, ...] = (0.5, 0.9),
    method: str = "disc",
):
    """EXACT per-group discrete quantiles with NO whole-key group — the
    scale path at ANY key cardinality (a giant group never materializes:
    5 segments over 10^12 rows would be five impossible pandas groups on
    a per-group plan).

    Accepts one key column or a list (multi-key GROUP BY).

    Mechanics (the ``global_quantiles`` pattern, keyed): one global sort
    on (*keys, value); per-block (key, count) summaries — a few rows per
    block — locate each group's quantile positions; one tiny task per hit
    block fetches the selected rows. Output is (*keys, p50, ..., n_rows),
    quantile_disc semantics, bit-identical passthrough values.
    """
    import math

    import numpy as np
    import pandas as pd

    import ray
    from ray.data.block import BlockAccessor

    keys = [key_col] if isinstance(key_col, str) else list(key_col)

    s = ds.select_columns(keys + [value_col]).sort(keys + [value_col]).materialize()
    refs = []
    for bundle in s.iter_internal_ref_bundles():
        refs.extend(bundle.block_refs)

    @ray.remote
    def _summary(block):
        df = BlockAccessor.for_block(block).to_pandas()
        if len(df) == 0:
            return [], None, None
        df = df.sort_values(keys + [value_col], kind="mergesort")
        g = df.groupby(keys, sort=True).size()
        klist = [k if isinstance(k, tuple) else (k,) for k in g.index.tolist()]
        first_kv = tuple(df[c].iloc[0] for c in keys) + (df[value_col].iloc[0],)
        last_kv = tuple(df[c].iloc[-1] for c in keys) + (df[value_col].iloc[-1],)
        return list(zip(klist, g.to_numpy().tolist())), first_kv, last_kv

    results = ray.get([_summary.remote(r) for r in refs])
    # assert the block-order-is-global-order contract (see
    # global_quantiles): (key, value) boundaries must be non-decreasing
    prev_last = None
    for _, first_kv, last_kv in results:
        if first_kv is None:
            continue
        if prev_last is not None and first_kv < prev_last:
            raise AssertionError(
                "grouped_quantiles_sorted: sorted blocks arrived out of "
                f"global order ({first_kv!r} < previous block end {prev_last!r})"
            )
        prev_last = last_kv
    summaries = [pairs for pairs, _, _ in results]
    # per key: count seen before each block (blocks are in global order)
    running: dict = {}
    before: list[dict] = []
    for summ in summaries:
        b_off = {}
        for k, n in summ:
            b_off[k] = running.get(k, 0)
            running[k] = running[k] + n if k in running else n
        before.append(b_off)
    # quantile targets per key -> (block, local position inside the
    # block's key segment)
    if method not in ("disc", "cont"):
        raise ValueError(method)
    # disc: one position per quantile; cont: the floor/ceil bracket of
    # q*(n-1), interpolated on the driver with the DuckDB-bit-identical
    # lo*(1-frac)+hi*frac form
    def positions(total: int, q: float) -> list[tuple[str, int]]:
        if method == "disc":
            return [("v", max(0, math.ceil(q * total) - 1))]
        pos = q * (total - 1)
        return [("lo", int(math.floor(pos))), ("hi", int(math.ceil(pos)))]

    picks: dict[int, list] = {}
    for bi, summ in enumerate(summaries):
        for k, n in summ:
            off = before[bi][k]
            total = running[k]
            for q in qs:
                for role, pos in positions(total, q):
                    if off <= pos < off + n:
                        picks.setdefault(bi, []).append((k, q, role, pos - off))

    @ray.remote
    def _pick(block, items):
        df = BlockAccessor.for_block(block).to_pandas()
        df = df.sort_values(keys + [value_col], kind="mergesort").reset_index(drop=True)
        starts = df.groupby(keys, sort=False).cumcount()
        out = []
        for k, q, role, local in items:
            mask = starts == local
            for c, kv in zip(keys, k):
                mask &= df[c] == kv
            seg = df.index[mask]
            out.append((k, q, role, df[value_col].iloc[seg[0]]))
        return out

    pcols = [f"p{round(q * 100):02d}" for q in qs]
    if not running:  # empty input: keep the output schema
        empty = pd.DataFrame({**{c: pd.Series(dtype="object") for c in keys},
                              **{c: pd.Series(dtype="float64") for c in pcols},
                              "n_rows": pd.Series(dtype="int64")})
        return ray.data.from_pandas(empty)
    got = ray.get([_pick.remote(refs[b], items) for b, items in picks.items()])
    brackets: dict = {}
    for part in got:
        for k, q, role, v in part:
            brackets.setdefault((k, q), {})[role] = v
    rows: dict = {}
    for (k, q), vals in brackets.items():
        if method == "disc":
            v = vals["v"]
        else:
            pos = q * (running[k] - 1)
            frac = pos - math.floor(pos)
            v = vals["lo"] * (1 - frac) + vals["hi"] * frac
        rows.setdefault(k, {})[f"p{round(q * 100):02d}"] = v
    out = pd.DataFrame(
        [
            {**dict(zip(keys, k)), **vals, "n_rows": np.int64(running[k])}
            for k, vals in sorted(rows.items())
        ]
    )
    cols = keys + [f"p{round(q * 100):02d}" for q in qs] + ["n_rows"]
    return ray.data.from_pandas(out[cols])
