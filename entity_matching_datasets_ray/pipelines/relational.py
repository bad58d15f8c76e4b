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

import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data.aggregate import Count, Max, Mean, Min, Sum


def _read(sf_dir: str, table: str, columns: list[str] | None = None):
    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def q_pricing_summary(sf_dir: str):
    """TPC-H Q1-style pricing summary over lineitem.

    Partial per-batch aggregation happens inside Ray's hash aggregate; we
    feed it a vectorized projection (revenue column computed per batch).
    """
    ds = _read(
        sf_dir,
        "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def project(t: pa.Table) -> pa.Table:
        rev = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return t.append_column("revenue", rev)

    out = (
        ds.map_batches(project, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("l_quantity", alias_name="sum_qty"),
            Sum("l_extendedprice", alias_name="sum_base_price"),
            Sum("revenue", alias_name="sum_disc_price"),
            Count(alias_name="count_order"),
        )
    )
    return out.sort(["l_returnflag", "l_linestatus"])


def q_top_orders(sf_dir: str):
    """Filter + global sort + limit: top 10 open orders by total price."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_orderstatus", "o_totalprice"])
    ds = ds.map_batches(
        lambda t: t.filter(pc.equal(t["o_orderstatus"], pa.scalar("O"))),
        batch_format="pyarrow",
    )
    return ds.sort(["o_totalprice", "o_orderkey"], descending=[True, False]).limit(10)


def q_revenue_by_nation(sf_dir: str):
    """Hash join (orders x customer) + join to nation + grouped sum."""
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
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
    agg = j.groupby("c_nationkey").aggregate(Sum("o_totalprice", alias_name="revenue"))
    out = agg.join(nation, join_type="inner", num_partitions=4, on=("c_nationkey",), right_on=("n_nationkey",))
    return out.select_columns(["n_name", "revenue"]).sort("n_name")


def q_segment_counts(sf_dir: str):
    """Grouped count + avg over customer segments."""
    ds = _read(sf_dir, "customer", ["c_mktsegment", "c_acctbal"])
    out = ds.groupby("c_mktsegment").aggregate(
        Count(alias_name="n_customers"),
        Sum("c_acctbal", alias_name="sum_acctbal"),
    )
    return out.sort("c_mktsegment")


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
            {"event_type": t["event_type"], "ts_hour": hour, "value": t["value"]}
        )

    out = (
        ds.map_batches(bucket, batch_format="pyarrow")
        .groupby(["event_type", "ts_hour"])
        .aggregate(Count(alias_name="n_events"), Sum("value", alias_name="sum_value"))
    )
    return out.sort(["event_type", "ts_hour"])


def q_part_type_stats(sf_dir: str):
    ds = _read(sf_dir, "part", ["p_type", "p_retailprice", "p_size"])
    out = ds.groupby("p_type").aggregate(
        Count(alias_name="n_parts"),
        Sum("p_retailprice", alias_name="sum_price"),
        Min("p_size", alias_name="min_size"),
        Max("p_size", alias_name="max_size"),
    )
    return out.sort("p_type")


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


def q_top_orders_per_segment(sf_dir: str):
    """Top-k per group: 3 highest-value orders per market segment.

    groupby(segment).map_groups with a per-group sort+head — the grouped
    top-k pattern (per-group state never leaves its partition).
    """
    import pandas as pd

    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_totalprice"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    j = orders.join(
        cust, join_type="inner", num_partitions=8, on=("o_custkey",), right_on=("c_custkey",)
    )

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        out = g.sort_values(["o_totalprice", "o_orderkey"], ascending=[False, True]).head(3)
        return out[["c_mktsegment", "o_orderkey", "o_totalprice"]]

    return (
        j.groupby("c_mktsegment")
        .map_groups(topk, batch_format="pandas")
        .sort(["c_mktsegment", "o_totalprice", "o_orderkey"], descending=[False, True, False])
    )


def q_customers_without_orders(sf_dir: str):
    """Anti-join via broadcast key set: customers with no order above
    $300k.

    The filtered small side's key set is collected once and shipped to
    every batch (``ray.put``) — the broadcast semi/anti-join pattern; no
    shuffle.
    """
    import ray

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"]).map_batches(
        lambda t: t.filter(pc.greater(t["o_totalprice"], pa.scalar(300000.0))),
        batch_format="pyarrow",
    )
    keys = set()
    for b in orders.iter_batches(batch_size=65536, batch_format="pyarrow"):
        keys.update(b["o_custkey"].to_pylist())
    keys_ref = ray.put(keys)

    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"])

    class AntiFilter:
        def __init__(self):
            self.keys = ray.get(keys_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            ids = t.column("c_custkey").to_pylist()
            mask = pa.array([i not in self.keys for i in ids], pa.bool_())
            return t.filter(mask)

    return cust.map_batches(AntiFilter, batch_format="pyarrow", concurrency=(1, 2)).sort(
        "c_custkey"
    )


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
