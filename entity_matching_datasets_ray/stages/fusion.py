"""Record fusion (survivorship / golden records): cluster members -> one
canonical record per entity.

The last step of the reference's workflow is manual: after its matcher
labels pairs, a user still has to pick which of the matched records'
values to keep (the enriched CSVs at DeepMather/*/ carry both sides of
every pair, never a merged row). This stage closes that gap with the
classic deterministic survivorship rules from the record-linkage
literature (most-frequent value, longest string, min/max, value of the
newest/highest-priority member), so clusters from the linkage pipeline
become a golden-record table.

Scale design (one shuffle, combiner-first):

1. **Combiner** ``map_batches``: each batch is pre-reduced to one row per
   distinct (cluster, attribute-tuple) with an integer weight ``__w``.
   Exact duplicate members — the common case in an entity cluster —
   collapse before anything moves; every rule below is weight-aware, so
   this loses no information.
2. **Bucketed merge**: rows shuffle once on ``hash(cluster) % buckets``
   (two-level-grouping idiom shared with blocking/dedup) and each bucket
   fuses MANY whole clusters with vectorized pandas — no per-cluster
   Python call, no per-key partition-fits assumption beyond a single
   cluster's *distinct attribute tuples* fitting in memory (cluster
   membership is inherently small; a pathological mega-cluster is the
   caller's signal that matching, not fusion, went wrong).

Rules are deterministic and tie-broken so output is stable under any
partitioning/combine order, which keeps every rule SQL-expressible
(oracle-checked end to end by the ``golden_customers`` query):

- ``mode``     most frequent non-null value; ties -> smallest value
- ``longest``  longest non-null string; ties -> smallest value
- ``min`` / ``max``  plain extrema (null-skipping)
- ``sum``      weight-aware total (int-exact; float caveat: combine order)
- ``count_distinct``  number of distinct non-null values (consensus width)
- ``min_by`` / ``max_by``  value from the member with the smallest /
  largest *order column* (e.g. most-recent-source wins); ties -> smallest
  value of the fused column
"""

from __future__ import annotations

import numpy as np
import pandas as pd


class FuseRule:
    """(out_name, rule, col[, order_col]) — see module docstring."""

    __slots__ = ("out", "rule", "col", "order_col")

    RULES = ("mode", "longest", "min", "max", "sum", "count_distinct", "min_by", "max_by")

    def __init__(self, out: str, rule: str, col: str, order_col: str | None = None):
        if rule not in self.RULES:
            raise ValueError(f"unknown fuse rule {rule!r}; one of {self.RULES}")
        if rule in ("min_by", "max_by") and not order_col:
            raise ValueError(f"{rule} needs an order column")
        self.out, self.rule, self.col, self.order_col = out, rule, col, order_col


def _as_rules(rules) -> list[FuseRule]:
    return [r if isinstance(r, FuseRule) else FuseRule(*r) for r in rules]


def fuse_records(
    ds,
    cluster_col: str,
    rules,
    members_col: str = "n_members",
    num_buckets: int = 64,
):
    """Dataset -> one golden row per ``cluster_col`` value.

    ``rules``: iterable of FuseRule or (out_name, rule, col[, order_col])
    tuples. Output columns: cluster_col, ``members_col`` (member count),
    then one column per rule in order.
    """
    rules = _as_rules(rules)
    cols = sorted({r.col for r in rules} | {r.order_col for r in rules if r.order_col})
    keep = [cluster_col] + cols

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        # one row per distinct attribute tuple per batch; dropna=False so
        # null-bearing members still count toward n_members.
        out = df[keep].groupby(keep, dropna=False, sort=False).size().reset_index(name="__w")
        return out

    def bucket_of(df: pd.DataFrame) -> pd.DataFrame:
        from ..functions.hashing import pandas_bucket

        df = df.copy()
        df["__bucket"] = pandas_bucket(df[cluster_col], num_buckets)
        return df

    def fuse_bucket(df: pd.DataFrame) -> pd.DataFrame:
        k = cluster_col
        # merge combiner partials from different batches first
        df = df.groupby(keep + ["__bucket"], dropna=False, sort=False)["__w"].sum().reset_index()
        base = df.groupby(k, sort=True)["__w"].sum().rename(members_col).reset_index()
        for r in rules:
            sub = df[[k, r.col, "__w"] + ([r.order_col] if r.order_col else [])]
            if r.rule == "mode":
                w = sub.dropna(subset=[r.col]).groupby([k, r.col], sort=False)["__w"].sum().reset_index()
                w = w.sort_values([k, "__w", r.col], ascending=[True, False, True], kind="mergesort")
                picked = w.drop_duplicates(k)[[k, r.col]]
            elif r.rule == "longest":
                nn = sub.dropna(subset=[r.col])
                ln = nn[r.col].astype(str).str.len()
                nn = nn.assign(__len=ln).sort_values(
                    [k, "__len", r.col], ascending=[True, False, True], kind="mergesort"
                )
                picked = nn.drop_duplicates(k)[[k, r.col]]
            elif r.rule in ("min", "max"):
                agg = sub.groupby(k, sort=False)[r.col].agg(r.rule).reset_index()
                picked = agg
            elif r.rule == "sum":
                nn = sub.dropna(subset=[r.col])
                vals = nn[r.col] * nn["__w"]
                picked = vals.groupby(nn[k]).sum().rename(r.col).reset_index()
            elif r.rule == "count_distinct":
                picked = sub.dropna(subset=[r.col]).groupby(k, sort=False)[r.col].nunique().reset_index()
            else:  # min_by / max_by
                asc_order = r.rule == "min_by"
                nn = sub.dropna(subset=[r.col, r.order_col]).sort_values(
                    [k, r.order_col, r.col], ascending=[True, asc_order, True], kind="mergesort"
                )
                picked = nn.drop_duplicates(k)[[k, r.col]]
            picked = picked.rename(columns={r.col: r.out})
            src_dtype = sub[r.col].dtype
            base = base.merge(picked, on=k, how="left")
            if r.rule == "count_distinct":
                # all-null group -> 0 (SQL COUNT(DISTINCT) semantics), and a
                # stable int64 dtype across buckets
                base[r.out] = base[r.out].fillna(0).astype("int64")
            elif pd.api.types.is_integer_dtype(src_dtype):
                # a bucket whose groups are all-null would otherwise emit
                # float64 (NaN) while another emits int64 — pin nullable
                # Int64 so the dtype is a pure function of (source, rule)
                base[r.out] = base[r.out].astype("Int64")
            elif pd.api.types.is_bool_dtype(src_dtype):
                base[r.out] = base[r.out].astype("boolean")
        return base[[k, members_col] + [r.out for r in rules]]

    out = (
        ds.map_batches(combine, batch_format="pandas")
        .map_batches(bucket_of, batch_format="pandas")
        .groupby("__bucket")
        .map_groups(fuse_bucket, batch_format="pandas")
    )
    return out
