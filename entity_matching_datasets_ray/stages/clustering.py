"""Transitive clustering: distributed connected components + canonical ids.

Matched edges (score >= threshold) resolve into entity clusters via
hash-partitioned **alternating star contraction** (large-star / small-star,
Kiveris et al., "Connected Components in MapReduce and Beyond", public
algorithm) — the groupby-aggregate formulation mandated by the north star
(BASELINE.json; SURVEY.md §2.5 G4). Canonical entity id = lexicographic min
doc_id of the component — a deterministic election independent of
execution order.

Scale notes:
- each round is two bucketed groupby shuffles over the edge list; the
  algorithm converges in O(log n) rounds even for long-chain components
  (plain min-label propagation would need O(diameter)).
- grouping uses the same two-level bucketing as blocking: Ray shuffles by
  ``hash(node) % num_buckets``; a pandas groupby inside the bucket walks
  per-node groups vectorized, so per-group dispatch overhead is bounded.
- convergence is detected with an order-independent XOR checksum over the
  deduped edge set (cheap aggregate, no full-table comparison shuffle).
- a driver-side union-find fast path handles edge sets below
  ``driver_threshold``; the two paths are property-tested equal
  (tests/test_clustering.py) against networkx.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

LABEL_COLUMNS = ["doc_id", "entity_id"]
DEFAULT_NUM_BUCKETS = 64


def _bucket_series(values: pd.Series, num_buckets: int) -> np.ndarray:
    """Vectorized deterministic bucket assignment (pandas siphash with the
    library's fixed default key — stable across processes/workers)."""
    h = pd.util.hash_pandas_object(values, index=False).to_numpy(dtype=np.uint64)
    return (h % np.uint64(num_buckets)).astype(np.int32)


def _edges_checksum(edges) -> tuple[int, int]:
    """Order-independent (count, wrap-sum-of-row-hashes) over the edge set.

    Vectorized per batch (one ``hash_pandas_object`` call — was a per-row
    blake2b Python loop, VERDICT r01 item 5). Sum (mod 2^64) + count is
    commutative across any batch/partition order and, unlike XOR, doesn't
    cancel duplicate rows.
    """

    def per_batch(t: pa.Table) -> pa.Table:
        df = t.select(["big", "small"]).to_pandas()
        h = pd.util.hash_pandas_object(df, index=False).to_numpy(dtype=np.uint64)
        with np.errstate(over="ignore"):
            s = np.sum(h, dtype=np.uint64)
        return pa.table(
            {
                "n": pa.array([len(h)], pa.int64()),
                "s": pa.array([int(s)], pa.uint64()),
            }
        )

    parts = edges.map_batches(per_batch, batch_format="pyarrow").to_pandas()
    with np.errstate(over="ignore"):
        total = int(np.sum(parts["s"].to_numpy(dtype=np.uint64), dtype=np.uint64))
    return int(parts["n"].sum()), total


def _large_star(edges, num_buckets: int, num_partitions: int | None):
    """(big, small) edges -> large-star round: every node u connects its
    *larger* neighbors to min(N(u) ∪ {u})."""

    def bidirect(t: pa.Table) -> pa.Table:
        big = t.column("big").combine_chunks()
        small = t.column("small").combine_chunks()
        u = pa.concat_arrays([big, small])
        v = pa.concat_arrays([small, big])
        out = pa.table({"u": u, "v": v})
        return out.append_column(
            "bucket", pa.array(_bucket_series(pd.Series(u.to_pylist()), num_buckets), pa.int32())
        )

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"big": pd.Series([], dtype=str), "small": pd.Series([], dtype=str)})
        gmin = df.groupby("u")["v"].min()
        m = df["u"].map(gmin)
        m = m.where(m < df["u"], df["u"])  # min(N(u) ∪ {u})
        mask = (df["v"] > df["u"]).to_numpy()
        out = pd.DataFrame({"big": df["v"][mask], "small": m[mask]})
        out = out[out.big != out.small]
        return out.drop_duplicates()

    return (
        edges.map_batches(bidirect, batch_format="pyarrow")
        .groupby("bucket", num_partitions=num_partitions)
        .map_groups(per_bucket, batch_format="pandas")
    )


def _small_star(edges, num_buckets: int, num_partitions: int | None):
    """(big, small) edges -> small-star round: every node u connects its
    *smaller* neighbors (and itself) to the min smaller neighbor."""

    def keyed(t: pa.Table) -> pa.Table:
        out = pa.table({"u": t.column("big"), "v": t.column("small")})
        return out.append_column(
            "bucket",
            pa.array(
                _bucket_series(pd.Series(t.column("big").to_pylist()), num_buckets), pa.int32()
            ),
        )

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"big": pd.Series([], dtype=str), "small": pd.Series([], dtype=str)})
        gmin = df.groupby("u")["v"].min()
        m = df["u"].map(gmin).to_numpy()
        mask = (df["v"].to_numpy() != m)
        out = pd.DataFrame({"big": df["v"][mask], "small": pd.Series(m)[mask]})
        star = pd.DataFrame({"big": gmin.index, "small": gmin.to_numpy()})
        out = pd.concat([out, star], ignore_index=True)
        out = out[out.big != out.small]
        return out.drop_duplicates()

    return (
        edges.map_batches(keyed, batch_format="pyarrow")
        .groupby("bucket", num_partitions=num_partitions)
        .map_groups(per_bucket, batch_format="pandas")
    )


def connected_components_distributed(
    edges,
    num_partitions: int | None = None,
    max_rounds: int = 30,
    num_buckets: int = DEFAULT_NUM_BUCKETS,
):
    """edges (left_id, right_id) -> labels Dataset (doc_id, entity_id).

    Alternating large-star/small-star until the edge set reaches its
    star-graph fixpoint, then labels are read off the final stars.
    """

    def orient(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        l = t.column("left_id").combine_chunks()
        r = t.column("right_id").combine_chunks()
        big = pc.max_element_wise(l, r)
        small = pc.min_element_wise(l, r)
        out = pa.table({"big": big, "small": small})
        return out.filter(pc.not_equal(out["big"], out["small"]))

    cur = edges.select_columns(["left_id", "right_id"]).map_batches(
        orient, batch_format="pyarrow"
    ).materialize()
    prev_sum = _edges_checksum(cur)
    for _ in range(max_rounds):
        cur = _large_star(cur, num_buckets, num_partitions)
        cur = _small_star(cur, num_buckets, num_partitions).materialize()
        s = _edges_checksum(cur)
        if s == prev_sum:
            break
        prev_sum = s

    # fixpoint: stars (big -> root). Labels: leaf -> root, root -> itself.
    def to_labels(t: pa.Table) -> pa.Table:
        big = t.column("big").combine_chunks()
        small = t.column("small").combine_chunks()
        return pa.table(
            {
                "doc_id": pa.concat_arrays([big, small]),
                "entity_id": pa.concat_arrays([small, small]),
            }
        )

    from ray.data.aggregate import Min

    return (
        cur.map_batches(to_labels, batch_format="pyarrow")
        .groupby("doc_id", num_partitions=num_partitions)
        .aggregate(Min("entity_id", alias_name="entity_id"))
        # labels (one row per clustered doc) are consumed by the singleton
        # join and often counted; pin so CC never re-runs per consumer
        .materialize()
    )


def connected_components_driver(edges) -> pd.DataFrame:
    """Union-find on the driver — fast path for small edge sets."""
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    def union(a: str, b: str):
        ra, rb = find(a), find(b)
        if ra == rb:
            return
        if rb < ra:  # min-id root keeps canonical election deterministic
            ra, rb = rb, ra
        parent[rb] = ra

    for batch in edges.select_columns(["left_id", "right_id"]).iter_batches(
        batch_size=65536, batch_format="pyarrow"
    ):
        for a, b in zip(batch["left_id"].to_pylist(), batch["right_id"].to_pylist()):
            parent.setdefault(a, a)
            parent.setdefault(b, b)
            union(a, b)
    rows = [(n, find(n)) for n in parent]
    rows.sort()
    return pd.DataFrame(rows, columns=LABEL_COLUMNS)


def connected_components(
    edges,
    num_partitions: int | None = None,
    driver_threshold: int = 200_000,
    max_rounds: int = 30,
):
    """Dispatch: distributed star contraction, or driver union-find when the
    matched-edge set fits comfortably in one process."""
    n = edges.count()
    if n == 0:
        # no matches at all: empty label table WITH schema (an empty
        # pandas frame loses its columns through from_pandas, breaking
        # the downstream singleton left-join)
        import ray.data as rd

        try:
            t = edges.schema().base_schema.field("left_id").type
        except Exception:
            t = pa.string()
        return rd.from_arrow(
            pa.table({"doc_id": pa.array([], t), "entity_id": pa.array([], t)})
        )
    if n <= driver_threshold:
        import ray.data as rd

        return rd.from_pandas(connected_components_driver(edges))
    return connected_components_distributed(
        edges, num_partitions=num_partitions, max_rounds=max_rounds
    )


def attach_singletons(labels, entities, num_partitions: int = 16):
    """Docs that matched nothing become their own cluster (entity_id =
    doc_id): left join entities -> labels, fill null."""
    ids = entities.select_columns(["doc_id"])
    if labels.count() == 0:
        # Ray's hash-shuffle join chokes on an all-empty side even with a
        # typed schema; an edgeless corpus is all singletons directly.
        return ids.map_batches(
            lambda t: pa.table({"doc_id": t["doc_id"], "entity_id": t["doc_id"]}),
            batch_format="pyarrow",
        )
    joined = ids.join(
        labels, join_type="left_outer", num_partitions=num_partitions, on=("doc_id",)
    )

    def fill(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ent = pc.coalesce(batch.column("entity_id"), batch.column("doc_id"))
        return pa.table({"doc_id": batch.column("doc_id"), "entity_id": ent})

    return joined.map_batches(fill, batch_format="pyarrow")
