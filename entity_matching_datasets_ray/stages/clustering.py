"""Transitive clustering: distributed connected components + canonical ids.

Matched edges (score >= threshold) resolve into entity clusters via
hash-partitioned iterative min-label propagation (a groupby-min fixpoint;
SURVEY.md §2.5 G4). Canonical entity id = lexicographic min doc_id of the
component — a deterministic election independent of execution order.

Scale notes:
- every round shuffles the (bidirectional) edge list once, grouped by node;
  rounds needed = O(component diameter). Duplicate-document components are
  shallow (diameter <= a few hops), so rounds stay small; ``max_rounds``
  bounds pathological chains.
- convergence is detected with a cheap order-independent checksum aggregate
  over labels (no full-table comparison shuffle).
- a driver-side union-find fast path handles edge sets below
  ``driver_threshold`` (the frontier is provably small in tests); the
  distributed path is the default and the two are property-tested equal.
"""

from __future__ import annotations

import hashlib

import pandas as pd
import pyarrow as pa

from ray.data.aggregate import Min

LABEL_COLUMNS = ["doc_id", "entity_id"]


def _checksum_batch(batch: pa.Table) -> pa.Table:
    acc = 0
    for node, label in zip(
        batch.column("node").to_pylist(), batch.column("label").to_pylist()
    ):
        h = hashlib.blake2b(f"{node}\x1f{label}".encode(), digest_size=8).digest()
        acc ^= int.from_bytes(h, "big")
    return pa.table({"checksum": pa.array([acc], pa.uint64())})


def _labels_checksum(labels) -> int:
    parts = labels.map_batches(_checksum_batch, batch_format="pyarrow").to_pandas()
    acc = 0
    for v in parts["checksum"]:
        acc ^= int(v)
    return acc


def connected_components_distributed(
    edges, num_partitions: int | None = None, max_rounds: int = 12
):
    """edges (left_id, right_id) -> labels Dataset (node, label).

    Min-label propagation: each round, every node adopts the min label in
    its closed neighborhood; implemented as edge-carried message passing
    with a groupby-min — labels live *on the edges* (both endpoints), so no
    per-round join is needed:

        state: edge rows (u, v, label_u, label_v)
        round: msgs = [(u, min(lu, lv)), (v, min(lu, lv))]
               node_min = groupby(node).min(msg)     # one shuffle
               re-attach: edge labels <- node_min     # via groupby on u, v

    We instead keep the simpler (and equivalent) formulation over a
    node-label table rebuilt per round from edge messages; each round costs
    two groupby shuffles of the edge list.
    """

    def to_msgs(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        u = batch.column("left_id").combine_chunks()
        v = batch.column("right_id").combine_chunks()
        names = batch.column_names
        lu = batch.column("label_u").combine_chunks() if "label_u" in names else u
        lv = batch.column("label_v").combine_chunks() if "label_v" in names else v
        m = pc.min_element_wise(lu, lv)
        if isinstance(m, pa.ChunkedArray):
            m = m.combine_chunks()
        return pa.table(
            {
                "node": pa.concat_arrays([u, v]),
                "label": pa.concat_arrays([m, m]),
            }
        )

    # round 0: labels from raw edges (label = min endpoint of each edge)
    edges = edges.select_columns(["left_id", "right_id"])
    labels = (
        edges.map_batches(to_msgs, batch_format="pyarrow")
        .groupby("node", num_partitions=num_partitions)
        .aggregate(Min("label", alias_name="label"))
    ).materialize()
    prev_sum = _labels_checksum(labels)

    for _ in range(max_rounds):
        # attach current labels to both edge endpoints (hash joins), emit
        # min-label messages, take per-node min.
        lu = labels.map_batches(
            lambda t: t.rename_columns(["left_id", "label_u"]), batch_format="pyarrow"
        )
        lv = labels.map_batches(
            lambda t: t.rename_columns(["right_id", "label_v"]), batch_format="pyarrow"
        )
        np_ = num_partitions or 16
        e = edges.join(lu, join_type="inner", num_partitions=np_, on=("left_id",))
        e = e.join(lv, join_type="inner", num_partitions=np_, on=("right_id",))
        msgs = e.map_batches(to_msgs, batch_format="pyarrow")
        self_msgs = labels.map_batches(lambda t: t, batch_format="pyarrow")
        labels = (
            msgs.union(self_msgs)
            .groupby("node", num_partitions=num_partitions)
            .aggregate(Min("label", alias_name="label"))
        ).materialize()
        cur = _labels_checksum(labels)
        if cur == prev_sum:
            break
        prev_sum = cur
    return labels.map_batches(
        lambda t: t.rename_columns(["doc_id", "entity_id"]), batch_format="pyarrow"
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
    max_rounds: int = 12,
):
    """Dispatch: distributed label propagation, or driver union-find when
    the matched-edge set is small enough to hold in one process."""
    n = edges.count()
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
    joined = ids.join(
        labels, join_type="left_outer", num_partitions=num_partitions, on=("doc_id",)
    )

    def fill(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ent = pc.coalesce(batch.column("entity_id"), batch.column("doc_id"))
        return pa.table({"doc_id": batch.column("doc_id"), "entity_id": ent})

    return joined.map_batches(fill, batch_format="pyarrow")
