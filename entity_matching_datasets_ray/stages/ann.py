"""Similarity search over an embedding column (``list<float>``).

- ``brute_force_topk``: exact cosine top-k — the query matrix is broadcast
  once via ``ray.put``; every batch does one numpy matmul against it and
  emits its local top-k; a final tiny groupby merge yields the global
  top-k. The full corpus streams; only (n_queries x k) rows per batch
  cross the wire.
- ``lsh_topk``: the scale path — random-hyperplane bucketing (shared
  deterministic planes) restricts each query's scan to docs in its (or
  adjacent, multi-probe) buckets. Approximate: recall depends on
  num_planes/probes; verified exact within buckets.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray


def _normalize(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


class _BruteScan:
    """Actor: batch of vectors -> local top-k rows per query."""

    def __init__(self, queries_ref, k: int, id_col: str, vec_col: str):
        q = ray.get(queries_ref) if isinstance(queries_ref, ray.ObjectRef) else queries_ref
        self.qids = q["qids"]
        self.Q = _normalize(np.asarray(q["vectors"], dtype=np.float32))  # (nq, d)
        self.k = k
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column(self.id_col).to_pylist())
        V = _normalize(np.asarray(batch.column(self.vec_col).to_pylist(), dtype=np.float32))
        sims = self.Q @ V.T  # (nq, nb)
        k = min(self.k, sims.shape[1])
        out_q, out_id, out_sim = [], [], []
        part = np.argpartition(-sims, k - 1, axis=1)[:, :k]
        for qi in range(sims.shape[0]):
            for j in part[qi]:
                out_q.append(self.qids[qi])
                out_id.append(ids[j])
                out_sim.append(float(sims[qi, j]))
        return pa.table(
            {
                "query_id": pa.array(out_q),
                "match_id": pa.array(out_id),
                "cosine": pa.array(out_sim, pa.float32()),
            }
        )


def brute_force_topk(
    ds,
    query_ids: list,
    query_vectors,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_partitions: int = 8,
    concurrency=(1, 4),
):
    """Exact cosine top-k for each query over the full corpus."""
    ref = ray.put({"qids": list(query_ids), "vectors": np.asarray(query_vectors, dtype=np.float32)})
    locals_ = ds.select_columns([id_col, vec_col]).map_batches(
        _BruteScan,
        fn_constructor_args=(ref, k, id_col, vec_col),
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=concurrency,
    )

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["cosine", "match_id"], ascending=[False, True]).head(k)

    return locals_.groupby("query_id", num_partitions=num_partitions).map_groups(
        merge, batch_format="pandas"
    )


def _plane_sigs(V: np.ndarray, planes: np.ndarray) -> np.ndarray:
    proj = V @ planes
    bits = (proj > 0).astype(np.uint64)
    sig = np.zeros(V.shape[0], dtype=np.uint64)
    for b in range(planes.shape[1]):
        sig |= bits[:, b] << np.uint64(b)
    return sig


def ivf_topk(
    ds,
    query_ids: list,
    query_vectors,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_centroids: int | None = None,
    nprobe: int = 4,
    num_partitions: int = 8,
):
    """IVF-style approximate top-k: a deterministic coarse quantizer
    (centroids = the ``num_centroids`` lowest-id vectors, one Lloyd
    refinement pass over a sample) assigns every vector to its nearest
    centroid; each query scans only its ``nprobe`` nearest centroid
    cells. The centroid matrix is tiny and travels by closure; cell
    assignment is a vectorized matmul per batch.

    ``num_centroids`` defaults to ~sqrt(corpus size) (the standard IVF
    sizing: cell scan cost ~ n/sqrt(n) per probe), clamped to [16, 4096].

    ``nprobe="all"`` scans every cell — the cells partition the corpus, so
    the result is EXACTLY the brute-force top-k (any vector lost by the
    assignment or double-counted across cells breaks the equality). Used
    by the ``ann_ivf`` oracle query to SQL-check assignment + cell scan +
    merge end to end.
    """
    import ray

    if num_centroids is None:
        n_corpus = ds.count()
        num_centroids = int(min(4096, max(16, round(n_corpus ** 0.5))))
    seed_rows = ds.sort(id_col).limit(num_centroids).to_pandas()
    C = _normalize(np.stack(seed_rows[vec_col].to_numpy()).astype(np.float32))
    # one refinement pass over a bounded sample (deterministic: first rows)
    sample = ds.limit(max(1000, num_centroids * 20)).to_pandas()
    V = _normalize(np.stack(sample[vec_col].to_numpy()).astype(np.float32))
    assign = (V @ C.T).argmax(axis=1)
    for c in range(num_centroids):
        members = V[assign == c]
        if len(members):
            m = members.mean(axis=0)
            n = np.linalg.norm(m)
            if n > 0:
                C[c] = m / n
    C_ref = ray.put(C)

    Q = _normalize(np.asarray(query_vectors, dtype=np.float32))
    eff_nprobe = num_centroids if nprobe == "all" else nprobe
    qcells = np.argsort(-(Q @ C.T), axis=1)[:, :eff_nprobe]  # (nq, nprobe)
    cell_to_queries: dict[int, list[tuple]] = {}
    for qi, qid in enumerate(query_ids):
        for c in qcells[qi]:
            cell_to_queries.setdefault(int(c), []).append((qid, qi))
    cq_ref = ray.put({"cells": cell_to_queries, "Q": Q})

    class CellScan:
        def __init__(self):
            self.C = ray.get(C_ref)
            obj = ray.get(cq_ref)
            self.cells = obj["cells"]
            self.Q = obj["Q"]

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = np.asarray(batch.column(id_col).to_pylist())
            V = _normalize(np.asarray(batch.column(vec_col).to_pylist(), dtype=np.float32))
            assign = (V @ self.C.T).argmax(axis=1)
            out_q, out_id, out_sim = [], [], []
            for c, qlist in self.cells.items():
                mask = assign == c
                if not mask.any():
                    continue
                sub_ids = ids[mask]
                sub_V = V[mask]
                for qid, qi in qlist:
                    sims = sub_V @ self.Q[qi]
                    kk = min(k, len(sims))
                    top = np.argpartition(-sims, kk - 1)[:kk] if kk > 0 else []
                    for j in top:
                        out_q.append(qid)
                        out_id.append(sub_ids[j])
                        out_sim.append(float(sims[j]))
            return pa.table(
                {
                    "query_id": pa.array(out_q),
                    "match_id": pa.array(out_id),
                    "cosine": pa.array(out_sim, pa.float32()),
                }
            )

    locals_ = ds.select_columns([id_col, vec_col]).map_batches(
        CellScan, batch_format="pyarrow", batch_size=4096, concurrency=(1, 4)
    )

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(["query_id", "match_id"])
        return df.sort_values(["cosine", "match_id"], ascending=[False, True]).head(k)

    return locals_.groupby("query_id", num_partitions=num_partitions).map_groups(
        merge, batch_format="pandas"
    )


def lsh_topk(
    ds,
    query_ids: list,
    query_vectors,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_planes: int = 8,
    probes: int = 2,
    seed: int = 42,
    num_partitions: int = 8,
):
    """Bucketed approximate top-k: docs and queries are hashed with the same
    deterministic hyperplanes; each query scans only its probe buckets.

    ``probes="all"`` enumerates every ``2**num_planes`` signature — the
    buckets then cover the whole corpus and the result is EXACTLY the
    brute-force top-k (the buckets partition the corpus; a vector lost or
    double-counted by the bucketing would break the equality). Used by the
    ``ann_lsh`` oracle query to SQL-check the bucket/scan/merge plumbing.
    """
    Q = np.asarray(query_vectors, dtype=np.float32)
    dim = Q.shape[1]
    planes = np.random.RandomState(seed).randn(dim, num_planes).astype(np.float32)
    qsig_base = _plane_sigs(_normalize(Q), planes)
    # query probe signatures: exact + lowest-margin bit flips (or all)
    qsigs: dict[int, list[tuple]] = {}
    proj = _normalize(Q) @ planes
    for qi, qid in enumerate(query_ids):
        if probes == "all":
            sigs = list(range(1 << num_planes))
        else:
            sigs = [int(qsig_base[qi])]
            for b in np.argsort(np.abs(proj[qi]))[:probes]:
                sigs.append(int(qsig_base[qi]) ^ (1 << int(b)))
        for s in sigs:
            qsigs.setdefault(s, []).append((qid, qi))
    ref = ray.put({"qsigs": qsigs, "Q": _normalize(Q)})

    class BucketScan:
        def __init__(self):
            obj = ray.get(ref)
            self.qsigs = obj["qsigs"]
            self.Q = obj["Q"]

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = np.asarray(batch.column(id_col).to_pylist())
            V = _normalize(np.asarray(batch.column(vec_col).to_pylist(), dtype=np.float32))
            sig = _plane_sigs(V, planes)
            out_q, out_id, out_sim = [], [], []
            for s, qlist in self.qsigs.items():
                mask = sig == np.uint64(s)
                if not mask.any():
                    continue
                sub_ids = ids[mask]
                sub_V = V[mask]
                for qid, qi in qlist:
                    sims = sub_V @ self.Q[qi]
                    kk = min(k, len(sims))
                    top = np.argpartition(-sims, kk - 1)[:kk] if kk > 0 else []
                    for j in top:
                        out_q.append(qid)
                        out_id.append(sub_ids[j])
                        out_sim.append(float(sims[j]))
            return pa.table(
                {
                    "query_id": pa.array(out_q),
                    "match_id": pa.array(out_id),
                    "cosine": pa.array(out_sim, pa.float32()),
                }
            )

    locals_ = ds.select_columns([id_col, vec_col]).map_batches(
        BucketScan, batch_format="pyarrow", batch_size=4096, concurrency=(1, 4)
    )

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(["query_id", "match_id"])
        return df.sort_values(["cosine", "match_id"], ascending=[False, True]).head(k)

    return locals_.groupby("query_id", num_partitions=num_partitions).map_groups(
        merge, batch_format="pandas"
    )


def kmeans_embeddings(
    ds,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    iters: int = 2,
    num_partitions: int | None = None,
):
    """Distributed Lloyd k-means over an embedding column — the iterative-
    refinement family (the only one here): every other operator is a single
    dataflow; this one alternates broadcast -> streamed pass -> tiny
    reduce, the canonical Ray Data shape for iterative ML.

    Deterministic spec (mirrored by the SQL oracle, an UNROLLED Lloyd):

    - init: the ``k`` lowest-id vectors (float64);
    - assignment: squared-L2 argmin, ties -> lowest centroid id;
    - update: per-cluster mean; an EMPTY cluster keeps its previous
      centroid;
    - output after ``iters`` assignment passes: (id, cluster_id) —
      INTEGERS only, so the oracle comparison never touches a float.

    Scale shape per iteration:

    1. the (k x dim) centroid matrix is broadcast via ``ray.put`` — read
       once per task, never shipped per batch;
    2. ONE ``map_batches`` pass over the corpus: vectorized float64
       distance + argmin per batch, emitting PARTIAL per-centroid sums as
       (cid, dim, s, cnt) rows — k x dim rows per batch cross the shuffle,
       never the vectors;
    3. ``groupby((cid, dim)).sum`` -> <= k x dim rows to the driver for
       the centroid update (O(k * dim) driver state, like the window
       operators' block summaries).

    The corpus is re-streamed once per iteration (iters + 1 passes total
    with the final assignment) rather than pinned with ``materialize()`` —
    at 100 TB, N cheap storage passes beat holding the corpus in the
    object store (the r4 spill-probe livelock lesson). Callers clustering
    a small projection can materialize it themselves first.
    """
    from ray.data.aggregate import Sum

    def _stack(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
        ids = batch.column(id_col).combine_chunks()
        V = np.stack(batch.column(vec_col).to_pandas().to_numpy()).astype(np.float64)
        return ids, V

    def _assign(V: np.ndarray, C: np.ndarray) -> np.ndarray:
        # same FP op order as the serial reference: explicit (v - c)^2 sum;
        # argmin takes the FIRST minimum = lowest centroid id on ties
        d = ((V[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        return d.argmin(axis=1)

    def init_centroids() -> np.ndarray:
        seed = ds.sort(id_col).limit(k).to_pandas()
        return np.stack(seed[vec_col].to_numpy()).astype(np.float64)

    C = init_centroids()
    dim = C.shape[1]

    for _ in range(max(0, iters - 1)):
        C_ref = ray.put(C)

        def partial_sums(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:  # repartition can emit empty blocks
                return pa.table(
                    {
                        "cid": pa.array([], pa.int64()),
                        "dim": pa.array([], pa.int64()),
                        "s": pa.array([], pa.float64()),
                        "cnt": pa.array([], pa.int64()),
                    }
                )
            Cw = ray.get(C_ref)
            _, V = _stack(batch)
            a = _assign(V, Cw)
            cids, inv = np.unique(a, return_inverse=True)
            sums = np.zeros((cids.size, dim), np.float64)
            np.add.at(sums, inv, V)
            cnts = np.bincount(inv, minlength=cids.size).astype(np.int64)
            return pa.table(
                {
                    "cid": pa.array(np.repeat(cids, dim).astype(np.int64)),
                    "dim": pa.array(np.tile(np.arange(dim, dtype=np.int64), cids.size)),
                    "s": pa.array(sums.ravel(), pa.float64()),
                    "cnt": pa.array(np.repeat(cnts, dim), pa.int64()),
                }
            )

        merged = (
            ds.select_columns([id_col, vec_col])
            .map_batches(partial_sums, batch_format="pyarrow")
            .groupby(["cid", "dim"], num_partitions=num_partitions)
            .aggregate(Sum("s", alias_name="s"), Sum("cnt", alias_name="cnt"))
            .to_pandas()
        )
        C_new = C.copy()
        for cid, g in merged.groupby("cid"):
            g = g.sort_values("dim")
            C_new[int(cid)] = g["s"].to_numpy() / g["cnt"].to_numpy()
        C = C_new

    C_final = ray.put(C)

    def final_assign(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    id_col: pa.array([], batch.schema.field(id_col).type),
                    "cluster_id": pa.array([], pa.int64()),
                }
            )
        Cw = ray.get(C_final)
        ids, V = _stack(batch)
        a = _assign(V, Cw)
        return pa.table({id_col: ids, "cluster_id": pa.array(a.astype(np.int64))})

    return (
        ds.select_columns([id_col, vec_col])
        .map_batches(final_assign, batch_format="pyarrow")
        .sort(id_col)
    )
