"""ANN tests: brute-force exactness vs numpy oracle, LSH recall."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from entity_matching_datasets_ray.stages.ann import brute_force_topk, lsh_topk


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.RandomState(3)
    V = rng.randn(300, 32).astype(np.float32)
    ds = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(list(range(300)), pa.int64()),
                "embedding": pa.array([v.tolist() for v in V], pa.list_(pa.float32())),
            }
        )
    )
    return ds, V


def _oracle_topk(V, q, k):
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    qn = q / np.linalg.norm(q)
    sims = Vn @ qn
    return set(np.argsort(-sims)[:k].tolist())


def test_brute_force_matches_numpy(corpus):
    ds, V = corpus
    qids = [0, 7, 42]
    Q = V[qids]
    out = brute_force_topk(ds, qids, Q, k=10, num_partitions=4).to_pandas()
    for qi, qid in enumerate(qids):
        got = set(out[out.query_id == qid]["match_id"])
        assert got == _oracle_topk(V, V[qid], 10)


def test_brute_force_self_is_top(corpus):
    ds, V = corpus
    out = brute_force_topk(ds, [5], V[[5]], k=1, num_partitions=2).to_pandas()
    assert out.iloc[0].match_id == 5
    assert out.iloc[0].cosine == pytest.approx(1.0, abs=1e-5)


def test_lsh_topk_recall(corpus):
    ds, V = corpus
    qids = [1, 2, 3, 4, 5]
    out = lsh_topk(ds, qids, V[qids], k=10, num_planes=6, probes=3, num_partitions=4).to_pandas()
    recalls = []
    for qid in qids:
        got = set(out[out.query_id == qid]["match_id"])
        oracle = _oracle_topk(V, V[qid], 10)
        recalls.append(len(got & oracle) / 10)
    # approximate: average recall must be reasonable, self always found
    assert np.mean(recalls) >= 0.3
    for qid in qids:
        assert qid in set(out[out.query_id == qid]["match_id"])


def test_ivf_topk_recall(corpus):
    from entity_matching_datasets_ray.stages.ann import ivf_topk

    ds, V = corpus
    qids = [0, 10, 20]
    out = ivf_topk(ds, qids, V[qids], k=10, num_centroids=8, nprobe=4, num_partitions=4).to_pandas()
    recalls = []
    for qid in qids:
        got = set(out[out.query_id == qid]["match_id"])
        oracle = _oracle_topk(V, V[qid], 10)
        recalls.append(len(got & oracle) / 10)
    assert np.mean(recalls) >= 0.4
    for qid in qids:
        assert qid in set(out[out.query_id == qid]["match_id"])  # self found


# --------------------------------------------------------------------------
# distributed Lloyd k-means
# --------------------------------------------------------------------------


def _kmeans_serial(V, k, iters):
    """Spec reference: lowest-id init, squared-L2 argmin (ties -> lowest
    cid), mean update, empty cluster keeps its centroid."""
    C = V[:k].astype(np.float64).copy()
    assign = None
    for it in range(iters):
        d = ((V[:, None, :].astype(np.float64) - C[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        if it < iters - 1:
            for c in range(k):
                m = assign == c
                if m.any():
                    C[c] = V[m].astype(np.float64).mean(axis=0)
    return assign


def _vec_ds(V):
    return rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(list(range(len(V))), pa.int64()),
                "embedding": pa.array([v.tolist() for v in V], pa.list_(pa.float32())),
            }
        )
    )


@pytest.mark.parametrize("iters", [1, 2, 4])
def test_kmeans_matches_serial_and_recovers_blobs(ray_session, iters):
    from entity_matching_datasets_ray.stages.ann import kmeans_embeddings

    rng = np.random.RandomState(9)
    centers = rng.randn(4, 16) * 20  # well-separated blobs
    labels = np.repeat(np.arange(4), 50)
    V = (centers[labels] + rng.randn(200, 16) * 0.1).astype(np.float32)
    perm = rng.permutation(200)  # ids uncorrelated with blob order
    V, labels = V[perm], labels[perm]

    out = kmeans_embeddings(_vec_ds(V).repartition(7), k=4, iters=iters).to_pandas()
    assert list(out["vec_id"]) == list(range(200))
    got = out["cluster_id"].to_numpy()
    want = _kmeans_serial(V, 4, iters)
    assert (got == want).all()
    if iters >= 2:
        # converged partition == planted blobs (pure clusters)
        for c in np.unique(got):
            assert len(np.unique(labels[got == c])) == 1


def test_kmeans_empty_cluster_keeps_centroid(ray_session):
    from entity_matching_datasets_ray.stages.ann import kmeans_embeddings

    # init = ids 0,1 with IDENTICAL vectors: every point ties -> cid 0,
    # cid 1 goes empty after iter 1 and must keep its [0,0] centroid
    V = np.array([[0, 0], [0, 0], [5, 5], [5.1, 5]], np.float32)
    out = kmeans_embeddings(_vec_ds(V).repartition(3), k=2, iters=2).to_pandas()
    want = _kmeans_serial(V, 2, 2)
    assert (out["cluster_id"].to_numpy() == want).all()
    # the kept stale centroid recaptures the origin points in iter 2
    # (c0 moved to the global mean), so BOTH rules are exercised
    assert set(want) == {0, 1}


def test_kmeans_tolerates_empty_blocks(ray_session):
    from entity_matching_datasets_ray.stages.ann import kmeans_embeddings

    rng = np.random.RandomState(2)
    V = rng.randn(5, 8).astype(np.float32)
    out = kmeans_embeddings(_vec_ds(V).repartition(12), k=2, iters=2).to_pandas()
    assert (out["cluster_id"].to_numpy() == _kmeans_serial(V, 2, 2)).all()
