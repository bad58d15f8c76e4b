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
