"""Connected-components tests: distributed == driver == networkx."""

import networkx as nx
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from entity_matching_datasets_ray.stages.clustering import (
    attach_singletons,
    connected_components_distributed,
    connected_components_driver,
)


def _random_edges(n_nodes: int, n_edges: int, seed: int) -> pd.DataFrame:
    rng = np.random.RandomState(seed)
    a = rng.randint(0, n_nodes, n_edges)
    b = rng.randint(0, n_nodes, n_edges)
    df = pd.DataFrame(
        {"left_id": [f"n{x:05d}" for x in a], "right_id": [f"n{x:05d}" for x in b]}
    )
    return df[df.left_id != df.right_id].reset_index(drop=True)


def _nx_labels(df: pd.DataFrame) -> dict[str, str]:
    g = nx.Graph()
    g.add_edges_from(zip(df.left_id, df.right_id))
    return {n: min(c) for c in nx.connected_components(g) for n in c}


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_driver_union_find_matches_networkx(seed):
    df = _random_edges(200, 300, seed)
    got = connected_components_driver(rd.from_pandas(df))
    expect = _nx_labels(df)
    assert dict(zip(got.doc_id, got.entity_id)) == expect


@pytest.mark.parametrize("seed", [7, 8])
def test_distributed_matches_networkx(seed):
    df = _random_edges(120, 150, seed)
    labels = connected_components_distributed(rd.from_pandas(df), num_partitions=4)
    got = labels.to_pandas()
    expect = _nx_labels(df)
    assert dict(zip(got.doc_id, got.entity_id)) == expect


def test_distributed_long_chain():
    # a path graph needs several propagation rounds
    n = 40
    df = pd.DataFrame(
        {
            "left_id": [f"n{i:03d}" for i in range(n - 1)],
            "right_id": [f"n{i + 1:03d}" for i in range(n - 1)],
        }
    )
    labels = connected_components_distributed(rd.from_pandas(df), num_partitions=2, max_rounds=20)
    got = labels.to_pandas()
    assert set(got.entity_id) == {"n000"}
    assert len(got) == n


def test_attach_singletons():
    import pyarrow as pa

    edges = rd.from_pandas(pd.DataFrame({"left_id": ["a"], "right_id": ["b"]}))
    labels = connected_components_driver(edges)
    ents = rd.from_arrow(pa.table({"doc_id": ["a", "b", "c"]}))
    out = attach_singletons(rd.from_pandas(labels), ents, num_partitions=2).to_pandas()
    m = dict(zip(out.doc_id, out.entity_id))
    assert m == {"a": "a", "b": "a", "c": "c"}


def test_no_match_corpus_all_singletons():
    """A corpus where nothing matches must produce one singleton cluster
    per doc, not crash on the empty edge set (r2 streaming-fold bug)."""
    import pyarrow as pa
    import ray.data as rd

    from entity_matching_datasets_ray.stages.clustering import (
        attach_singletons,
        connected_components,
    )

    edges = rd.from_arrow(
        pa.table({"left_id": pa.array([], pa.string()), "right_id": pa.array([], pa.string())})
    )
    entities = rd.from_arrow(pa.table({"doc_id": pa.array(["a", "b", "c"])}))
    labels = connected_components(edges, num_partitions=2)
    out = attach_singletons(labels, entities, num_partitions=2).to_pandas()
    assert sorted(out["doc_id"]) == ["a", "b", "c"]
    assert (out["doc_id"] == out["entity_id"]).all()
