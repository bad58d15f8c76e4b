"""Two-table (A x B) linkage: planted correspondence recovery, cross-only
pair emission, id namespacing, and the mutual-best (one_to_one) filter."""

import pandas as pd
import pyarrow as pa
import ray.data as rd

from entity_matching_datasets_ray.pipelines.linkage import LinkageConfig, run_linkage_two_table
from entity_matching_datasets_ray.synth import PLANTED_ID_OFFSET, planted_linkage_docs


def _ids(n):
    return rd.from_arrow(pa.table({"doc_id": list(range(n))}))


def test_two_table_planted_recovery(ray_session):
    n = 60
    docs_a = planted_linkage_docs(_ids(n), copies=1, first_copy=0)
    off = rd.from_arrow(pa.table({"doc_id": [i + PLANTED_ID_OFFSET for i in range(n)]}))
    docs_b = planted_linkage_docs(_ids(n), copies=1, first_copy=1).union(
        planted_linkage_docs(off, copies=1, first_copy=0)
    )
    got = (
        run_linkage_two_table(docs_a, docs_b, LinkageConfig(num_partitions=4))
        .to_pandas()
        .sort_values(["a_id", "b_id"])
        .reset_index(drop=True)
    )
    want = pd.DataFrame(
        {
            "a_id": [f"p:{i:08d}:0" for i in range(n)],
            "b_id": [f"p:{i:08d}:1" for i in range(n)],
        }
    )
    assert list(got["a_id"]) == list(want["a_id"])
    assert list(got["b_id"]) == list(want["b_id"])
    # cross-only: every output pair is A on the left, B on the right —
    # output ids are stripped of the namespace, so check shape instead:
    # no id appears on both sides (A ids end :0, B ids end :1 here)
    assert (got["a_id"].str.endswith(":0")).all()
    assert (got["b_id"].str.endswith(":1")).all()
    # default (non-one_to_one) output carries the score column
    assert "score" in got.columns and (got["score"] >= 0.7).all()


def test_two_table_one_to_one_mutual_best(ray_session):
    # two A docs near-identical to one B doc: without one_to_one both match;
    # with one_to_one only the mutual best survives.
    n = 30
    docs_a = planted_linkage_docs(_ids(n), copies=2, first_copy=0)  # p:i:0, p:i:1 on A side
    docs_b = planted_linkage_docs(_ids(n), copies=1, first_copy=2)  # p:i:2 on B side
    many = run_linkage_two_table(docs_a, docs_b, LinkageConfig(num_partitions=4)).to_pandas()
    # both A copies match the single B doc
    assert len(many) == 2 * n
    one = run_linkage_two_table(
        docs_a, docs_b, LinkageConfig(num_partitions=4), one_to_one=True
    ).to_pandas()
    assert len(one) == n
    # deterministic tie-break: equal scores -> smallest partner id (copy 0)
    assert sorted(one["a_id"]) == [f"p:{i:08d}:0" for i in range(n)]


def test_one_to_one_keeps_scores(ray_session):
    n = 12
    docs_a = planted_linkage_docs(_ids(n), copies=1, first_copy=0)
    docs_b = planted_linkage_docs(_ids(n), copies=1, first_copy=1)
    out = run_linkage_two_table(
        docs_a, docs_b, LinkageConfig(num_partitions=4), one_to_one=True
    ).to_pandas()
    assert sorted(out.columns) == ["a_id", "b_id", "score"]
    assert len(out) == n and (out["score"] >= 0.7).all()
