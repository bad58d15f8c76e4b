"""End-to-end linkage pipeline tests: F1 target + span invariant.

North-rule gates (BASELINE.json): pairwise F1 >= 0.99 on the labeled
duplicates at identical blocking keys; per-row span-sequence equality
(kind, text, media_ref, order) preserved end-to-end.
"""

import pyarrow as pa
import pytest
import ray.data as rd

from entity_matching_datasets_ray.pipelines.evaluate import confusion_f1, pairwise_f1
from entity_matching_datasets_ray.pipelines.linkage import LinkageConfig, run_linkage
from entity_matching_datasets_ray.stages.extract import extract_entities, extract_stage
from entity_matching_datasets_ray.synth import synth_docs_table, truth_pairs

N_ENTITIES = 400


@pytest.fixture(scope="module")
def docs_table():
    return synth_docs_table(N_ENTITIES)


def test_f1_target(docs_table):
    docs = rd.from_arrow(docs_table)
    gold = rd.from_arrow(truth_pairs(N_ENTITIES))
    clusters = run_linkage(docs, LinkageConfig(num_partitions=4, threshold=0.5))
    m = pairwise_f1(clusters, gold, num_partitions=4)
    assert m["f1"] >= 0.99, m


def test_span_sequence_invariant(docs_table):
    """The extract stage must pass the spans column through byte-identically
    (kind, text, media_ref, offset order)."""
    out = extract_entities(docs_table)
    assert out.column("spans").to_pylist() == docs_table.column("spans").to_pylist()
    assert out.column("doc_id").to_pylist() == docs_table.column("doc_id").to_pylist()


def test_span_invariant_through_dataset(docs_table):
    docs = rd.from_arrow(docs_table)
    ents = extract_stage(docs).select_columns(["doc_id", "spans"]).to_pandas()
    orig = docs_table.to_pandas().set_index("doc_id")["spans"]
    for doc_id, spans in zip(ents.doc_id, ents.spans):
        expect = orig[doc_id]
        got = list(spans)
        assert len(got) == len(expect)
        for g, e in zip(got, expect):
            assert (g["kind"], g["text"], g["media_ref"], g["offset"]) == (
                e["kind"],
                e["text"],
                e["media_ref"],
                e["offset"],
            )


def test_clusters_are_deterministic(docs_table):
    docs = rd.from_arrow(docs_table)
    c1 = run_linkage(docs, LinkageConfig(num_partitions=4)).to_pandas()
    c2 = run_linkage(docs, LinkageConfig(num_partitions=2)).to_pandas()
    m1 = dict(zip(c1.doc_id, c1.entity_id))
    m2 = dict(zip(c2.doc_id, c2.entity_id))
    assert m1 == m2  # independent of partitioning


def test_canonical_id_is_min_doc_id(docs_table):
    docs = rd.from_arrow(docs_table)
    c = run_linkage(docs, LinkageConfig(num_partitions=4)).to_pandas()
    for ent, grp in c.groupby("entity_id"):
        assert ent == grp.doc_id.min()


def test_confusion_f1_known_counts():
    t = pa.table(
        {
            "gold": pa.array([1, 1, 1, 0, 0, 0, 1, 0], pa.int8()),
            "pred": pa.array([1, 1, 0, 0, 1, 0, 1, 0], pa.int8()),
        }
    )
    m = confusion_f1(rd.from_arrow(t))
    assert m["tp"] == 3 and m["fp"] == 1 and m["fn"] == 1 and m["tn"] == 3
    assert m["precision"] == pytest.approx(0.75)
    assert m["recall"] == pytest.approx(0.75)


def test_global_snm_f1_holds():
    """True sorted-neighborhood (global sort + boundary exchange) keeps the
    F1 gate at the same candidate budget."""
    from entity_matching_datasets_ray.pipelines.evaluate import pairwise_f1
    from entity_matching_datasets_ray.pipelines.flagship import synthetic_linkage
    from entity_matching_datasets_ray.pipelines.linkage import LinkageConfig, run_linkage
    import ray.data as rd
    from entity_matching_datasets_ray.synth import synth_docs_table, truth_pairs

    docs = rd.from_arrow(synth_docs_table(300))
    gold = rd.from_arrow(truth_pairs(300))
    clusters = run_linkage(
        docs,
        LinkageConfig(num_partitions=4, snm_strategy="global", blocking_path="multi"),
    )
    m = pairwise_f1(clusters, gold, num_partitions=4)
    assert m["f1"] >= 0.99, m


def test_incremental_linkage_matches_full_recompute():
    """Folding a delta into existing clusters must reproduce the full
    recompute's pairwise decisions (same scorer, delta-only candidate
    emission, label-edge transitivity)."""
    import pandas as pd
    import ray.data as rd

    from entity_matching_datasets_ray.pipelines.evaluate import pairwise_f1
    from entity_matching_datasets_ray.pipelines.linkage import (
        LinkageConfig,
        run_linkage,
        run_linkage_incremental,
    )
    from entity_matching_datasets_ray.synth import synth_docs_table, truth_pairs

    import pyarrow as pa
    import pyarrow.compute as pc

    full_tbl = synth_docs_table(300)
    # deterministic split: every 7th row is the delta (cuts across
    # entities, so some delta docs must join existing clusters)
    mask = pa.array([i % 7 == 0 for i in range(full_tbl.num_rows)])
    new_tbl = full_tbl.filter(mask)
    old_tbl = full_tbl.filter(pc.invert(mask))
    old_docs = rd.from_arrow(old_tbl)
    new_docs = rd.from_arrow(new_tbl)
    df = full_tbl.select(["doc_id"]).to_pandas()
    cfg = LinkageConfig(num_partitions=4)

    old_clusters = run_linkage(old_docs, cfg)
    inc = run_linkage_incremental(old_clusters, old_docs, new_docs, cfg)
    gold = rd.from_arrow(truth_pairs(300))
    m = pairwise_f1(inc, gold, num_partitions=4)
    assert m["f1"] >= 0.99, m

    # every doc present exactly once; new docs appear
    inc_df = inc.to_pandas()
    assert len(inc_df) == len(df)
    assert set(inc_df["doc_id"]) == set(df["doc_id"])

    # old components never split: docs clustered together before stay
    # together after the delta fold
    old_df = old_clusters.to_pandas()
    merged = old_df.merge(inc_df, on="doc_id", suffixes=("_old", "_inc"))
    for _, g in merged.groupby("entity_id_old"):
        assert g["entity_id_inc"].nunique() == 1
