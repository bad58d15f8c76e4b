"""Streaming micro-batch linkage: successive delta folds must match a
single full run on the union, and resume from checkpoint must continue
identically."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from entity_matching_datasets_ray.pipelines.evaluate import pairwise_f1
from entity_matching_datasets_ray.pipelines.linkage import LinkageConfig
from entity_matching_datasets_ray.pipelines.streaming import StreamingLinkage
from entity_matching_datasets_ray.synth import synth_docs_table, truth_pairs


def _splits(n=240, parts=3):
    tbl = synth_docs_table(n)
    out = []
    for k in range(parts):
        mask = pa.array([i % parts == k for i in range(tbl.num_rows)])
        out.append(rd.from_arrow(tbl.filter(mask)))
    return tbl, out


def test_streaming_folds_match_full_run(tmp_path):
    tbl, deltas = _splits()
    cfg = LinkageConfig(num_partitions=4)
    sl = StreamingLinkage(cfg, checkpoint_dir=str(tmp_path))
    for d in deltas:
        clusters = sl.fold_delta(d)
    assert sl.step == 3
    gold = rd.from_arrow(truth_pairs(240))
    m = pairwise_f1(clusters, gold, num_partitions=4)
    assert m["f1"] >= 0.99, m
    # every doc exactly once
    df = clusters.to_pandas()
    assert len(df) == tbl.num_rows
    assert df["doc_id"].is_unique

    # resume from the persisted checkpoint and fold one more delta
    extra_tbl = synth_docs_table(260)
    mask = pa.array([i >= sum(d.count() for d in deltas) for i in range(extra_tbl.num_rows)])
    extra = rd.from_arrow(extra_tbl.filter(mask))
    if extra.count() > 0:
        sl2 = StreamingLinkage.resume(str(tmp_path), rd.from_arrow(tbl), cfg)
        assert sl2.step == 3
        c2 = sl2.fold_delta(extra)
        assert sl2.step == 4
        assert c2.count() == tbl.num_rows + extra.count()


def _new_vocab_docs(n_entities: int) -> pa.Table:
    """Docs whose vocabulary is entirely unseen by synth_docs_table —
    each entity twice (an exact near-dup pair) with unique tokens."""
    from entity_matching_datasets_ray.schema import DOCS_SCHEMA

    rows = []
    for i in range(n_entities):
        for c in range(2):
            rows.append(
                {
                    "doc_id": f"driftfam:{i:08d}:{c}",
                    "dataset": "driftfam",
                    "spans": [
                        {
                            "kind": "text",
                            "text": f"name=zqx{i}alpha zqx{i}beta zqx{i}gamma wblorp{i}",
                            "media_ref": "",
                            "offset": 0,
                        }
                    ],
                }
            )
    return pa.Table.from_pylist(rows, schema=DOCS_SCHEMA)


def test_streaming_idf_drift_triggers_full_recompute(ray_session):
    """A vocabulary-shifted delta must trip the KMV drift trigger, run a
    FULL recompute, and produce exactly the clusters of a from-scratch
    run over the union; a same-vocabulary delta stays incremental."""
    from entity_matching_datasets_ray.pipelines.linkage import run_linkage

    base_tbl = synth_docs_table(60)
    cfg = LinkageConfig(num_partitions=4)
    sl = StreamingLinkage(cfg, drift_threshold=0.3)
    sl.fold_delta(rd.from_arrow(base_tbl))
    assert sl.last_fold_mode == "full"  # founding run

    # same-vocabulary delta (entities 60..69 of the same generator):
    # drift stays under threshold -> incremental fold
    bigger = synth_docs_table(70)
    base_ids = set(base_tbl["doc_id"].to_pylist())
    mask = pa.array([d not in base_ids for d in bigger["doc_id"].to_pylist()])
    sl.fold_delta(rd.from_arrow(bigger.filter(mask)))
    assert sl.last_fold_mode == "incremental", sl.last_drift
    assert sl.last_drift <= 0.3

    # vocabulary-shifted delta: ~600 brand-new tokens -> full recompute
    shifted = _new_vocab_docs(150)
    clusters = sl.fold_delta(rd.from_arrow(shifted))
    assert sl.last_fold_mode == "full", sl.last_drift
    assert sl.last_drift > 0.3
    # the full-recompute fold must equal a from-scratch run on the union
    expected = run_linkage(
        rd.from_arrow(pa.concat_tables([bigger, shifted])), cfg
    ).to_pandas().sort_values("doc_id").reset_index(drop=True)
    got = clusters.to_pandas().sort_values("doc_id").reset_index(drop=True)
    import pandas as pd

    pd.testing.assert_frame_equal(got[["doc_id", "entity_id"]], expected[["doc_id", "entity_id"]])
