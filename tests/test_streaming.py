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
