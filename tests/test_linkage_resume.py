"""Checkpointed linkage: resume produces identical clusters."""

import os
import shutil

import pytest
import ray.data as rd

from entity_matching_datasets_ray.pipelines.linkage import LinkageConfig, run_linkage
from entity_matching_datasets_ray.state.lineage import StageCheckpoint
from entity_matching_datasets_ray.synth import synth_docs_table

N = 120


def _clusters(tmp_root):
    docs = rd.from_arrow(synth_docs_table(N))
    cfg = LinkageConfig(num_partitions=4, checkpoint_root=tmp_root)
    c = run_linkage(docs, cfg).to_pandas().sort_values("doc_id").reset_index(drop=True)
    return c


def test_checkpointed_equals_plain(tmp_path):
    root = str(tmp_path / "ckpt")
    docs = rd.from_arrow(synth_docs_table(N))
    plain = (
        run_linkage(docs, LinkageConfig(num_partitions=4))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    ckpt = _clusters(root)
    assert plain.equals(ckpt)


def test_resume_after_partition_loss(tmp_path):
    root = str(tmp_path / "ckpt")
    first = _clusters(root)
    sc = StageCheckpoint(root, "score_pairs")
    manifest_before = {e["partition"]: e["wall_time"] for e in sc.manifest()}
    assert len(manifest_before) == 4

    # crash simulation: one partition's output + manifest entry lost
    shutil.rmtree(sc._part_dir(1))
    os.remove(sc._entry_path(1))

    second = _clusters(root)
    assert first.equals(second)  # byte-identical clusters after resume
    manifest_after = {e["partition"]: e["wall_time"] for e in sc.manifest()}
    # only the lost partition was recomputed; the others kept their entries
    assert manifest_after[1] > manifest_before[1]
    for p in (0, 2, 3):
        assert manifest_after[p] == manifest_before[p]
