"""Checkpoint/resume tests: skip-completed semantics, byte-identical output."""

import os
import re
import shutil

import pyarrow as pa
import pytest
import ray.data as rd

from entity_matching_datasets_ray.state.lineage import (
    StageCheckpoint,
    partition_fingerprint,
    run_stage,
)


@pytest.fixture()
def tmp_root(tmp_path):
    return str(tmp_path / "ckpt")


def _input_ds(n=200):
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": [f"d{i:04d}" for i in range(n)],
                "value": list(range(n)),
            }
        )
    )


def _make_double():
    # defined as a closure so Ray cloudpickles it by value (a module-level
    # function in a test file is pickled by reference and isn't importable
    # from worker processes)
    def double(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.set_column(
            t.schema.get_field_index("value"), "value", pc.multiply(t["value"], pa.scalar(2))
        )

    return double


def test_fingerprint_order_independent():
    t1 = pa.table({"a": ["x", "y", "z"]})
    t2 = pa.table({"a": ["z", "x", "y"]})
    t3 = pa.table({"a": ["x", "y", "w"]})
    assert partition_fingerprint(t1) == partition_fingerprint(t2)
    assert partition_fingerprint(t1) != partition_fingerprint(t3)


def test_run_stage_and_resume(tmp_root):
    out1, report1 = run_stage(_input_ds(), tmp_root, "double", _make_double(), num_partitions=4)
    df1 = out1.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert not report1["skipped"].any()
    assert len(df1) == 200
    assert (df1["value"] == df1.index * 2).all()

    # second run with identical input: every partition skips, output identical
    out2, report2 = run_stage(_input_ds(), tmp_root, "double", _make_double(), num_partitions=4)
    assert report2["skipped"].all()
    df2 = out2.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert df1.equals(df2)


def test_resume_after_partial_loss(tmp_root):
    run_stage(_input_ds(), tmp_root, "double", _make_double(), num_partitions=4)
    # simulate a crash that lost one partition's data+manifest
    ckpt = StageCheckpoint(tmp_root, "double")
    shutil.rmtree(ckpt._part_dir(2))
    os.remove(ckpt._entry_path(2))

    out, report = run_stage(_input_ds(), tmp_root, "double", _make_double(), num_partitions=4)
    byp = report.set_index("partition")["skipped"]
    assert not byp.loc[2]
    assert byp.drop(2).all()
    df = out.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert len(df) == 200 and (df["value"] == df.index * 2).all()


def test_changed_input_invalidates(tmp_root):
    run_stage(_input_ds(), tmp_root, "double", _make_double(), num_partitions=4)
    changed = rd.from_arrow(
        pa.table(
            {
                "doc_id": [f"d{i:04d}" for i in range(200)],
                "value": [v + 1 for v in range(200)],
            }
        )
    )
    out, report = run_stage(changed, tmp_root, "double", _make_double(), num_partitions=4)
    assert not report["skipped"].any()
    df = out.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert (df["value"] == (df.index + 1) * 2).all()


def test_manifest_records_lineage(tmp_root):
    run_stage(_input_ds(), tmp_root, "double", _make_double(), num_partitions=4)
    entries = StageCheckpoint(tmp_root, "double").manifest()
    assert len(entries) == 4
    for e in entries:
        assert e["stage"] == "double"
        assert e["rows"] > 0
        assert re.fullmatch(r"[0-9a-f]{16}-\d+", e["input_fingerprint"])
