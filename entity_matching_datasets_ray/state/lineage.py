"""Per-partition lineage checkpointing: resumable stage outputs.

Generalizes the only resumability pattern in the reference — the
content-addressed LLM response cache (wdc.zip -> wdc/computers/
prompt.py:13-20,169-178: rerun = cache hits) — to whole pipeline stages
(north rule: "checkpoint per-partition lineage and counters to resume
mid-run", BASELINE.json:14).

Layout on disk (one directory per checkpointed stage):

    <root>/<stage>/
        part=<k>/...parquet        partition data (atomic: tmp dir + rename)
        _manifest/<k>.json         lineage entry, written AFTER the data

A partition's manifest entry records (stage, partition id, input
fingerprint, row count, wall time). ``run_stage`` skips any partition
whose manifest entry exists AND matches the current input fingerprint —
a restarted job redoes only unfinished/ invalidated partitions. The input
fingerprint is an order-independent XOR over row-content hashes, so it is
stable under repartitioning and execution order.
"""

from __future__ import annotations

import json
import os
import shutil
import time

import pyarrow as pa
import pyarrow.parquet as pq


def partition_fingerprint(table: pa.Table, columns: list[str] | None = None) -> str:
    """Order-independent content fingerprint of a table: one vectorized
    ``hash_pandas_object`` pass + wrap-sum-with-count of the per-row
    hashes (the clustering ``_edges_checksum`` pattern — was a per-row
    blake2b Python loop, VERDICT r02 item 6). Sum mod 2^64 plus the row
    count is commutative across row order and, unlike XOR, doesn't cancel
    duplicate rows. ``hash_pandas_object`` is deterministic cross-process
    (fixed default key)."""
    import numpy as np
    import pandas as pd

    cols = columns or table.column_names
    df = table.select(cols).to_pandas()
    if len(df) == 0:
        return f"{0:016x}-0"
    h = pd.util.hash_pandas_object(df, index=False).to_numpy(dtype=np.uint64)
    with np.errstate(over="ignore"):
        s = int(np.sum(h, dtype=np.uint64))
    return f"{s:016x}-{len(df)}"


class StageCheckpoint:
    """Checkpointed execution of a partitioned stage."""

    def __init__(self, root: str, stage: str):
        self.root = root
        self.stage = stage
        self.stage_dir = os.path.join(root, stage)
        self.manifest_dir = os.path.join(self.stage_dir, "_manifest")
        os.makedirs(self.manifest_dir, exist_ok=True)

    # -- manifest ----------------------------------------------------------

    def _entry_path(self, part: int) -> str:
        return os.path.join(self.manifest_dir, f"{part}.json")

    def completed(self, part: int, input_fingerprint: str) -> bool:
        p = self._entry_path(part)
        if not os.path.exists(p):
            return False
        try:
            with open(p) as f:
                entry = json.load(f)
        except (json.JSONDecodeError, OSError):
            return False
        return entry.get("input_fingerprint") == input_fingerprint and os.path.isdir(
            self._part_dir(part)
        )

    def manifest(self) -> list[dict]:
        out = []
        for name in sorted(os.listdir(self.manifest_dir)):
            if name.endswith(".json"):
                with open(os.path.join(self.manifest_dir, name)) as f:
                    out.append(json.load(f))
        return out

    # -- data --------------------------------------------------------------

    def _part_dir(self, part: int) -> str:
        return os.path.join(self.stage_dir, f"part={part}")

    def write_partition(
        self, part: int, table: pa.Table, input_fingerprint: str, counters: dict | None = None
    ) -> None:
        """Atomic: write to tmp dir, rename, then write the manifest entry
        (the entry is the commit point — a crash between rename and entry
        just redoes the partition)."""
        final = self._part_dir(part)
        tmp = final + ".tmp"
        if os.path.isdir(tmp):
            shutil.rmtree(tmp)
        os.makedirs(tmp, exist_ok=True)
        pq.write_table(table, os.path.join(tmp, "data.parquet"))
        if os.path.isdir(final):
            shutil.rmtree(final)
        os.rename(tmp, final)
        entry = {
            "stage": self.stage,
            "partition": part,
            "input_fingerprint": input_fingerprint,
            "rows": table.num_rows,
            "wall_time": time.time(),
            "counters": counters or {},
        }
        ep = self._entry_path(part)
        with open(ep + ".tmp", "w") as f:
            json.dump(entry, f)
        os.replace(ep + ".tmp", ep)

    def read_partition(self, part: int) -> pa.Table:
        return pq.read_table(os.path.join(self._part_dir(part), "data.parquet"))

    def output_paths(self) -> list[str]:
        return [
            os.path.join(self.stage_dir, d, "data.parquet")
            for d in sorted(os.listdir(self.stage_dir))
            if d.startswith("part=") and not d.endswith(".tmp")
        ]


def run_stage(
    ds,
    root: str,
    stage: str,
    fn,
    num_partitions: int = 16,
    key_columns: list[str] | None = None,
):
    """Execute ``fn(partition_table) -> table | (table, counters)`` over
    hash partitions of ``ds`` with per-partition checkpointing; returns a
    Dataset over the stage's (existing + newly written) partition files.
    ``counters`` (a small dict) is recorded in the partition's manifest
    entry — the per-partition lineage *and counters* the north rule asks
    to checkpoint.

    Partitioning is deterministic (hash of the first key column), so a
    resumed run sees identical partition contents and can trust the
    fingerprints. Completed partitions are never recomputed (their tasks
    short-circuit on the manifest check inside the worker).
    """
    import ray.data as rd

    ckpt = StageCheckpoint(root, stage)
    keys = key_columns or [ds.schema().names[0]]

    def add_part(t: pa.Table) -> pa.Table:
        # vectorized + deterministic across resumes: hash_pandas_object
        # uses a fixed default key, so a resumed run assigns identical
        # partitions and the fingerprints stay trustworthy
        from ..functions.hashing import pandas_bucket

        keys_pd = t.column(keys[0]).to_pandas().astype(str)
        parts = pandas_bucket(keys_pd, num_partitions)
        return t.append_column("__part", pa.array(parts, pa.int32()))

    def process(df) -> pa.Table:
        # df: pandas within one partition group
        part = int(df["__part"].iloc[0])
        table = pa.Table.from_pandas(df.drop(columns="__part"), preserve_index=False)
        fp = partition_fingerprint(table)
        if ckpt.completed(part, fp):
            return pa.table({"partition": pa.array([part], pa.int32()),
                             "skipped": pa.array([True]),
                             "rows": pa.array([ckpt.read_partition(part).num_rows], pa.int64())})
        res = fn(table)
        out, counters = res if isinstance(res, tuple) else (res, {})
        ckpt.write_partition(part, out, fp, counters)
        return pa.table({"partition": pa.array([part], pa.int32()),
                         "skipped": pa.array([False]),
                         "rows": pa.array([out.num_rows], pa.int64())})

    report = (
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("__part", num_partitions=num_partitions)
        .map_groups(process, batch_format="pandas")
    ).to_pandas()

    paths = ckpt.output_paths()
    out_ds = rd.read_parquet(paths) if paths else rd.from_arrow(pa.table({}))
    return out_ds, report
