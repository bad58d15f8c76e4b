"""Larger-than-memory probe: run the flagship linkage under a constrained
object store and verify the streaming executor spills instead of OOMing.

Evidence for the 100 TB design claim: no stage materializes the full
input on any single worker's heap, so when blocks exceed the object
store the pipeline degrades to disk spill, not failure.

Usage:
    python tools/spill_probe.py [n_entities] [object_store_mb] [num_cpus] [mode]

Defaults: 60000 entities (~162k docs), 1024 MB store, 16 CPUs — the
candidate stream (several GB of pair/feature blocks) is forced through a
1 GB store. Prints one JSON line with wall, phases and spilled bytes.

``mode`` (default ``flagship``): ``two_table`` probes the CROSS-ONLY
A x B pipeline instead (VERDICT r4 item 8 — its shuffle shapes differ:
tagged-union key emission, cross-only pair emission, mutual-best-free
tail): the synthetic corpus splits into A = copy-0 docs, B = the other
copies, so every entity has cross-side matches.
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time


def spilled_bytes(session_dir: str) -> int:
    total = 0
    for pattern in ("ray_spilled_objects*", "**/ray_spilled_objects*"):
        for d in glob.glob(os.path.join(session_dir, pattern), recursive=True):
            for root, _dirs, files in os.walk(d):
                for f in files:
                    try:
                        total += os.path.getsize(os.path.join(root, f))
                    except OSError:
                        pass
    return total


def main() -> dict:
    n_entities = int(sys.argv[1]) if len(sys.argv) > 1 else 60_000
    store_mb = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    num_cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 16

    import ray
    from ray.data import DataContext

    ray.init(
        address="local",
        num_cpus=num_cpus,
        object_store_memory=store_mb * 1024 * 1024,
        include_dashboard=False,
        logging_level="ERROR",
        log_to_driver=False,
    )
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    mode = sys.argv[4] if len(sys.argv) > 4 else "flagship"

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from entity_matching_datasets_ray.pipelines.linkage import (
        LinkageConfig,
        run_linkage,
        run_linkage_two_table,
    )
    from entity_matching_datasets_ray.synth import synth_docs_dataset

    session_dir = ray._private.worker._global_node.get_session_dir_path()

    t0 = time.time()
    docs = synth_docs_dataset(n_entities, parallelism=num_cpus * 4)
    timings: dict = {}
    cfg = LinkageConfig(
        num_partitions=num_cpus,
        scorer_concurrency=(1, max(2, num_cpus - 4)),
        # shuffle join path: at true scale the entity table is never
        # broadcast; force the big-side code path under memory pressure
        join_strategy="shuffle",
    )
    if mode == "two_table":
        import pyarrow as pa
        import pyarrow.compute as pc

        def side(keep_copy0: bool):
            def flt(t: pa.Table) -> pa.Table:
                is0 = pc.ends_with(t["doc_id"], ":0")
                return t.filter(is0 if keep_copy0 else pc.invert(is0))

            return docs.map_batches(flt, batch_format="pyarrow")

        clusters = run_linkage_two_table(side(True), side(False), cfg, timings=timings)
    else:
        clusters = run_linkage(docs, cfg, timings=timings)
    out_dir = "/tmp/spill_probe_clusters"
    import shutil

    shutil.rmtree(out_dir, ignore_errors=True)
    # consume by writing partitioned parquet — no driver materialization
    clusters.write_parquet(out_dir)
    wall = time.time() - t0
    import pyarrow.dataset as pads

    n_rows = pads.dataset(out_dir).count_rows()
    result = {
        "metric": "spill_probe_sec",
        "value": round(wall, 2),
        "unit": "sec",
        "n_entities": n_entities,
        "n_cluster_rows": n_rows,
        "object_store_mb": store_mb,
        "num_cpus": num_cpus,
        "phases": timings,
        "spilled_mb": round(spilled_bytes(session_dir) / 1e6, 1),
        "completed": True,
    }
    ray.shutdown()
    return result


if __name__ == "__main__":
    real_stdout = os.dup(1)
    os.dup2(2, 1)
    sys.stdout = os.fdopen(os.dup(2), "w")
    try:
        result = main()
    finally:
        sys.stdout.flush()
    os.write(real_stdout, (json.dumps(result) + "\n").encode())
