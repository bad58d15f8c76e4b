"""Streaming (micro-batch) linkage: fold successive document deltas into
a maintained cluster table.

The stream-shaped entry the reference's batch scripts lack: each call to
``fold_delta`` is one micro-batch — delta-only blocking + scoring
(``run_linkage_incremental``) against the corpus so far, with the cluster
table optionally persisted per step as partitioned Parquet so a crashed
stream resumes from the last fold (the same resumable-output discipline
as state/lineage.py).

At 100 TB scale each fold touches O(delta x block) candidate pairs, never
the old corpus squared; the only full-corpus passes are the key emission
(one map) and the IDF refit (one partial-agg groupby) — both streaming.
"""

from __future__ import annotations

import os

from .linkage import LinkageConfig, run_linkage, run_linkage_incremental


class StreamingLinkage:
    """Maintains (docs so far, clusters so far) across delta folds.

    ``checkpoint_dir``: when set, every fold writes
    ``<dir>/step=<k>/clusters/`` (partitioned parquet) and ``resume()``
    restarts from the highest completed step.
    """

    def __init__(self, config: LinkageConfig | None = None, checkpoint_dir: str | None = None):
        self.cfg = config or LinkageConfig()
        self.checkpoint_dir = checkpoint_dir
        self.docs = None       # Dataset of all docs folded so far
        self.clusters = None   # Dataset (doc_id, entity_id)
        self.step = 0

    def _persist(self):
        if not self.checkpoint_dir:
            return
        out = os.path.join(self.checkpoint_dir, f"step={self.step}", "clusters")
        self.clusters.write_parquet(out)

    def start(self, initial_docs):
        """First micro-batch: a full linkage run."""
        self.docs = initial_docs.materialize()
        self.clusters = run_linkage(self.docs, self.cfg)
        self.step = 1
        self._persist()
        return self.clusters

    def fold_delta(self, new_docs):
        """Fold one delta of new documents into the maintained clusters."""
        if self.docs is None:
            return self.start(new_docs)
        new_docs = new_docs.materialize()
        self.clusters = run_linkage_incremental(
            self.clusters, self.docs, new_docs, self.cfg
        )
        self.docs = self.docs.union(new_docs).materialize()
        self.step += 1
        self._persist()
        return self.clusters

    @classmethod
    def resume(cls, checkpoint_dir: str, all_docs, config: LinkageConfig | None = None):
        """Restart from the highest completed fold: reload its cluster
        table; ``all_docs`` must be the docs covered by that fold."""
        import ray.data as rd

        steps = sorted(
            int(d.split("=")[1])
            for d in os.listdir(checkpoint_dir)
            if d.startswith("step=")
        )
        if not steps:
            raise FileNotFoundError(f"no completed folds under {checkpoint_dir}")
        last = steps[-1]
        inst = cls(config, checkpoint_dir)
        inst.step = last
        inst.docs = all_docs.materialize()
        inst.clusters = rd.read_parquet(
            os.path.join(checkpoint_dir, f"step={last}", "clusters")
        )
        return inst
