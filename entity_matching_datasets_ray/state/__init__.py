"""Run state: per-partition lineage manifests, checkpoint/resume."""
