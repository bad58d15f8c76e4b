"""Larger-than-memory guarantee, CI-protected (VERDICT r02 #10).

Runs tools/spill_probe.py in a subprocess (it needs its own Ray session
with a constrained object store, which the session fixture can't provide)
and asserts the flagship linkage COMPLETED under a store far smaller than
its intermediate pair/feature volume, with actual disk spill observed —
i.e. no stage materializes the input on one worker's heap.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.spill
def test_spill_probe_completes_and_spills():
    # 12k entities (~32k docs, ~2M candidate pairs) through a 256 MB store:
    # several hundred MB of pair/feature blocks must spill, not OOM.
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "spill_probe.py"), "12000", "256", "4"],
        capture_output=True,
        text=True,
        timeout=900,
        cwd=REPO,
        env={**os.environ, "RAY_ADDRESS": ""},
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    result = json.loads(proc.stdout.strip().splitlines()[-1])
    assert result["completed"] is True
    assert result["n_cluster_rows"] > 12_000
    assert result["spilled_mb"] > 0, f"no spill observed: {result}"
