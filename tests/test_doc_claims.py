"""Perf-claim drift lock (VERDICT r4 #1): README/PARITY numbers must exist
in committed benchmark JSON. Pure host check — no jax involved."""

import os
import subprocess
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_doc_perf_claims_match_committed_bench():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO_ROOT, "scripts", "check_doc_claims.py")],
        capture_output=True, text=True, timeout=120,
    )
    assert proc.returncode == 0, (
        "doc perf claims drifted from committed benchmark JSON:\n" + proc.stdout
    )
