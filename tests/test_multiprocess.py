"""Two-process jax.distributed execution test (the P4 multi-host axis).

The reference has nothing distributed (SURVEY.md §2.2); mer_tpu's multi-host
surface (initialize_distributed, process-indexed batchers, GSPMD over a
global mesh) was previously only unit-tested inside ONE process by simulating
process_index.  This spawns two REAL processes, each owning 4 virtual CPU
devices, linked by a coordinator — the CPU-backend analog of a 2-host TPU
pod — and asserts cross-process collectives and data sharding behave.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO_ROOT, "tests", "_mp_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_distributed(tmp_path):
    port = _free_port()
    n = 2
    outs = [str(tmp_path / f"p{i}.json") for i in range(n)]
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # worker sets its own
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(i), str(n), str(port), outs[i]],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for i in range(n)
    ]
    results = []
    for i, p in enumerate(procs):
        try:
            stdout, stderr = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail(f"worker {i} timed out")
        assert p.returncode == 0, f"worker {i} failed:\n{stderr[-4000:]}"
        with open(outs[i]) as f:
            results.append(json.load(f))

    for i, r in enumerate(results):
        assert r["process_id"] == i
        assert r["process_count"] == n
        assert r["n_global_devices"] == 8  # 2 processes x 4 virtual devices
        assert r["n_local_devices"] == 4
        # psum over device ids 0..7 crossed the process boundary
        assert r["psum_value"] == sum(range(8))
        # GSPMD global mean over the process-assembled dp-sharded array
        np.testing.assert_allclose(r["global_loss"], r["expected_loss"], rtol=1e-6)
        # round-robin batcher slices recombine to the exact global total
        np.testing.assert_allclose(r["batcher_union_sum"], r["batcher_expected_sum"], rtol=1e-5)

    # both processes computed the IDENTICAL replicated gradient
    assert results[0]["grad_checksum"] == results[1]["grad_checksum"]
    np.testing.assert_allclose(results[0]["global_loss"], results[1]["global_loss"], rtol=0)

    # distributed checkpoint: two per-process shard files merge into the
    # exact global table (each worker wrote only its addressable half)
    from mer_tpu.train import load_checkpoint_sharded

    ckpt = load_checkpoint_sharded(str(tmp_path / "sharded_ckpt"))
    assert ckpt["epoch"] == 5 and ckpt["extra"]["note"] == "mp"
    rng = np.random.default_rng(7)
    global_rows = rng.normal(size=(8 * 3, 16)).astype(np.float32)  # worker's seed/shape
    np.testing.assert_array_equal(np.asarray(ckpt["params"]["table"]), global_rows)
    np.testing.assert_array_equal(np.asarray(ckpt["params"]["w"]), np.ones((16,), np.float32))
