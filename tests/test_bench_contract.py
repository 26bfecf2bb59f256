"""bench.py's driver contract (VERDICT r3 #1a): the backend probe runs
BEFORE any in-process jax touch, bounded retries, and EVERY failure path
still prints exactly ONE JSON line."""

import json
import subprocess
import sys

import pytest

import bench


class TestProbeBackend:
    def test_probe_failure_returns_reason(self, monkeypatch):
        calls = {"n": 0}

        def fake_run(*a, **k):
            calls["n"] += 1
            return subprocess.CompletedProcess(a, returncode=1, stdout="", stderr="boom: backend dead")

        monkeypatch.setattr(subprocess, "run", fake_run)
        monkeypatch.setattr(bench.time, "sleep", lambda s: None)
        reason = bench.probe_backend(attempts=3, timeout_s=1.0)
        assert reason is not None and "backend dead" in reason
        assert calls["n"] == 3  # bounded retries, all consumed

    def test_probe_timeout_reported(self, monkeypatch):
        def fake_run(*a, **k):
            raise subprocess.TimeoutExpired(cmd="x", timeout=k.get("timeout", 1))

        monkeypatch.setattr(subprocess, "run", fake_run)
        monkeypatch.setattr(bench.time, "sleep", lambda s: None)
        reason = bench.probe_backend(attempts=2, timeout_s=1.0)
        assert "timed out" in reason

    def test_probe_success_short_circuits(self, monkeypatch):
        calls = {"n": 0}

        def fake_run(*a, **k):
            calls["n"] += 1
            return subprocess.CompletedProcess(a, returncode=0, stdout="OK cpu\n", stderr="")

        monkeypatch.setattr(subprocess, "run", fake_run)
        assert bench.probe_backend(attempts=3, timeout_s=1.0) is None
        assert calls["n"] == 1


class TestOneJsonLineContract:
    def test_backend_down_prints_one_json_line(self, monkeypatch, capsys):
        """With the backend unavailable, main() must emit exactly one JSON
        line carrying the error AND the torch baseline (which needs no jax)."""
        monkeypatch.setattr(bench, "probe_backend", lambda *a, **k: "backend unavailable (test)")
        monkeypatch.setattr(bench, "get_baseline", lambda *a, **k: 123.4)
        bench.main()
        out = capsys.readouterr().out.strip().splitlines()
        assert len(out) == 1
        payload = json.loads(out[0])
        assert payload["value"] is None
        assert "backend unavailable" in payload["error"]
        assert payload["baseline_torch_cpu"] == 123.4

    def test_workload_builds_without_backend(self, monkeypatch):
        """_workload() must not need a live backend (resolve_process falls
        back to (0, 1)) — the regression that nulled BENCH_r03."""
        import mer_tpu.data.process_sharding as ps

        def boom(*a, **k):
            raise RuntimeError("backend init failed")

        monkeypatch.setattr(ps, "resolve_process", ps.resolve_process)  # sanity
        import jax

        monkeypatch.setattr(jax, "process_count", boom)
        monkeypatch.setattr(jax, "process_index", boom)
        batcher, n_utt = bench._workload()
        assert n_utt > 2000  # MELD-test-shaped
        assert len(list(batcher)) > 0
