"""Utils: profiler trace capture, step timing, run logging."""

import os

import numpy as np

import jax
import jax.numpy as jnp

from mer_tpu.core import Config
from mer_tpu.utils import RunLogger, StepTimer, trace


class TestProfiling:
    def test_trace_writes_profile(self, tmp_path):
        log_dir = str(tmp_path / "trace")
        with trace(log_dir):
            x = jnp.ones((128, 128))
            jax.block_until_ready(jnp.dot(x, x))
        # jax writes plugins/profile/<timestamp>/*.xplane.pb under log_dir
        found = []
        for root, _, files in os.walk(log_dir):
            found.extend(f for f in files if f.endswith(".xplane.pb"))
        assert found, "no profiler artifacts written"

    def test_trace_noop_without_dir(self):
        with trace(None):
            pass  # must not raise

    def test_step_timer(self):
        t = StepTimer()
        for _ in range(3):
            t.start()
            x = jnp.ones((64, 64)) * 2
            t.stop(x)
        assert len(t.times) == 3
        assert t.mean > 0 and t.best <= t.mean
        assert t.throughput(64) > 0


class TestRunLogger:
    def test_console_logging_and_no_step_sync(self, capsys):
        logger = RunLogger(Config({"wandb": {"enabled": False}}))
        assert logger.wants_step_logs is False
        logger.log_epoch(0, lr=1e-3, loss_train=1.0, loss_val=2.0, accuracy=0.5, weighted_f1=0.4, epoch_seconds=1.2)
        out = capsys.readouterr().out
        assert "Epoch: 0" in out and "Accuracy=[50.000%]" in out
        logger.finish()

    def test_none_config(self):
        logger = RunLogger(None)
        logger.print("hello")
        logger.log_step(1.0)
        logger.finish()


class TestPreflight:
    def test_missing_assets_reported(self, tmp_path, capsys):
        from mer_tpu.tools import preflight

        rc = preflight(str(tmp_path))
        out = capsys.readouterr().out
        assert rc == 1
        assert "MISSING" in out and "MELD_download.sh" in out

    def test_synthetic_root_csvs_ok(self, tmp_path, capsys):
        import subprocess
        import sys as _sys

        from mer_tpu.tools import preflight

        root = tmp_path / "meld"
        r = subprocess.run(
            [_sys.executable, "scripts/make_synthetic_meld.py", str(root), "--dialogues", "4"],
            capture_output=True, text=True,
        )
        assert r.returncode == 0, r.stderr
        preflight(str(root))
        out = capsys.readouterr().out
        assert "[ok] train CSV" in out and "[ok] train wavs" in out
