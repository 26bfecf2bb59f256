"""Solver engine tests: optimizer parity vs torch, end-to-end training on
synthetic MELD-shaped data, checkpoint/resume, early stopping."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from mer_tpu.core import Config
from mer_tpu.data import FusionBatcher, SyntheticFusionDataset
from mer_tpu.models import M2FNet
from mer_tpu.train import (
    Solver,
    constant_with_warmup,
    exponential_lr,
    load_checkpoint,
    save_checkpoint,
    torch_adam,
    torch_adamw,
)

torch = pytest.importorskip("torch")


class TestOptimizerParity:
    def _run_pair(self, make_torch_opt, make_optax_opt, steps=5):
        w0 = np.random.default_rng(0).normal(size=(4, 3)).astype(np.float32)
        target = np.random.default_rng(1).normal(size=(4, 3)).astype(np.float32)

        tw = torch.nn.Parameter(torch.tensor(w0.copy()))
        topt = make_torch_opt([tw])
        for _ in range(steps):
            topt.zero_grad()
            loss = ((tw - torch.tensor(target)) ** 2).sum()
            loss.backward()
            topt.step()

        params = jnp.asarray(w0)
        opt = make_optax_opt()
        opt_state = opt.init(params)
        for _ in range(steps):
            grads = jax.grad(lambda p: ((p - jnp.asarray(target)) ** 2).sum())(params)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)

        np.testing.assert_allclose(np.asarray(params), tw.detach().numpy(), rtol=1e-5, atol=1e-6)

    def test_torch_adam_with_l2_decay(self):
        """torch.optim.Adam(weight_decay=0.01) — the fusion optimizer (src/train.py:56)."""
        self._run_pair(
            lambda ps: torch.optim.Adam(ps, lr=5e-3, weight_decay=0.01),
            lambda: torch_adam(5e-3, weight_decay=0.01),
        )

    def test_torch_adam_no_decay(self):
        self._run_pair(
            lambda ps: torch.optim.Adam(ps, lr=1e-2),
            lambda: torch_adam(1e-2),
        )

    def test_torch_adamw(self):
        """AdamW — the FE optimizer (text/train.py:62-63)."""
        self._run_pair(
            lambda ps: torch.optim.AdamW(ps, lr=1e-3, weight_decay=0.01),
            lambda: torch_adamw(1e-3, weight_decay=0.01),
        )

    def test_exponential_lr_per_epoch(self):
        sched = exponential_lr(1.0, 0.5, steps_per_epoch=10)
        assert float(sched(0)) == 1.0
        assert float(sched(9)) == 1.0
        assert float(sched(10)) == 0.5
        assert float(sched(25)) == 0.25

    def test_constant_with_warmup(self):
        # HF get_constant_schedule_with_warmup: factor = step/warmup, so the
        # first optimizer step runs at lr=0 (reference text/train.py:84)
        sched = constant_with_warmup(1.0, warmup_steps=4)
        np.testing.assert_allclose([float(sched(i)) for i in range(6)], [0.0, 0.25, 0.5, 0.75, 1.0, 1.0])

    def test_constant_with_warmup_matches_hf(self):
        torch = pytest.importorskip("torch")
        transformers = pytest.importorskip("transformers")
        opt = torch.optim.AdamW([torch.nn.Parameter(torch.zeros(1))], lr=1.0)
        hf = transformers.get_constant_schedule_with_warmup(opt, num_warmup_steps=5)
        ours = constant_with_warmup(1.0, warmup_steps=5)
        got, want = [], []
        for step in range(8):
            want.append(hf.get_last_lr()[0])
            got.append(float(ours(step)))
            opt.step()
            hf.step()
        np.testing.assert_allclose(got, want)


def _solver_config(tmp_path, epochs=3, patience=2):
    return Config(
        {
            "checkpoint": {
                "save_path": str(tmp_path / "ckpt" / "model.ckpt"),
                "load_path": str(tmp_path / "ckpt" / "model.ckpt"),
                "save_checkpoint": True,
                "load_checkpoint": False,
            },
            "solver": {
                "loss_fn": "CE",
                "balance_classes": False,
                "lr": 1e-3,
                "weight_decay": 0.0,
                "epochs": epochs,
                "scheduler": {"enabled": True, "scheduler_fn": "ExponentialLR", "gamma": 0.98},
                "early_stopping": {"enabled": True, "patience": patience, "restore_best_weights": True},
            },
            "wandb": {"enabled": False},
            "tpu": {"seed": 0},
        }
    )


def _small_model():
    return M2FNet(
        d_model_audio=16, d_model_text=16, d_model_fam=16,
        n_head_audio=2, n_head_text=2, n_head_fam=2,
        n_layers_audio=1, n_layers_text=1, n_layers_fam=1,
        hidden_size_classifier=16, dropout=0.1,
    )


def _batchers(seed=0, n=24):
    train = SyntheticFusionDataset(n_dialogues=n, d_text=16, d_audio=16, seed=seed)
    val = SyntheticFusionDataset(n_dialogues=8, d_text=16, d_audio=16, seed=seed + 100)
    return (
        FusionBatcher(train, batch_size=8, shuffle=True, seed=1),
        FusionBatcher(val, batch_size=8, shuffle=False),
    )


class TestSolverEndToEnd:
    def test_loss_decreases_and_checkpoint_written(self, tmp_path):
        cfg = _solver_config(tmp_path, epochs=3)
        solver = Solver(_small_model(), cfg)
        train_b, val_b = _batchers()
        state, history = solver.fit(train_b, val_b)
        assert len(history["loss_values"]) <= 3
        assert history["loss_values"][-1] < history["loss_values"][0]
        assert os.path.exists(cfg.checkpoint.save_path)
        ckpt = load_checkpoint(cfg.checkpoint.save_path)
        assert ckpt["epoch"] >= 0 and "params" in ckpt and "opt_state" in ckpt

    def test_resume_from_checkpoint(self, tmp_path):
        cfg = _solver_config(tmp_path, epochs=2)
        train_b, val_b = _batchers()
        solver = Solver(_small_model(), cfg)
        solver.fit(train_b, val_b)

        cfg2 = cfg.override(checkpoint__load_checkpoint=True, solver__epochs=3)
        solver2 = Solver(_small_model(), cfg2)
        state2, history2 = solver2.fit(train_b, val_b)
        # resumed from epoch 2: only 1 new epoch trained
        assert len(history2["loss_values"]) == 1
        assert load_checkpoint(cfg.checkpoint.save_path)["epoch"] == 2

    def test_early_stopping_restores_best(self, tmp_path):
        """Force an immediate plateau: lr=0 means val loss never improves
        after epoch 0, so patience=1 stops at epoch 1 and promotes epoch-0
        weights (reference src/train.py:186-210)."""
        cfg = _solver_config(tmp_path, epochs=10, patience=1)
        cfg = cfg.override(solver__lr=0.0)
        train_b, val_b = _batchers()
        solver = Solver(_small_model(), cfg)
        state, history = solver.fit(train_b, val_b)
        assert len(history["loss_values"]) < 10  # stopped early
        ckpt = load_checkpoint(cfg.checkpoint.save_path)
        assert ckpt["epoch"] == 0  # best epoch promoted
        assert not os.path.exists(os.path.join(os.path.dirname(cfg.checkpoint.save_path), "best_weights.ckpt"))

    def test_evaluate_metrics_reasonable_after_training(self, tmp_path):
        cfg = _solver_config(tmp_path, epochs=4)
        train_b, val_b = _batchers(n=48)
        solver = Solver(_small_model(), cfg)
        state, _ = solver.fit(train_b, val_b)
        result = solver.test(val_b, state.params)
        # synthetic labels are learnable; must beat the 1/7 random baseline
        assert result["accuracy"] > 1.0 / 7.0
        assert 0.0 <= result["weighted_f1"] <= 1.0


class TestCheckpointRoundtrip:
    def test_save_load_preserves_values(self, tmp_path):
        params = {"dense": {"kernel": np.arange(6, dtype=np.float32).reshape(2, 3)}}
        opt_state = {"mu": np.ones(3, dtype=np.float32)}
        path = tmp_path / "c.ckpt"
        save_checkpoint(path, epoch=7, params=params, opt_state=opt_state, extra={"min_loss_val": 0.5})
        out = load_checkpoint(path)
        assert out["epoch"] == 7
        np.testing.assert_array_equal(out["params"]["dense"]["kernel"], params["dense"]["kernel"])
        assert out["extra"]["min_loss_val"] == 0.5


class TestAsyncCheckpointer:
    def test_write_and_read(self, tmp_path):
        from mer_tpu.train import AsyncCheckpointer

        w = AsyncCheckpointer()
        params = {"k": np.arange(4, dtype=np.float32)}
        path = tmp_path / "a.ckpt"
        w.save(path, epoch=3, params=params, extra={"x": 1})
        w.wait()
        out = load_checkpoint(path)
        assert out["epoch"] == 3 and out["extra"]["x"] == 1
        np.testing.assert_array_equal(out["params"]["k"], params["k"])

    def test_snapshot_isolated_from_mutation(self, tmp_path):
        """The write must capture the values at save() time even if the
        caller's arrays change afterwards."""
        from mer_tpu.train import AsyncCheckpointer

        w = AsyncCheckpointer()
        arr = np.zeros(4, dtype=np.float32)
        path = tmp_path / "b.ckpt"
        w.save(path, epoch=0, params={"k": arr})
        arr[:] = 99.0
        w.wait()
        np.testing.assert_array_equal(load_checkpoint(path)["params"]["k"], 0.0)

    def test_error_propagates_on_wait(self, tmp_path):
        from mer_tpu.train import AsyncCheckpointer

        blocker = tmp_path / "not_a_dir"
        blocker.write_text("file, not dir")
        w = AsyncCheckpointer()
        with pytest.raises(Exception):
            # parent path is a file -> the background write must fail
            w.save(str(blocker / "sub" / "c.ckpt"), epoch=0, params={"k": np.zeros(1)})
            w.wait()

    def test_sequential_saves_latest_wins(self, tmp_path):
        from mer_tpu.train import AsyncCheckpointer

        w = AsyncCheckpointer()
        path = tmp_path / "d.ckpt"
        for e in range(5):
            w.save(path, epoch=e, params={"k": np.full(2, e, np.float32)})
        w.wait()
        assert load_checkpoint(path)["epoch"] == 4


class TestScannedEpoch:
    """The scanned-epoch fast path (one XLA program per bucket group) must
    produce the same losses and parameters as stepping batch-by-batch."""

    def _solver(self, tmp_path, model_dim=32):
        cfg = Config(
            {
                "checkpoint": {"save_checkpoint": False, "save_path": str(tmp_path / "c.ckpt")},
                "solver": {
                    "lr": 1e-3, "weight_decay": 0.01, "epochs": 1,
                    "scheduler": {"enabled": False}, "early_stopping": {"enabled": False},
                },
                "wandb": {"enabled": False},
                "tpu": {"seed": 0, "donate_state": False},
            }
        )
        model = M2FNet(
            d_model_audio=model_dim, d_model_text=model_dim, d_model_fam=model_dim,
            n_head_audio=4, n_head_text=4, n_head_fam=4,
            n_layers_audio=1, n_layers_text=1, n_layers_fam=1,
            hidden_size_classifier=model_dim, dropout=0.0,
        )
        return Solver(model, cfg)

    def test_matches_stepwise(self, tmp_path):
        from mer_tpu.data import DeviceFusionBatcher
        from mer_tpu.data.fusion import gather_fusion_batch

        ds = SyntheticFusionDataset(n_dialogues=21, d_text=32, d_audio=32, seed=0)
        batcher = DeviceFusionBatcher(ds, batch_size=8, shuffle=False)
        plan = batcher.epoch_index_plan()
        assert sum(int(idx.shape[0]) for _, idx in plan) == len(batcher)

        solver = self._solver(tmp_path)
        rng = jax.random.PRNGKey(3)

        state0 = solver.init_state(next(iter(batcher)), steps_per_epoch=len(batcher))
        solver._build_steps()
        state_scan, loss_scan = solver._train_epoch_scanned(state0, batcher, rng)

        state_step = solver.init_state(next(iter(batcher)), steps_per_epoch=len(batcher))
        text_all, audio_all, emotion_all = batcher.arrays
        losses = []
        for bucket, idx in plan:
            for row in np.asarray(idx):
                batch = gather_fusion_batch(text_all, audio_all, emotion_all, jnp.asarray(row), bucket)
                state_step, loss = solver._train_step(state_step, batch, rng)
                losses.append(float(loss))

        np.testing.assert_allclose(loss_scan, np.mean(losses), rtol=1e-5)
        for a, b in zip(jax.tree.leaves(state_scan.params), jax.tree.leaves(state_step.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)

    def test_fit_uses_scan_path_with_device_batcher(self, tmp_path):
        from mer_tpu.data import DeviceFusionBatcher

        ds = SyntheticFusionDataset(n_dialogues=16, d_text=32, d_audio=32, seed=1)
        train_b = DeviceFusionBatcher(ds, batch_size=8, shuffle=True, seed=2)
        val_b = DeviceFusionBatcher(
            SyntheticFusionDataset(n_dialogues=8, d_text=32, d_audio=32, seed=2), batch_size=8
        )
        solver = self._solver(tmp_path)
        state, history = solver.fit(train_b, val_b)
        assert np.isfinite(history["loss_values"][0])
