"""Gradient accumulation in FESolver (solver.grad_accum_steps):
k micro-batches must apply ONE optimizer update equal to a single step on
the concatenated batch (optax.MultiSteps averages micro-gradients; mean-CE
over equal-size all-valid micro-batches composes exactly)."""

import numpy as np

import jax
import jax.numpy as jnp

from mer_tpu.core import Config
from mer_tpu.models.roberta import RobertaConfig, TextERC
from mer_tpu.train import FESolver

CFG = RobertaConfig(
    vocab_size=300, hidden_size=32, num_hidden_layers=1, num_attention_heads=4,
    intermediate_size=64, max_position_embeddings=40, num_labels=7,
    hidden_dropout=0.0, attention_dropout=0.0,  # determinism for the equality check
)


def _config(grad_accum=1):
    return Config(
        {
            "checkpoint": {"save_checkpoint": False, "save_path": "/tmp/ga.ckpt"},
            "solver": {
                "loss_fn": "CE", "balance_classes": False,
                "warmup_epochs": 0, "num_frozen_epochs": 0,
                "frozen_lr": 1e-3, "finetuning_lr": 1e-3, "weight_decay": 0.01,
                "epochs": 1, "grad_accum_steps": grad_accum,
                "early_stopping": {"enabled": False, "patience": 1, "restore_best_weights": False},
            },
            "wandb": {"enabled": False},
        }
    )


def _batch(rng, n):
    return {
        "text": rng.integers(2, 300, size=(n, 10)).astype(np.int32),
        "attention_mask": np.ones((n, 10), np.int32),
        "emotion": rng.integers(0, 7, size=(n,)).astype(np.int32),  # all valid
    }


def _solver(grad_accum):
    return FESolver(
        TextERC(CFG), _config(grad_accum), backbone_key="roberta",
        batch_to_inputs=lambda b: (b["text"], b["attention_mask"]),
        seed=0,
    )


class TestGradAccum:
    def test_two_micro_steps_equal_one_big_step(self):
        rng = np.random.default_rng(0)
        a, b = _batch(rng, 8), _batch(rng, 8)
        big = {k: np.concatenate([a[k], b[k]]) for k in a}

        accum = _solver(grad_accum=2)
        s = accum.init_state(a, steps_per_epoch=2)
        p0 = jax.tree.map(np.asarray, s["params"])
        s, _ = accum._step_finetune(s, jax.tree.map(jnp.asarray, a), jax.random.PRNGKey(0))
        # first micro step: gradients only accumulated, params unchanged
        jax.tree.map(
            lambda x, y: np.testing.assert_array_equal(np.asarray(x), y), s["params"], p0
        )
        s, _ = accum._step_finetune(s, jax.tree.map(jnp.asarray, b), jax.random.PRNGKey(0))

        plain = _solver(grad_accum=1)
        s1 = plain.init_state(a, steps_per_epoch=1)
        s1, _ = plain._step_finetune(s1, jax.tree.map(jnp.asarray, big), jax.random.PRNGKey(0))

        jax.tree.map(
            lambda x, y: np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=1e-5, atol=1e-7),
            s["params"], s1["params"],
        )

    def test_epoch_runs_with_accumulation(self):
        """train_epoch over a batcher-like iterable with accumulation on."""
        rng = np.random.default_rng(1)
        batches = [_batch(rng, 4) for _ in range(4)]
        solver = _solver(grad_accum=2)
        state = solver.init_state(batches[0], steps_per_epoch=len(batches))
        state, loss = solver.train_epoch(state, batches, epoch=0, rng=jax.random.PRNGKey(2))
        assert np.isfinite(loss)


class TestFusionGradAccum:
    """solver.grad_accum_steps flows through optimizer_from_config, so the
    fusion (and mel) solvers get accumulation too."""

    def _fusion_solver(self, grad_accum):
        from mer_tpu.models import M2FNet
        from mer_tpu.train import Solver

        cfg = Config(
            {
                "checkpoint": {"save_checkpoint": False, "save_path": "/tmp/fga.ckpt"},
                "solver": {
                    "lr": 1e-3, "weight_decay": 0.01, "epochs": 1,
                    "grad_accum_steps": grad_accum,
                    "scheduler": {"enabled": False},
                    "early_stopping": {"enabled": False},
                },
                "wandb": {"enabled": False},
                "tpu": {"seed": 0, "donate_state": False},
            }
        )
        model = M2FNet(
            d_model_audio=16, d_model_text=16, d_model_fam=16,
            n_head_audio=4, n_head_text=4, n_head_fam=4,
            n_layers_audio=1, n_layers_text=1, n_layers_fam=1,
            hidden_size_classifier=16, dropout=0.0,
        )
        return Solver(model, cfg)

    def _dialogue_batch(self, rng, b, u=5):
        return {
            "text": rng.normal(size=(b, u, 16)).astype(np.float32),
            "audio": rng.normal(size=(b, u, 16)).astype(np.float32),
            "emotion": rng.integers(0, 7, size=(b, u)).astype(np.int32),  # all valid
            "padding_mask": np.zeros((b, u), bool),
        }

    def test_two_micro_steps_equal_one_big_step(self):
        rng = np.random.default_rng(3)
        a, b = self._dialogue_batch(rng, 4), self._dialogue_batch(rng, 4)
        big = {k: np.concatenate([a[k], b[k]]) for k in a}

        accum = self._fusion_solver(2)
        s = accum.init_state(a, steps_per_epoch=2)
        accum._build_steps()
        key = jax.random.PRNGKey(0)
        p0 = jax.tree.map(np.asarray, s.params)
        s, _ = accum._train_step(s, jax.tree.map(jnp.asarray, a), key)
        # first micro step: gradients only accumulated, params unchanged
        jax.tree.map(
            lambda x, y: np.testing.assert_array_equal(np.asarray(x), y), s.params, p0
        )
        s, _ = accum._train_step(s, jax.tree.map(jnp.asarray, b), key)

        plain = self._fusion_solver(1)
        s1 = plain.init_state(a, steps_per_epoch=1)
        plain._build_steps()
        s1, _ = plain._train_step(s1, jax.tree.map(jnp.asarray, big), key)

        # Adam's m/(sqrt(v)+eps) turns near-zero-gradient entries into
        # sign-like updates, amplifying f32 grad-composition noise
        # elementwise — so compare the applied UPDATE VECTORS globally
        # (cosine ~1 and matched norm), not per element.
        upd_a = np.concatenate([
            (np.asarray(x) - y).ravel() for x, y in zip(jax.tree.leaves(s.params), jax.tree.leaves(p0))
        ])
        upd_b = np.concatenate([
            (np.asarray(x) - y).ravel() for x, y in zip(jax.tree.leaves(s1.params), jax.tree.leaves(p0))
        ])
        assert np.linalg.norm(upd_a) > 0
        cos = float(upd_a @ upd_b / (np.linalg.norm(upd_a) * np.linalg.norm(upd_b)))
        assert cos > 0.999, cos
        np.testing.assert_allclose(np.linalg.norm(upd_a), np.linalg.norm(upd_b), rtol=1e-2)
