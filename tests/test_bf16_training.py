"""bf16 mixed-precision training policy tests.

Policy (all three solvers): bf16 *compute* in the model forward/backward,
f32 params + optimizer state (Flax ``dtype`` vs ``param_dtype``), f32
LayerNorm statistics (Flax computes them f32 regardless of ``dtype``) and
f32 CE log-softmax (objectives/classification.py upcasts logits).  The
fusion pipeline has trained this way since round 1 (src/pipeline.py builds
M2FNet from tpu.compute_dtype); these tests pin the same policy for the FE
solvers and bound the loss divergence vs pure-f32 training.

The reference trains f32-only (src/train.py:217-231, text/train.py:211-227)
— a torch-on-GPU default, not a modelling choice; on TPU the MXU runs bf16
at 2x the f32 rate, so bf16-compute is the TPU-native default.
"""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mer_tpu.core import Config
from mer_tpu.data import FusionBatcher, SyntheticFusionDataset
from mer_tpu.models import M2FNet
from mer_tpu.models.roberta import RobertaConfig, TextERC
from mer_tpu.models.wav2vec2 import AudioERC, Wav2Vec2Config
from mer_tpu.train import FESolver, Solver

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _fe_config(tmp_path):
    return Config(
        {
            "checkpoint": {"save_path": str(tmp_path / "c.ckpt"), "save_checkpoint": False},
            "solver": {
                "loss_fn": "CE", "balance_classes": False,
                "warmup_epochs": 0, "num_frozen_epochs": 0,
                "frozen_lr": 1e-3, "finetuning_lr": 1e-3, "weight_decay": 0.01,
                "epochs": 1,
                "early_stopping": {"enabled": False, "patience": 1, "restore_best_weights": False},
            },
            "wandb": {"enabled": False},
        }
    )


SMALL_ROBERTA = RobertaConfig(
    vocab_size=500, hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
    intermediate_size=64, max_position_embeddings=80, num_labels=7,
)
SMALL_W2V = Wav2Vec2Config(
    conv_dim=(16, 16, 16), conv_kernel=(10, 3, 2), conv_stride=(5, 2, 2),
    hidden_size=32, num_hidden_layers=2, num_attention_heads=4, intermediate_size=64,
    num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
)


def _run_fe_steps(model, cfg, batch, inputs_fn, backbone_key, n_steps=4):
    solver = FESolver(model, cfg, backbone_key=backbone_key, batch_to_inputs=inputs_fn, seed=0)
    state = solver.init_state(batch, steps_per_epoch=n_steps)
    dev = jax.tree.map(jnp.asarray, batch)
    key = jax.random.PRNGKey(0)
    losses = []
    for _ in range(n_steps):
        state, loss = solver._step_finetune(state, dev, key)
        losses.append(float(loss))
    return state, losses


class TestFESolverBf16:
    def _text_batch(self):
        rng = np.random.default_rng(0)
        return {
            "text": rng.integers(3, 500, size=(8, 24)).astype(np.int32),
            "attention_mask": np.ones((8, 24), np.int32),
            "emotion": rng.integers(0, 7, size=(8,)).astype(np.int32),
        }

    def test_roberta_bf16_tracks_f32(self, tmp_path):
        """bf16-compute fine-tune steps stay within tolerance of f32 steps
        and keep f32 params/optimizer state."""
        cfg = _fe_config(tmp_path)
        batch = self._text_batch()
        inputs = lambda b: (b["text"], b["attention_mask"])

        _, losses_f32 = _run_fe_steps(TextERC(SMALL_ROBERTA), cfg, batch, inputs, "roberta")
        state, losses_bf16 = _run_fe_steps(
            TextERC(SMALL_ROBERTA, dtype=jnp.bfloat16), cfg, batch, inputs, "roberta"
        )

        np.testing.assert_allclose(losses_bf16, losses_f32, rtol=0, atol=5e-2)
        # master weights and optimizer moments stay f32
        for leaf in jax.tree.leaves(state["params"]):
            assert leaf.dtype == jnp.float32
        for leaf in jax.tree.leaves(state["finetune_opt"]):
            assert leaf.dtype in (jnp.float32, jnp.int32)
        # the loss itself is computed from f32 log-softmax
        assert all(np.isfinite(losses_bf16))

    def test_wav2vec2_bf16_tracks_f32(self, tmp_path):
        cfg = _fe_config(tmp_path)
        rng = np.random.default_rng(1)
        batch = {
            "audio": (rng.normal(size=(4, 3200)) * 0.1).astype(np.float32),
            "lengths": np.full((4,), 3200, np.int32),
            "emotion": rng.integers(0, 7, size=(4,)).astype(np.int32),
        }
        inputs = lambda b: (b["audio"], b["lengths"])

        _, losses_f32 = _run_fe_steps(AudioERC(SMALL_W2V), cfg, batch, inputs, "wav2vec2")
        state, losses_bf16 = _run_fe_steps(
            AudioERC(SMALL_W2V, dtype=jnp.bfloat16), cfg, batch, inputs, "wav2vec2"
        )

        np.testing.assert_allclose(losses_bf16, losses_f32, rtol=0, atol=5e-2)
        for leaf in jax.tree.leaves(state["params"]):
            assert leaf.dtype == jnp.float32


class TestSolverBf16Fusion:
    def test_fusion_bf16_tracks_f32(self, tmp_path):
        """The production fusion default (tpu.compute_dtype: bfloat16) vs an
        f32 build of the same model: per-step losses within tolerance over a
        short fit, params f32 in both."""
        cfg = Config(
            {
                "checkpoint": {"save_path": str(tmp_path / "m.ckpt"), "save_checkpoint": False},
                "solver": {
                    "loss_fn": "CE", "balance_classes": False, "lr": 1e-3, "weight_decay": 0.0,
                    "epochs": 1, "scheduler": {"enabled": False},
                    "early_stopping": {"enabled": False, "patience": 1, "restore_best_weights": False},
                },
                "wandb": {"enabled": False},
                "tpu": {"seed": 0},
            }
        )
        train = SyntheticFusionDataset(n_dialogues=24, d_text=16, d_audio=16, seed=0)
        batcher = FusionBatcher(train, batch_size=8, shuffle=False)

        def run(dtype):
            model = M2FNet(
                d_model_audio=16, d_model_text=16, d_model_fam=16,
                n_head_audio=2, n_head_text=2, n_head_fam=2,
                n_layers_audio=1, n_layers_text=1, n_layers_fam=1,
                hidden_size_classifier=16, dropout=0.0, dtype=dtype,
            )
            solver = Solver(model, cfg)
            state = solver.init_state(next(iter(batcher)), steps_per_epoch=len(batcher))
            solver._build_steps()
            rng = jax.random.PRNGKey(0)
            losses = []
            for b in batcher:
                dev = jax.tree.map(jnp.asarray, b)
                state, loss = solver._train_step(state, dev, rng)
                losses.append(float(loss))
            return state, losses

        state_f32, losses_f32 = run(jnp.float32)
        state_bf16, losses_bf16 = run(jnp.bfloat16)
        np.testing.assert_allclose(losses_bf16, losses_f32, rtol=0, atol=5e-2)
        for leaf in jax.tree.leaves(state_bf16.params):
            assert leaf.dtype == jnp.float32


class TestResolveComputeDtype:
    def _fe_common(self):
        sys.path.insert(0, os.path.join(REPO_ROOT, "src", "feature_extractors"))
        import fe_common

        return fe_common

    def test_flag_and_config_resolution(self):
        fe_common = self._fe_common()
        ns = lambda **kw: type("A", (), {"bf16": False, "f32": False, **kw})()
        cfg_bf16 = Config({"tpu": {"compute_dtype": "bfloat16"}})
        cfg_f32 = Config({"tpu": {"compute_dtype": "float32"}})

        assert fe_common.resolve_compute_dtype(ns(), cfg_bf16) == jnp.bfloat16
        assert fe_common.resolve_compute_dtype(ns(), cfg_f32) == jnp.float32
        assert fe_common.resolve_compute_dtype(ns(), None) == jnp.float32
        assert fe_common.resolve_compute_dtype(ns(bf16=True), cfg_f32) == jnp.bfloat16
        assert fe_common.resolve_compute_dtype(ns(f32=True), cfg_bf16) == jnp.float32

    def test_shipped_fe_configs_default_bf16(self):
        """The shipped FE configs opt into bf16 compute (tpu.compute_dtype);
        the trainers/exporters must pick that up."""
        from mer_tpu.core import load_config

        fe_common = self._fe_common()
        ns = type("A", (), {"bf16": False, "f32": False})()
        for rel in ("text/config.yaml", "audio_wav2vec2/config.yaml"):
            cfg = load_config(os.path.join(REPO_ROOT, "src", "feature_extractors", rel))
            assert fe_common.resolve_compute_dtype(ns, cfg) == jnp.bfloat16
