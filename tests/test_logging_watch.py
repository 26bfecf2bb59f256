"""C31 observability parity: the wandb.watch analog (per-parameter
gradient/parameter norms from a watched train step, reference
src/train.py:132-138) and Image/Html artifact uploads
(audio_mel/train.py:333-339), exercised against a stub wandb module since
wandb is not installed on this image."""

import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mer_tpu.core import Config
from mer_tpu.data import FusionBatcher, SyntheticFusionDataset
from mer_tpu.models import M2FNet
from mer_tpu.train import Solver
from mer_tpu.utils.logging import RunLogger, tree_norms, watch_norms


@pytest.fixture
def wandb_stub(monkeypatch):
    """A minimal wandb lookalike that records every log() payload."""
    stub = types.ModuleType("wandb")
    stub.logged = []
    stub.init = lambda **kw: None
    stub.log = lambda payload: stub.logged.append(payload)
    stub.finish = lambda: None
    stub.watch = lambda *a, **kw: None
    stub.Image = lambda path: ("image", path)
    stub.Html = lambda path: ("html", path)
    monkeypatch.setitem(sys.modules, "wandb", stub)
    return stub


def _watch_config(tmp_path, watch_log="all", freq=2):
    return Config(
        {
            "checkpoint": {"save_path": str(tmp_path / "m.ckpt"), "save_checkpoint": False},
            "solver": {
                "lr": 1e-3, "weight_decay": 0.0, "epochs": 1,
                "early_stopping": {"enabled": False},
            },
            "wandb": {
                "enabled": True,
                "project_name": "test",
                "watch_model": True,
                "watch_log": watch_log,
                "watch_log_freq": freq,
            },
            "tpu": {"seed": 0},
        }
    )


class TestTreeNorms:
    def test_per_leaf_l2_norms(self):
        tree = {"enc": {"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.ones((3,))}}
        norms = tree_norms(tree, "gradients")
        assert set(norms) == {"gradients/enc/w", "gradients/enc/b"}
        np.testing.assert_allclose(
            float(norms["gradients/enc/w"]), np.linalg.norm(np.arange(6.0)), rtol=1e-6
        )
        np.testing.assert_allclose(float(norms["gradients/enc/b"]), np.sqrt(3.0), rtol=1e-6)

    def test_traceable_under_jit(self):
        tree = {"w": jnp.ones((4,))}

        @jax.jit
        def f(t):
            return watch_norms(t, t, "all")

        out = f(tree)
        assert set(out) == {"gradients/w", "parameters/w"}
        np.testing.assert_allclose(float(out["gradients/w"]), 2.0, rtol=1e-6)

    def test_watch_log_modes(self):
        tree = {"w": jnp.ones((2,))}
        assert set(watch_norms(tree, tree, "gradients")) == {"gradients/w"}
        assert set(watch_norms(tree, tree, "parameters")) == {"parameters/w"}


class TestSolverWatch:
    def test_gradient_norms_logged_every_freq_steps(self, tmp_path, wandb_stub):
        cfg = _watch_config(tmp_path, freq=2)
        model = M2FNet(
            d_model_audio=16, d_model_text=16, d_model_fam=16,
            n_head_audio=2, n_head_text=2, n_head_fam=2,
            n_layers_audio=1, n_layers_text=1, n_layers_fam=1,
            hidden_size_classifier=16, dropout=0.1,
        )
        train = SyntheticFusionDataset(n_dialogues=24, d_text=16, d_audio=16, seed=0)
        batcher = FusionBatcher(train, batch_size=8, shuffle=False)
        solver = Solver(model, cfg)
        assert solver.logger.wants_watch_logs
        state = solver.init_state(next(iter(batcher)), steps_per_epoch=len(batcher))
        solver._build_steps()
        state, _ = solver.train_epoch(state, batcher, jax.random.PRNGKey(0))

        watch_payloads = [
            p for p in wandb_stub.logged if any(k.startswith("gradients/") for k in p)
        ]
        # 3 batches, freq=2 -> watched at steps 0 and 2
        assert len(watch_payloads) == 2
        sample = watch_payloads[0]
        grad_keys = [k for k in sample if k.startswith("gradients/")]
        param_keys = [k for k in sample if k.startswith("parameters/")]
        assert grad_keys and param_keys
        assert len(grad_keys) == len(param_keys)  # log="all": one norm per leaf, both trees
        vals = np.array([sample[k] for k in sample])
        assert np.all(np.isfinite(vals)) and np.any(vals > 0)

    def test_watch_off_means_no_watched_compile(self, tmp_path):
        cfg = _watch_config(tmp_path)
        cfg["wandb"]["watch_model"] = False
        logger = RunLogger(cfg)
        assert not logger.wants_watch_logs  # wandb stub absent AND watch off

    def test_no_wandb_degrades_silently(self, tmp_path):
        # wandb enabled in config but module not importable -> console fallback,
        # watch logging disabled, log_image/log_html no-ops
        cfg = _watch_config(tmp_path)
        logger = RunLogger(cfg)
        assert not logger.wants_watch_logs
        logger.log_watch({"gradients/w": 1.0})
        logger.log_image("k", "/nonexistent.png")
        logger.log_html("k", "/nonexistent.html")


class TestArtifactUploads:
    def test_visualize_embeddings_writes_and_uploads(self, tmp_path, wandb_stub):
        from mer_tpu.core.config import EMOTION_LABELS
        from mer_tpu.utils.viz import visualize_embeddings

        rng = np.random.default_rng(0)
        emb = np.concatenate(
            [rng.normal(loc=3 * k, size=(12, 8)) for k in range(3)]
        ).astype(np.float32)
        labels = np.repeat(np.arange(3), 12)
        logger = RunLogger(Config({"wandb": {"enabled": True, "watch_model": False}}))
        out = visualize_embeddings(
            emb, labels, str(tmp_path / "viz"), epoch=5, kind="2D",
            logger=logger, label_names=EMOTION_LABELS,
        )
        assert out["silhouette"] > 0.3  # well-separated clusters
        assert out["png"].endswith("png/visualization_5.png")
        assert out["html"].endswith("html/visualization_5.html")
        import os

        assert os.path.exists(out["png"]) and os.path.exists(out["html"])
        keys = [k for p in wandb_stub.logged for k in p]
        assert "Visualization_png" in keys and "Visualization_html" in keys

    def test_standalone_html_is_self_contained(self, tmp_path):
        from mer_tpu.utils.viz import write_scatter_html

        z = np.random.default_rng(1).normal(size=(20, 3)).astype(np.float32)
        labels = np.arange(20) % 4
        path = write_scatter_html(z, labels, str(tmp_path / "v.html"), "t", {"neutral": 0})
        text = open(path).read()
        assert "<canvas" in text and '"dims": 3' in text
        assert "neutral" in text
        assert "cdn" not in text and "http" not in text  # no external fetches

    def test_projection_kinds(self):
        from mer_tpu.utils.viz import project_embeddings

        emb = np.random.default_rng(2).normal(size=(40, 16)).astype(np.float32)
        assert project_embeddings(emb, "2D").shape == (40, 2)
        assert project_embeddings(emb, "3D").shape == (40, 3)
        with pytest.raises(ValueError):
            project_embeddings(emb, "4D")
