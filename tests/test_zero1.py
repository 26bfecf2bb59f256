"""ZeRO-1 optimizer-state sharding (tpu.zero1) on the virtual 8-device mesh.

Contract: the same training trajectory as plain dp up to float32
reduction-order noise (sharding the moments changes WHERE the update math
runs and how XLA partitions/fuses the surrounding reductions, not what they
compute — measured divergence over 3 steps is ~5e-8 absolute), with the
Adam moments actually dp-sharded on device. The reference is single-device
(SURVEY §2.2) — this is pure TPU-scaling surface."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from mer_tpu.core import Config
from mer_tpu.data import FusionBatcher, SyntheticFusionDataset
from mer_tpu.models import M2FNet
from mer_tpu.parallel import make_mesh, batch_sharding
from mer_tpu.parallel.mesh import zero1_param_specs, zero1_opt_shardings
from mer_tpu.train import Solver


def _model(d=32, heads=4):
    return M2FNet(
        d_model_audio=d, d_model_text=d, d_model_fam=d,
        n_head_audio=heads, n_head_text=heads, n_head_fam=heads,
        n_layers_audio=1, n_layers_text=1, n_layers_fam=1,
        hidden_size_classifier=d, dropout=0.1,
    )


def _config(zero1: bool):
    return Config(
        {
            "checkpoint": {"save_checkpoint": False},
            "solver": {
                "lr": 1e-3, "weight_decay": 0.01, "epochs": 1,
                "scheduler": {"enabled": False}, "early_stopping": {"enabled": False},
            },
            "wandb": {"enabled": False},
            "tpu": {"seed": 0, "donate_state": False, "zero1": zero1},
        }
    )


class TestZero1Specs:
    def test_spec_extension(self):
        mesh = make_mesh(dp=8, tp=1)
        params = {
            "kernel": jnp.zeros((64, 32)),   # 64 % 8 == 0 -> dp on axis 0
            "bias": jnp.zeros((32,)),        # 32 % 8 == 0 -> dp on axis 0
            "odd": jnp.zeros((7, 3)),        # nothing divisible -> replicated
            "scalar": jnp.zeros(()),
        }
        specs = zero1_param_specs(params, mesh)
        assert specs["kernel"] == P("dp", None)
        assert specs["bias"] == P("dp")
        assert specs["odd"] == P()
        assert specs["scalar"] == P()

    def test_respects_tp_axes(self):
        """A TP-sharded kernel keeps its tp axis; dp goes on the other one."""
        mesh = make_mesh(dp=4, tp=2)
        params = {"enc": {"layers_0": {"self_attn": {"q_proj": {
            "kernel": jnp.zeros((32, 32))}}}}}
        specs = zero1_param_specs(params, mesh)
        assert specs["enc"]["layers_0"]["self_attn"]["q_proj"]["kernel"] == P("dp", "tp")


class TestZero1Training:
    @pytest.mark.parametrize("dp,tp", [(8, 1), (4, 2)])
    def test_matches_plain_dp_and_moments_are_sharded(self, dp, tp):
        model = _model()
        ds = SyntheticFusionDataset(n_dialogues=8, d_text=32, d_audio=32, seed=1)
        batcher = FusionBatcher(ds, batch_size=8, shuffle=False)
        batch = next(iter(batcher))
        mesh = make_mesh(dp=dp, tp=tp)

        states, losses = {}, {}
        for name, z in [("plain", False), ("zero1", True)]:
            solver = Solver(model, _config(z), mesh=mesh)
            state = solver.init_state(batch, steps_per_epoch=1)
            solver._build_steps()
            b = jax.tree.map(lambda x: jax.device_put(x, batch_sharding(mesh)), batch)
            ls = []
            for _ in range(3):
                state, loss = solver._train_step(state, b, jax.random.PRNGKey(0))
                ls.append(float(loss))
            states[name], losses[name] = state, ls
            assert np.all(np.isfinite(ls))

        # same trajectory. Caveat: zero-grad elements take an Adam update of
        # ~lr*sign(noise), so a handful of isolated elements can differ by
        # O(lr) purely from f32 reduction reordering between the two
        # partitionings. A real sharding bug (a shard applied to the wrong
        # slice) corrupts 1/dp of EVERY leaf — so bound the per-leaf count
        # of violations, not just the max.
        np.testing.assert_allclose(losses["plain"], losses["zero1"], rtol=1e-4)

        def trajectory_equal(a, b):
            a, b = np.asarray(a), np.asarray(b)
            diff = np.abs(a - b)
            bad = diff > (1e-5 + 1e-3 * np.abs(b))
            assert bad.sum() <= max(1, 0.005 * a.size), (
                f"{bad.sum()}/{a.size} elements diverged (max {diff.max():.2e})"
            )
            assert diff.max() < 5e-4, diff.max()

        jax.tree.map(trajectory_equal, states["plain"].params, states["zero1"].params)
        jax.tree.map(trajectory_equal, states["plain"].opt_state, states["zero1"].opt_state)

        # ... and the zero1 moments really live dp-sharded on device
        shardings = zero1_opt_shardings(
            states["zero1"].opt_state, states["zero1"].params, mesh
        )
        n_dp = [0]

        def check(leaf, want):
            assert leaf.sharding.is_equivalent_to(want, np.ndim(leaf)), (
                f"{leaf.sharding.spec} != {want.spec}"
            )
            if "dp" in jax.tree.leaves(tuple(want.spec)):
                n_dp[0] += 1

        jax.tree.map(check, states["zero1"].opt_state, shardings)
        assert n_dp[0] >= 20  # Adam mu+nu over the real param tree

        # the plain run's moments are NOT dp-sharded (the contrast that
        # proves zero1 changed placement)
        plain_specs = {
            tuple(leaf.sharding.spec)
            for leaf in jax.tree.leaves(states["plain"].opt_state)
            if hasattr(leaf, "sharding")
        }
        assert all("dp" not in s for s in plain_specs)

    def test_fe_solver_zero1_matches_plain_dp(self, meld_like_root, tmp_path):
        """Same contract through FESolver's two-phase engine (the moments
        there sit behind optax.multi_transform masks + MultiSteps — the
        suffix matching must reach through the wrappers)."""
        from mer_tpu.data import TextBatcher, TextFeatureDataset, ToyWhitespaceTokenizer
        from mer_tpu.models.roberta import RobertaConfig, TextERC
        from mer_tpu.train import FESolver

        root, _ = meld_like_root
        small = RobertaConfig(
            vocab_size=1000, hidden_size=32, num_hidden_layers=1,
            num_attention_heads=4, intermediate_size=64,
            max_position_embeddings=520, num_labels=7,
        )
        tok = ToyWhitespaceTokenizer(vocab_size=small.vocab_size)
        train_ds = TextFeatureDataset("train", tok, data_root=root)
        mesh = make_mesh(dp=8, tp=1)

        def cfg(z):
            return Config(
                {
                    "checkpoint": {"save_checkpoint": False, "save_path": str(tmp_path / "c.ckpt")},
                    "solver": {
                        "loss_fn": "CE", "balance_classes": False,
                        "warmup_epochs": 1, "num_frozen_epochs": 0,
                        "frozen_lr": 1e-3, "finetuning_lr": 1e-4, "weight_decay": 0.01,
                        "epochs": 1,
                        "early_stopping": {"enabled": False, "patience": 1,
                                           "restore_best_weights": False},
                    },
                    "wandb": {"enabled": False},
                    "tpu": {"zero1": z},
                }
            )

        states, losses = {}, {}
        for name, z in [("plain", False), ("zero1", True)]:
            solver = FESolver(
                TextERC(small), cfg(z), backbone_key="roberta",
                batch_to_inputs=lambda b: (b["text"], b["attention_mask"]),
                seed=0, mesh=mesh,
            )
            batcher = TextBatcher(train_ds, batch_size=8, shuffle=False)
            state = solver.init_state(next(iter(batcher)), steps_per_epoch=len(batcher))
            state, loss = solver.train_epoch(state, batcher, epoch=0,
                                             rng=jax.random.PRNGKey(1))
            states[name], losses[name] = state, loss

        np.testing.assert_allclose(losses["plain"], losses["zero1"], rtol=1e-4)
        # moments behind multi_transform/MultiSteps got the dp shard
        dp_leaves = [
            leaf for leaf in jax.tree.leaves(states["zero1"]["finetune_opt"])
            if hasattr(leaf, "sharding")
            and "dp" in jax.tree.leaves(tuple(leaf.sharding.spec))
        ]
        assert len(dp_leaves) >= 10

    def test_mel_solver_zero1_matches_plain_dp(self, meld_like_root_with_wavs, tmp_path):
        """Same contract through MelSolver (conv/BatchNorm param tree — no
        TP rules match, so every dp-divisible axis comes from the plain
        largest-axis rule)."""
        from mer_tpu.data import MelFeatureDataset
        from mer_tpu.models.resnet import AudioMelFeatureExtractor
        from mer_tpu.train import MelSolver

        root, _ = meld_like_root_with_wavs

        def cfg(z):
            return Config(
                {
                    "DEBUG": {"enabled": True, "num_samples": 16, "train": True},
                    "AUDIO": {"ffmpeg_sr": 16000, "wav2vec_sr": 16000,
                              "max_duration": 1.0, "augmentation_factor": 1},
                    "checkpoint": {"save_path": str(tmp_path / "mel.ckpt"),
                                   "save_checkpoint": False},
                    "solver": {
                        "len_triplet_picking": 16, "mining_type": "hard",
                        "adaptive_triplet_margin_loss": True,
                        "covariance_loss": True, "variance_loss": True,
                        "lr": 1e-4, "weight_decay": 0.0, "epochs": 1,
                        "scheduler": {"enabled": False},
                        "early_stopping": {"enabled": False, "patience": 1,
                                           "restore_best_weights": False},
                    },
                    "train": {"data_loader": {"shuffle": False, "batch_size": 8}},
                    "val": {"data_loader": {"shuffle": False, "batch_size": 8}},
                    "wandb": {"enabled": False},
                    "tpu": {"zero1": z},
                }
            )

        mesh = make_mesh(dp=8, tp=1)
        losses, states = {}, {}
        for name, z in [("plain", False), ("zero1", True)]:
            c = cfg(z)
            solver = MelSolver(
                AudioMelFeatureExtractor(embedding_size=16), c,
                MelFeatureDataset("train", c, data_root=root),
                MelFeatureDataset("val", c, data_root=root),
                seed=0, mesh=mesh,
            )
            state = solver.init_state()
            state, loss = solver.train_epoch(state, epoch=0, rng=jax.random.PRNGKey(2))
            losses[name], states[name] = loss, state

        np.testing.assert_allclose(losses["plain"], losses["zero1"], rtol=1e-4)
        n_dp = sum(
            1 for leaf in jax.tree.leaves(states["zero1"].opt_state)
            if hasattr(leaf, "sharding")
            and "dp" in jax.tree.leaves(tuple(leaf.sharding.spec))
        )
        assert n_dp >= 20

    def test_memory_footprint_shrinks(self):
        """Per-device moment bytes under zero1 ~= replicated bytes / dp."""
        mesh = make_mesh(dp=8, tp=1)
        model = _model()
        ds = SyntheticFusionDataset(n_dialogues=8, d_text=32, d_audio=32, seed=1)
        batch = next(iter(FusionBatcher(ds, batch_size=8, shuffle=False)))

        def moment_device_bytes(z):
            solver = Solver(model, _config(z), mesh=mesh)
            state = solver.init_state(batch, steps_per_epoch=1)
            total = 0
            for leaf in jax.tree.leaves(state.opt_state):
                if hasattr(leaf, "addressable_shards") and np.ndim(leaf) > 0:
                    shard = leaf.addressable_shards[0]
                    total += shard.data.nbytes
            return total

        plain, zero1 = moment_device_bytes(False), moment_device_bytes(True)
        # most leaves divide by 8; a few odd shapes stay replicated
        assert zero1 < 0.35 * plain, (plain, zero1)
