"""Distributed (per-process sharded) checkpointing
(train/checkpoint.py::save_checkpoint_sharded / load_checkpoint_sharded):
each process writes only its addressable shards; the merged load equals the
original trees exactly, including bf16 leaves and optax state tuples."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from mer_tpu.parallel import make_mesh, make_pp_mesh
from mer_tpu.train import (
    load_checkpoint_sharded, restore_into, save_checkpoint_sharded,
)


def _tree(mesh):
    """Mixed placements: layer-sharded stack, dp-sharded rows, replicated
    scalars/bf16, host numpy."""
    rng = np.random.default_rng(0)
    stack = jnp.asarray(rng.normal(size=(8, 4, 4)).astype(np.float32))
    rows = jnp.asarray(rng.normal(size=(8, 6)).astype(np.float32))
    return {
        "layers": jax.device_put(stack, NamedSharding(mesh, P("pp"))),
        "rows": jax.device_put(rows, NamedSharding(mesh, P("dp"))),
        "replicated": jax.device_put(
            jnp.asarray(rng.normal(size=(5,)).astype(np.float32)), NamedSharding(mesh, P())),
        "bf16": jax.device_put(
            jnp.asarray(rng.normal(size=(4, 4)), dtype=jnp.bfloat16), NamedSharding(mesh, P())),
        "host": rng.normal(size=(3,)).astype(np.float32),
    }


class TestShardedCheckpoint:
    def test_round_trip_on_pp_dp_mesh(self, tmp_path):
        mesh = make_pp_mesh(pp=2, dp=4)
        tree = _tree(mesh)
        save_checkpoint_sharded(tmp_path, epoch=3, params=tree,
                                extra={"min_loss_val": 1.5})
        ckpt = load_checkpoint_sharded(tmp_path)
        assert ckpt["epoch"] == 3
        assert float(ckpt["extra"]["min_loss_val"]) == 1.5
        for k in tree:
            np.testing.assert_array_equal(
                np.asarray(ckpt["params"][k]), np.asarray(jax.device_get(tree[k])), err_msg=k)
        assert str(np.asarray(ckpt["params"]["bf16"]).dtype) == "bfloat16"

    def test_optax_state_round_trip(self, tmp_path):
        import optax

        mesh = make_mesh(dp=8)
        params = {"w": jax.device_put(jnp.ones((8, 4)), NamedSharding(mesh, P("dp")))}
        opt = optax.adam(1e-3)
        opt_state = opt.init(params)
        save_checkpoint_sharded(tmp_path, epoch=0, params=params, opt_state=opt_state)
        ckpt = load_checkpoint_sharded(tmp_path)
        restored = restore_into(opt_state, ckpt["opt_state"])
        for a, b in zip(jax.tree.leaves(opt_state), jax.tree.leaves(restored)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_missing_shard_file_rejected(self, tmp_path):
        import os

        mesh = make_pp_mesh(pp=2, dp=4)
        tree = _tree(mesh)
        # simulate a 2-process write where only file 1 survived
        p = save_checkpoint_sharded(tmp_path, epoch=0, params=tree,
                                    process_index=1, process_count=2)
        assert os.path.exists(p)
        with pytest.raises(ValueError, match="shard files"):
            load_checkpoint_sharded(tmp_path)

    def test_elsewhere_only_leaf_rejected(self, tmp_path):
        """A non-zero process alone cannot reconstruct replicated leaves."""
        mesh = make_pp_mesh(pp=2, dp=4)
        tree = _tree(mesh)
        save_checkpoint_sharded(tmp_path, epoch=0, params=tree,
                                process_index=0, process_count=1)
        ckpt = load_checkpoint_sharded(tmp_path)  # pc=1: fine
        np.testing.assert_array_equal(
            np.asarray(ckpt["params"]["host"]), tree["host"])

    def test_restore_onto_mesh(self, tmp_path):
        """Merged numpy re-places onto the mesh with the original shardings
        and matches on-device."""
        mesh = make_pp_mesh(pp=4, dp=2)
        stack = jnp.asarray(np.random.default_rng(1).normal(size=(8, 4)).astype(np.float32))
        placed = jax.device_put(stack, NamedSharding(mesh, P("pp")))
        save_checkpoint_sharded(tmp_path, epoch=0, params={"s": placed})
        ckpt = load_checkpoint_sharded(tmp_path)
        replaced = jax.device_put(ckpt["params"]["s"], NamedSharding(mesh, P("pp")))
        np.testing.assert_array_equal(np.asarray(replaced), np.asarray(placed))
        assert replaced.sharding == placed.sharding


class TestSolverShardedCheckpoint:
    """checkpoint.sharded: true routes the production train loops through
    the per-process sharded writer; save -> resume round-trips."""

    def test_fusion_solver_sharded_save_and_resume(self, tmp_path):
        import os

        from mer_tpu.core.config import Config
        from mer_tpu.data import FusionBatcher
        from mer_tpu.data.synthetic import SyntheticFusionDataset
        from mer_tpu.models import M2FNet
        from mer_tpu.train import Solver, load_checkpoint_auto

        def cfg_for(epochs, load):
            return Config({
                "checkpoint": {
                    "save_path": str(tmp_path / "ckpt" / "model_sharded"),
                    "load_path": str(tmp_path / "ckpt" / "model_sharded"),
                    "save_checkpoint": True, "load_checkpoint": load,
                    "sharded": True,
                },
                "solver": {
                    "loss_fn": "CE", "balance_classes": False, "lr": 1e-3,
                    "weight_decay": 0.0, "epochs": epochs,
                    "scheduler": {"enabled": False},
                    "early_stopping": {"enabled": False, "patience": 1,
                                       "restore_best_weights": False},
                },
                "wandb": {"enabled": False},
                "tpu": {"seed": 0},
            })

        model = M2FNet(
            d_model_audio=16, d_model_text=16, d_model_fam=16,
            n_head_audio=2, n_head_text=2, n_head_fam=2,
            n_layers_audio=1, n_layers_text=1, n_layers_fam=1,
            hidden_size_classifier=16, dropout=0.1,
        )
        train = SyntheticFusionDataset(n_dialogues=16, d_text=16, d_audio=16, seed=0)
        val = SyntheticFusionDataset(n_dialogues=8, d_text=16, d_audio=16, seed=100)
        tb = FusionBatcher(train, batch_size=8, shuffle=True, seed=1)
        vb = FusionBatcher(val, batch_size=8, shuffle=False)

        solver = Solver(model, cfg_for(2, load=False))
        solver.fit(tb, vb)
        ckpt_dir = str(tmp_path / "ckpt" / "model_sharded")
        assert os.path.isdir(ckpt_dir)
        ckpt = load_checkpoint_auto(ckpt_dir)
        assert ckpt["epoch"] == 1 and "params" in ckpt and ckpt["opt_state"]

        solver2 = Solver(model, cfg_for(3, load=True))
        _, history2 = solver2.fit(tb, vb)
        assert len(history2["loss_values"]) == 1  # resumed at epoch 2
        assert load_checkpoint_auto(ckpt_dir)["epoch"] == 2
