"""Shared wiring for the fusion entry points (src/train.py, src/test.py).

Mirrors the reference's run-from-repo-root invocation surface with the same
config file (src/config.yaml); adds a --synthetic escape hatch so the full
train/eval loop can run without the MELD corpus on disk.
"""

from __future__ import annotations

import argparse
import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

import jax.numpy as jnp  # noqa: E402

from mer_tpu.core import load_config  # noqa: E402
from mer_tpu.data import DeviceFusionBatcher, FusionBatcher, FusionDataset, SyntheticFusionDataset  # noqa: E402
from mer_tpu.models import M2FNet  # noqa: E402
from mer_tpu.objectives import balanced_class_weights  # noqa: E402
from mer_tpu.parallel import mesh_from_config  # noqa: E402
from mer_tpu.train import Solver  # noqa: E402

CONFIG_PATH = os.path.join(REPO_ROOT, "src", "config.yaml")


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", default=CONFIG_PATH)
    p.add_argument("--synthetic", action="store_true", help="run on MELD-shaped synthetic data")
    p.add_argument("--data-root", default=None, help="directory containing MELD.Raw (default ./data)")
    p.add_argument("--epochs", type=int, default=None, help="override solver.epochs")
    return p.parse_args(argv)


def build(args, modes: tuple[str, ...]):
    config = load_config(args.config)
    if args.epochs is not None:
        config = config.override(solver__epochs=args.epochs)

    datasets = {}
    for mode in modes:
        if args.synthetic:
            n = {"train": 200, "val": 40, "test": 280}[mode]
            datasets[mode] = SyntheticFusionDataset(n_dialogues=n, seed={"train": 0, "val": 1, "test": 2}[mode])
        else:
            datasets[mode] = FusionDataset(mode, config, data_root=args.data_root)
        print(f"Loaded {len(datasets[mode])} dialogues for {mode}ing")

    buckets = tuple(config.get_path("tpu.length_buckets", (8, 16, 24, 33)))
    try:
        mesh = mesh_from_config(config)
    except ValueError:
        mesh = None
    multi_device = mesh is not None and mesh.size > 1

    # device-resident dataset (zero H2D per epoch) on single-device runs;
    # host batching + sharded prefetch across a mesh
    batcher_cls = FusionBatcher if (multi_device or not bool(config.get_path("tpu.device_data", True))) else DeviceFusionBatcher
    batchers = {
        mode: batcher_cls(
            ds,
            batch_size=int(config[mode].data_loader.batch_size),
            shuffle=bool(config[mode].data_loader.shuffle),
            buckets=buckets,
            seed=int(config.get_path("tpu.seed", 0)),
            # length-sorting reduces padding but changes batch composition;
            # eval keeps the reference's dataset order so the batch-averaged
            # metrics partition identically (SURVEY.md §7.3 #5)
            sort_by_length=bool(config[mode].data_loader.shuffle),
        )
        for mode, ds in datasets.items()
    }

    dtype = jnp.bfloat16 if config.get_path("tpu.compute_dtype", "bfloat16") == "bfloat16" else jnp.float32
    model = M2FNet.from_config(
        config.model, dtype=dtype, scan_layers=bool(config.get_path("tpu.scan_layers", True))
    )

    class_weights = None
    if bool(config.solver.balance_classes) and "train" in datasets:
        class_weights = balanced_class_weights(datasets["train"].get_labels())

    solver = Solver(model, config, class_weights=class_weights, mesh=mesh if multi_device else None)
    return config, datasets, batchers, solver
