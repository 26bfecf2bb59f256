"""Mel FE training — parity with the reference audio_mel/train.py: ResNet18
metric learning with per-step hard triplet mining and the composite
adaptive-triplet + covariance + variance loss."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from fe_common import REPO_ROOT, parse_args

from mer_tpu.core import load_config
from mer_tpu.data import MelFeatureDataset
from mer_tpu.models.resnet import AudioMelFeatureExtractor
from mer_tpu.train import MelSolver

CONFIG = os.path.join(REPO_ROOT, "src", "feature_extractors", "audio_mel", "config_audio_mel.yaml")


def main(argv=None):
    args = parse_args(argv, default_config=CONFIG)
    config = load_config(args.config)
    if args.epochs is not None:
        config = config.override(solver__epochs=args.epochs)

    data_train = MelFeatureDataset("train", config, data_root=args.data_root)
    data_val = MelFeatureDataset("val", config, data_root=args.data_root)
    print(f"Loaded {len(data_train)} utterances for training")
    print(f"Loaded {len(data_val)} utterances for valing")

    from mer_tpu.parallel import mesh_from_config

    try:
        mesh = mesh_from_config(config)
    except ValueError:
        mesh = None

    import jax.numpy as jnp

    # bn_mode="eval" = reference parity; --bf16 runs the convs at double MXU
    # rate (params/embeddings/losses stay f32, models/resnet.py)
    model = AudioMelFeatureExtractor(dtype=jnp.bfloat16 if args.bf16 else jnp.float32)
    solver = MelSolver(
        model, config, data_train, data_val, seed=int(config.get_path("tpu.seed", 0)),
        mesh=mesh if (mesh is not None and mesh.size > 1) else None,
    )

    if bool(config.get_path("DEBUG.train", True)):
        print("Training...")
        state, history = solver.fit()
        print("Training complete")
        return state, history
    return None, None


if __name__ == "__main__":
    main()
