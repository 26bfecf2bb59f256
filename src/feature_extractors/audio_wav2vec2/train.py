"""wav2vec2 FE training — parity with the reference audio_wav2vec2/train.py:
fine-tune wav2vec2 on MELD utterance waveforms with the two-phase
freeze/fine-tune scheme (per-phase lr/weight-decay)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from fe_common import (
    REPO_ROOT, build_pp, load_wav2vec2_model, parse_args, with_pretrained_backbone,
)

from mer_tpu.core import load_config
from mer_tpu.data import Wav2Vec2Batcher, Wav2Vec2FeatureDataset
from mer_tpu.data.wav2vec2_fe import w2v_batch_to_inputs
from mer_tpu.objectives import balanced_class_weights
from mer_tpu.train import FESolver

CONFIG = os.path.join(REPO_ROOT, "src", "feature_extractors", "audio_wav2vec2", "config.yaml")


def main(argv=None):
    args = parse_args(argv, default_config=CONFIG)
    config = load_config(args.config)
    if args.epochs is not None:
        config = config.override(solver__epochs=args.epochs)
    if args.zero1:
        config = config.override(tpu__zero1=True)

    model, pretrained = load_wav2vec2_model(args, config=config)

    data_train = Wav2Vec2FeatureDataset("train", data_root=args.data_root)
    data_val = Wav2Vec2FeatureDataset("val", data_root=args.data_root)
    print(f"Loaded {len(data_train)} utterances for training")
    print(f"Loaded {len(data_val)} utterances for valing")

    batch_size = int(config.get_path("tpu.batch_size_override") or config.train.data_loader.batch_size)
    dl_train = Wav2Vec2Batcher(data_train, batch_size, shuffle=bool(config.train.data_loader.shuffle))
    dl_val = Wav2Vec2Batcher(data_val, batch_size)

    class_weights = (
        balanced_class_weights(data_train.get_labels()) if bool(config.solver.balance_classes) else None
    )

    from mer_tpu.parallel import mesh_from_config

    pp_mesh, pp_logits_fn = build_pp(args, model, "wav2vec2")
    if pp_mesh is not None:
        mesh = pp_mesh
    else:
        try:
            mesh = mesh_from_config(config)
        except ValueError:
            mesh = None

    solver = FESolver(
        model, config, backbone_key="wav2vec2",
        batch_to_inputs=w2v_batch_to_inputs,
        class_weights=class_weights,
        mesh=mesh if (mesh is not None and mesh.size > 1) else None,
        pp_logits_fn=pp_logits_fn,
    )

    example = next(iter(dl_train))
    state = solver.init_state(example, steps_per_epoch=len(dl_train))
    state = with_pretrained_backbone(solver, state, "wav2vec2", pretrained)

    print("Training...")
    state, history = solver.fit(dl_train, dl_val, state=state)
    print("Training complete")
    return state, history


if __name__ == "__main__":
    main()
