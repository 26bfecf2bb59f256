"""Text FE training — parity with ``python src/feature_extractors/text/train.py``
(reference text/train.py:18-101): fine-tune RoBERTa on MELD context-window
utterances with the two-phase freeze/fine-tune scheme."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from fe_common import (
    REPO_ROOT, build_pp, load_text_model_and_tokenizer, parse_args, with_pretrained_backbone,
)

from mer_tpu.core import load_config
from mer_tpu.data import TextBatcher, TextFeatureDataset
from mer_tpu.objectives import balanced_class_weights
from mer_tpu.train import FESolver

CONFIG = os.path.join(REPO_ROOT, "src", "feature_extractors", "text", "config.yaml")


def main(argv=None):
    args = parse_args(argv, default_config=CONFIG)
    config = load_config(args.config)
    if args.epochs is not None:
        config = config.override(solver__epochs=args.epochs)
    if args.zero1:
        config = config.override(tpu__zero1=True)

    model, tokenizer, pretrained = load_text_model_and_tokenizer(args, config=config)

    data_train = TextFeatureDataset("train", tokenizer, data_root=args.data_root)
    data_val = TextFeatureDataset("val", tokenizer, data_root=args.data_root)
    print(f"Loaded {len(data_train)} utterances for training")
    print(f"Loaded {len(data_val)} utterances for valing")

    dl_train = TextBatcher(data_train, int(config.train.data_loader.batch_size),
                           shuffle=bool(config.train.data_loader.shuffle))
    dl_val = TextBatcher(data_val, int(config.val.data_loader.batch_size))

    class_weights = (
        balanced_class_weights(data_train.get_labels()) if bool(config.solver.balance_classes) else None
    )

    from mer_tpu.parallel import mesh_from_config

    pp_mesh, pp_logits_fn = build_pp(args, model, "text")
    if pp_mesh is not None:
        mesh = pp_mesh
    else:
        try:
            mesh = mesh_from_config(config)
        except ValueError:
            mesh = None

    solver = FESolver(
        model, config, backbone_key="roberta",
        batch_to_inputs=lambda b: (b["text"], b["attention_mask"]),
        class_weights=class_weights,
        mesh=mesh if (mesh is not None and mesh.size > 1) else None,
        pp_logits_fn=pp_logits_fn,
    )

    example = next(iter(dl_train))
    state = solver.init_state(example, steps_per_epoch=len(dl_train))
    state = with_pretrained_backbone(solver, state, "roberta", pretrained)

    print("Training...")
    state, history = solver.fit(dl_train, dl_val, state=state)
    print("Training complete")
    return state, history


if __name__ == "__main__":
    main()
