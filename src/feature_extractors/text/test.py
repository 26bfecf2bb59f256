"""Text FE evaluation — parity with the reference text/test.py: load the
tuned checkpoint (config test.model_path), report batch-averaged accuracy and
weighted-F1 on the test split."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from fe_common import REPO_ROOT, load_text_model_and_tokenizer, parse_args

from mer_tpu.core import load_config
from mer_tpu.data import TextBatcher, TextFeatureDataset
from mer_tpu.train import FESolver, load_checkpoint_auto
from mer_tpu.train.checkpoint import restore_into

CONFIG = os.path.join(REPO_ROOT, "src", "feature_extractors", "text", "config.yaml")


def main(argv=None):
    args = parse_args(argv, default_config=CONFIG)
    config = load_config(args.config)

    model, tokenizer, _ = load_text_model_and_tokenizer(args, config=config)

    data_test = TextFeatureDataset("test", tokenizer, data_root=args.data_root)
    print(f"Loaded {len(data_test)} utterances for testing")
    dl_test = TextBatcher(data_test, int(config.test.data_loader.batch_size))

    solver = FESolver(
        model, config, backbone_key="roberta",
        batch_to_inputs=lambda b: (b["text"], b["attention_mask"]),
    )
    example = next(iter(dl_test))
    state = solver.init_state(example, steps_per_epoch=1)

    model_path = os.path.abspath(str(config.test.model_path))
    if not os.path.exists(model_path):
        raise FileNotFoundError(f"Checkpoint not found at {model_path}")
    restored = load_checkpoint_auto(model_path)
    params = restore_into(state["params"], restored["params"])

    return solver.test(dl_test, params)


if __name__ == "__main__":
    main()
