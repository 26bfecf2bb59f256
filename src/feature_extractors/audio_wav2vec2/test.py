"""wav2vec2 FE evaluation.

Parity with the reference audio_wav2vec2/test.py — including the fix for its
latent bug: the reference reads ``config.checkpoint.save_folder`` (test.py:36)
which does not exist in its config.yaml (only ``save_path``), so the script
crashes as shipped.  We read ``save_path`` (SURVEY.md §7.4 quirk decision)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from fe_common import REPO_ROOT, load_wav2vec2_model, parse_args

from mer_tpu.core import load_config
from mer_tpu.data import Wav2Vec2Batcher, Wav2Vec2FeatureDataset
from mer_tpu.data.wav2vec2_fe import w2v_batch_to_inputs
from mer_tpu.train import FESolver, load_checkpoint_auto
from mer_tpu.train.checkpoint import restore_into

CONFIG = os.path.join(REPO_ROOT, "src", "feature_extractors", "audio_wav2vec2", "config.yaml")


def main(argv=None):
    args = parse_args(argv, default_config=CONFIG)
    config = load_config(args.config)

    model, _ = load_wav2vec2_model(args, config=config)

    data_test = Wav2Vec2FeatureDataset("test", data_root=args.data_root)
    print(f"Loaded {len(data_test)} utterances for testing")
    dl_test = Wav2Vec2Batcher(data_test, int(config.test.data_loader.batch_size))

    solver = FESolver(
        model, config, backbone_key="wav2vec2",
        batch_to_inputs=w2v_batch_to_inputs,
    )
    example = next(iter(dl_test))
    state = solver.init_state(example, steps_per_epoch=1)

    ckpt_path = os.path.abspath(str(config.checkpoint.save_path))
    if not os.path.exists(ckpt_path):
        raise FileNotFoundError(f"Checkpoint not found at {ckpt_path}")
    restored = load_checkpoint_auto(ckpt_path)
    params = restore_into(state["params"], restored["params"])

    return solver.test(dl_test, params)


if __name__ == "__main__":
    main()
