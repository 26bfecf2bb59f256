"""Mel embedding export + diagnostics — parity with the reference
audio_mel/embeddings.py: load the trained ResNet18+projector checkpoint,
export embeddings/audio_mel/{mode}.pkl float32 [N, 300] tables; optional
PCA->t-SNE visualization and silhouette score (the reference's C25/C26
diagnostics) when sklearn/matplotlib are available."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

from fe_common import REPO_ROOT, parse_args

from mer_tpu.core import load_config, save_embeddings
from mer_tpu.data import MelFeatureDataset
from mer_tpu.models.resnet import AudioMelFeatureExtractor
from mer_tpu.train import MelSolver, load_checkpoint_auto
from mer_tpu.train.checkpoint import restore_into

CONFIG = os.path.join(REPO_ROOT, "src", "feature_extractors", "audio_mel", "config_audio_mel.yaml")


def visualize_embeddings(embeddings: np.ndarray, labels: np.ndarray, out_dir: str,
                         kind: str = "2D", logger=None) -> dict:
    """PCA -> t-SNE scatter (PNG + interactive HTML) + silhouette score +
    wandb uploads (reference audio_mel/embeddings.py:83-122,
    train.py:282-342). See mer_tpu.utils.viz for the rendering contract."""
    from mer_tpu.core.config import EMOTION_LABELS
    from mer_tpu.utils import viz

    return viz.visualize_embeddings(
        embeddings, labels, out_dir, kind=kind, logger=logger,
        label_names=EMOTION_LABELS,
    )


def main(argv=None, save_dir: str = "embeddings/audio_mel"):
    args = parse_args(argv, default_config=CONFIG)
    config = load_config(args.config)

    model = AudioMelFeatureExtractor()
    data_val = MelFeatureDataset("val", config, data_root=args.data_root)
    solver = MelSolver(model, config, data_val, data_val)
    state = solver.init_state()

    ckpt_path = os.path.abspath(str(config.checkpoint.save_path))
    if not os.path.exists(ckpt_path):
        raise FileNotFoundError(f"Checkpoint not found at {ckpt_path} — train first")
    if ckpt_path.endswith((".pth", ".pt")):
        # reference torch checkpoint (best_weights.pth): convert in place;
        # restore_into validates shapes against the initialized trees
        import torch

        from mer_tpu.models.resnet import convert_torch_mel_extractor

        ckpt = torch.load(ckpt_path, map_location="cpu", weights_only=True)
        sd = ckpt.get("model_state_dict", ckpt)
        converted, batch_stats = convert_torch_mel_extractor(sd)
        params = restore_into(state.params, converted)
        solver.set_batch_stats(restore_into(solver._batch_stats, batch_stats))
        print(f"Converted reference torch checkpoint {ckpt_path}")
    else:
        restored = load_checkpoint_auto(ckpt_path)
        params = restore_into(state.params, restored["params"])

    for mode in ["train", "val", "test"]:
        ds = MelFeatureDataset(mode, config, data_root=args.data_root)
        print(f"Saving {mode} embeddings...")
        table = solver.export_embeddings(ds, params, batch_size=int(config.test.data_loader.batch_size))
        out = os.path.join(os.path.abspath(save_dir), f"{mode}.pkl")
        save_embeddings(out, table)
        print(f"Saved {mode} embeddings to {out}")
        if mode == "val" and bool(config.get_path("DEBUG.visualize", False)):
            diag = visualize_embeddings(
                table, ds.get_labels(), os.path.join(save_dir, "visualization"),
                kind=str(config.get_path("DEBUG.visualization_type", "2D")),
                logger=solver.logger,
            )
            print(f"silhouette score (val): {diag['silhouette']:.4f}")


if __name__ == "__main__":
    main()
