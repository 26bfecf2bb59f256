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
from mer_tpu.train import MelSolver, load_checkpoint
from mer_tpu.train.checkpoint import restore_into

CONFIG = os.path.join(REPO_ROOT, "src", "feature_extractors", "audio_mel", "config_audio_mel.yaml")


def visualize_embeddings(embeddings: np.ndarray, labels: np.ndarray, out_path: str, kind: str = "2D") -> dict:
    """PCA(50) -> t-SNE scatter + silhouette score
    (reference audio_mel/embeddings.py:83-122, train.py:282-342)."""
    from sklearn.decomposition import PCA
    from sklearn.manifold import TSNE
    from sklearn.metrics import silhouette_score

    x = embeddings
    if x.shape[1] > 50:
        x = PCA(n_components=50).fit_transform(x)
    n_comp = 3 if kind == "3D" else 2
    z = TSNE(n_components=n_comp, init="pca", perplexity=min(30, max(5, len(x) // 10))).fit_transform(x)
    sil = float(silhouette_score(embeddings, labels)) if len(set(labels.tolist())) > 1 else 0.0

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig = plt.figure(figsize=(8, 8))
        if n_comp == 3:
            ax = fig.add_subplot(projection="3d")
            ax.scatter(z[:, 0], z[:, 1], z[:, 2], c=labels, cmap="tab10", s=8)
        else:
            plt.scatter(z[:, 0], z[:, 1], c=labels, cmap="tab10", s=8)
        plt.title(f"t-SNE (silhouette={sil:.4f})")
        os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
        plt.savefig(out_path, dpi=120)
        plt.close(fig)
    except ImportError:
        pass
    return {"silhouette": sil, "tsne": z}


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
    restored = load_checkpoint(ckpt_path)
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
                table, ds.get_labels(), os.path.join(save_dir, "tsne_val.png"),
                kind=str(config.get_path("DEBUG.visualization_type", "2D")),
            )
            print(f"silhouette score (val): {diag['silhouette']:.4f}")


if __name__ == "__main__":
    main()
