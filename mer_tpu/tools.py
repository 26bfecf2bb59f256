"""Small operational utilities.

``python -m mer_tpu.tools inspect <checkpoint>`` — print a checkpoint's
epoch, early-stop state, parameter count and top-level tree shapes without
loading a model.

``python -m mer_tpu.tools export-torch <checkpoint.ckpt> <out.pth> [config.yaml]``
— convert a fusion checkpoint to the reference's torch layout
(``{'epoch', 'model_state_dict'}``, loadable by reference src/test.py:35-41).
"""

from __future__ import annotations

import sys

import numpy as np


def inspect_checkpoint(path: str) -> dict:
    from mer_tpu.train.checkpoint import load_checkpoint

    ckpt = load_checkpoint(path)

    def count(tree) -> int:
        import jax

        return sum(int(np.size(x)) for x in jax.tree.leaves(tree))

    info = {
        "path": path,
        "epoch": ckpt["epoch"],
        "n_params": count(ckpt["params"]),
        "n_opt_state": count(ckpt.get("opt_state", {})),
        "extra": {k: v for k, v in ckpt.get("extra", {}).items() if not hasattr(v, "shape")},
        "top_level": sorted(ckpt["params"].keys()) if isinstance(ckpt["params"], dict) else type(ckpt["params"]).__name__,
    }
    return info


def export_torch(ckpt_path: str, out_path: str, config_path: str | None = None) -> None:
    import os

    from mer_tpu.core import load_config
    from mer_tpu.models import M2FNet
    from mer_tpu.models.torch_export import save_reference_checkpoint
    from mer_tpu.train.checkpoint import load_checkpoint

    config_path = config_path or os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "src", "config.yaml")
    cfg = load_config(config_path)
    ckpt = load_checkpoint(ckpt_path)
    # layout (scan vs unrolled) is inferred from the stored tree itself
    scan = any("layers_scan" in v for v in ckpt["params"].values() if isinstance(v, dict))
    model = M2FNet.from_config(cfg.model, scan_layers=scan)
    save_reference_checkpoint(out_path, ckpt["params"], model, epoch=int(ckpt["epoch"]))
    print(f"wrote {out_path} (epoch {ckpt['epoch']}, torch model_state_dict layout)")


def _hf_cached(repo_id: str) -> bool:
    """Is a pretrained checkpoint available offline (HF hub cache or a local
    directory named like the repo)?"""
    import os

    if os.path.isdir(repo_id):  # --pretrained /path/to/dir
        return True
    try:
        from huggingface_hub import try_to_load_from_cache

        hit = try_to_load_from_cache(repo_id, "config.json")
        return isinstance(hit, str) and os.path.exists(hit)
    except Exception:
        return False


def preflight(data_root: str | None = None) -> int:
    """Readiness check for the real-assets chain (this machine ships no MELD
    corpus, no network egress and no HF weight cache — reference setup:
    /root/reference/README.md 'Setup' + scripts/MELD_download.sh).

    Prints exactly what is missing and the one command to run per stage once
    the asset appears.  Exit code 0 = everything present.
    """
    import os

    root = os.path.abspath(data_root or "data")
    raw = os.path.join(root, "MELD.Raw")
    checks: list[tuple[str, bool, str]] = []  # (label, present, fix command)

    csvs = {
        "train": "train_sent_emo.csv",
        "val": "dev_sent_emo.csv",
        "test": "test_sent_emo.csv",
    }
    for split, name in csvs.items():
        p = os.path.join(raw, name)
        checks.append((f"{split} CSV ({p})", os.path.exists(p),
                       "bash scripts/MELD_download.sh   # downloads + unpacks MELD.Raw"))

    wav_dirs = {
        "train": "train_splits/wav",
        "val": "dev_splits_complete/wav",
        "test": "output_repeated_splits_test/wav",
    }
    for split, sub in wav_dirs.items():
        p = os.path.join(raw, sub)
        n = len([f for f in os.listdir(p) if f.endswith(".wav")]) if os.path.isdir(p) else 0
        checks.append((f"{split} wavs ({p}: {n} files)", n > 0,
                       f"python scripts/mp4towav.py {os.path.dirname(p)}   # mp4 -> 16 kHz wav"))

    for repo in ("roberta-base", "facebook/wav2vec2-base"):
        checks.append((f"HF weights: {repo}", _hf_cached(repo),
                       f"huggingface-cli download {repo}   # or pass --pretrained <local_dir>"))

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for name in ("text_base", "audio_wav2vec2"):
        d = os.path.join(repo_root, "embeddings", name)
        have = all(os.path.exists(os.path.join(d, f"{s}.pkl")) for s in ("train", "val", "test"))
        stage = "text" if name == "text_base" else "audio_wav2vec2"
        checks.append((f"stage-1 embeddings ({d})", have,
                       f"python src/feature_extractors/{stage}/train.py --data-root {root} && "
                       f"python src/feature_extractors/{stage}/embeddings.py --data-root {root}"))

    missing = [(label, fix) for label, ok, fix in checks if not ok]
    for label, ok, _ in checks:
        print(f"  [{'ok' if ok else 'MISSING'}] {label}")
    if not missing:
        print("\nAll assets present. Full chain:")
        print(f"  python src/train.py --data-root {root}   # stage-2 fusion training")
        print("  python src/test.py                        # MELD-test weighted F1")
        return 0
    print(f"\n{len(missing)} missing. Commands to run once each asset is stageable:")
    seen = set()
    for _, fix in missing:
        if fix not in seen:
            seen.add(fix)
            print(f"  {fix}")
    return 1


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if not argv or argv[0] not in {"inspect", "export-torch", "preflight"}:
        print(
            "usage: python -m mer_tpu.tools inspect <checkpoint.ckpt>\n"
            "       python -m mer_tpu.tools export-torch <checkpoint.ckpt> <out.pth> [config.yaml]\n"
            "       python -m mer_tpu.tools preflight [data_root]",
            file=sys.stderr,
        )
        return 1
    if argv[0] == "inspect":
        import json

        print(json.dumps(inspect_checkpoint(argv[1]), indent=2, default=str))
    elif argv[0] == "export-torch":
        export_torch(argv[1], argv[2], argv[3] if len(argv) > 3 else None)
    elif argv[0] == "preflight":
        return preflight(argv[1] if len(argv) > 1 else None)
    return 0


if __name__ == "__main__":
    sys.exit(main())
