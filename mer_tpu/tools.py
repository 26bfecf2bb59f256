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


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if not argv or argv[0] not in {"inspect", "export-torch"}:
        print(
            "usage: python -m mer_tpu.tools inspect <checkpoint.ckpt>\n"
            "       python -m mer_tpu.tools export-torch <checkpoint.ckpt> <out.pth> [config.yaml]",
            file=sys.stderr,
        )
        return 1
    if argv[0] == "inspect":
        import json

        print(json.dumps(inspect_checkpoint(argv[1]), indent=2, default=str))
    elif argv[0] == "export-torch":
        export_torch(argv[1], argv[2], argv[3] if len(argv) > 3 else None)
    return 0


if __name__ == "__main__":
    sys.exit(main())
