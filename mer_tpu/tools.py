"""Small operational utilities.

``python -m mer_tpu.tools inspect <checkpoint>`` — print a checkpoint's
epoch, early-stop state, parameter count and top-level tree shapes without
loading a model.
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


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if not argv or argv[0] not in {"inspect"}:
        print("usage: python -m mer_tpu.tools inspect <checkpoint.ckpt>", file=sys.stderr)
        return 1
    if argv[0] == "inspect":
        import json

        print(json.dumps(inspect_checkpoint(argv[1]), indent=2, default=str))
    return 0


if __name__ == "__main__":
    sys.exit(main())
