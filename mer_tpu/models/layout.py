"""Parameter-layout conversion between scanned and unrolled encoder stacks.

Every encoder in this framework can run its layer stack two ways (see
``TransformerEncoder.scan_layers``, models/layers.py): as ``nn.scan`` over one
compiled layer with params stacked on a leading axis (``layers_scan/layer/...``,
leaf shape ``[L, ...]``), or unrolled into per-layer submodules
(``layers_{i}/...`` for the fusion encoders, ``layer_{i}/...`` for the
RoBERTa/wav2vec2 backbones). The two layouts are numerically identical; the
choice is a compile-size vs backward-overhead trade-off measured per model
(BENCH_LOCAL.json ``fusion_train_decomposition``).

These converters let checkpoints written under one layout load under the
other, so flipping ``tpu.scan_layers`` does not orphan existing checkpoints.
The reference has no analog (single layout, torch Modules;
/root/reference/src/model.py:59-88) — this is framework infrastructure.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np

SCAN_KEY = "layers_scan"


def _is_scan_group(node: Any) -> bool:
    return isinstance(node, dict) and SCAN_KEY in node


def _unrolled_indices(node: dict, prefix: str) -> list[int]:
    """Indices i such that f"{prefix}_{i}" is a key of node, if they form
    a contiguous 0..L-1 range with L >= 1; else []."""
    idx = []
    for k in node:
        if isinstance(k, str) and k.startswith(prefix + "_"):
            suffix = k[len(prefix) + 1 :]
            if suffix.isdigit():
                idx.append(int(suffix))
    idx.sort()
    return idx if idx and idx == list(range(len(idx))) else []


def unstack_scan_params(params: dict, prefix: str = "layers") -> dict:
    """Convert every ``layers_scan`` group found in ``params`` (recursively)
    to unrolled ``{prefix}_{i}`` subtrees. Leaves keep their dtype; the
    leading layer axis is split with a zero-copy view where possible.

    ``prefix`` is the unrolled submodule name stem: "layers" for the fusion
    ``TransformerEncoder``, "layer" for the RoBERTa/wav2vec2 backbones.
    """

    def walk(node: Any) -> Any:
        if not isinstance(node, dict):
            return node
        out = {}
        for k, v in node.items():
            if k == SCAN_KEY and isinstance(v, dict) and "layer" in v:
                inner = v["layer"]
                leaves = jax.tree.leaves(inner)
                if not leaves:
                    raise ValueError("layers_scan group has no leaves")
                n_layers = int(np.shape(leaves[0])[0])
                for i in range(n_layers):
                    out[f"{prefix}_{i}"] = jax.tree.map(lambda x, i=i: x[i], inner)
            else:
                out[k] = walk(v)
        return out

    return walk(params)


def stack_unrolled_params(params: dict, prefix: str = "layers") -> dict:
    """Inverse of :func:`unstack_scan_params`: collapse contiguous
    ``{prefix}_{i}`` subtrees (identical structure, i = 0..L-1) into one
    ``layers_scan/layer`` group with leaves stacked on a new leading axis."""

    def walk(node: Any) -> Any:
        if not isinstance(node, dict):
            return node
        idx = _unrolled_indices(node, prefix)
        out = {}
        if idx:
            per_layer = [jax.tree.map(walk, node[f"{prefix}_{i}"]) for i in idx]
            structs = {jax.tree.structure(p) for p in per_layer}
            if len(structs) == 1:
                out[SCAN_KEY] = {
                    "layer": jax.tree.map(lambda *xs: np.stack([np.asarray(x) for x in xs], axis=0), *per_layer)
                }
            else:  # heterogeneous "{prefix}_{i}" subtrees: not a layer stack
                idx = []
        for k, v in node.items():
            if idx and isinstance(k, str) and k.startswith(prefix + "_") and k[len(prefix) + 1 :].isdigit():
                continue
            out[k] = walk(v)
        return out

    return walk(params)


def params_layout(params: dict) -> str:
    """"scan" if any layers_scan group is present, else "unrolled"."""

    def has_scan(node: Any) -> bool:
        if not isinstance(node, dict):
            return False
        return SCAN_KEY in node or any(has_scan(v) for v in node.values())

    return "scan" if has_scan(params) else "unrolled"


def match_layout(params: dict, want_scan: bool, prefix: str = "layers") -> dict:
    """Convert ``params`` to the requested layout if needed (no-op when it
    already matches). Used on checkpoint restore so ``tpu.scan_layers`` can
    change between save and load."""
    have_scan = params_layout(params) == "scan"
    if want_scan and not have_scan:
        return stack_unrolled_params(params, prefix)
    if not want_scan and have_scan:
        return unstack_scan_params(params, prefix)
    return params
