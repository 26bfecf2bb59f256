"""Flax -> torch weight export for the fusion model stack.

The inverse of models/torch_import.py: users can train M2FNet in this
framework and evaluate or keep serving it with the reference implementation
(``torch.save({'epoch', 'model_state_dict', ...})``, the checkpoint layout
of reference src/train.py:163-168 that src/test.py:35-41 loads).  Host-side
only; torch is imported lazily and never touches the TPU compute path.

Naming maps are exactly the reverse of torch_import.py's table; scan-stacked
(``layers_scan``) and unrolled (``layers_{i}``) encoder layouts both export
to the reference's ``layers.{i}.*`` keys.
"""

from __future__ import annotations

from typing import Any

import numpy as np


def _np(x: Any) -> np.ndarray:
    return np.asarray(x, dtype=np.float32)


def unstack_layers(stacked: dict) -> list[dict]:
    """Split a scan-stacked param tree (leading layer axis) back into
    per-layer trees — the inverse of torch_import.stack_layers."""
    import jax

    leaves, treedef = jax.tree.flatten(stacked)
    n = leaves[0].shape[0]
    return [treedef.unflatten([_np(leaf[i]) for leaf in leaves]) for i in range(n)]


def export_linear(node: dict, prefix: str, out: dict) -> None:
    out[f"{prefix}weight"] = _np(node["kernel"]).T
    out[f"{prefix}bias"] = _np(node["bias"])


def export_layernorm(node: dict, prefix: str, out: dict) -> None:
    out[f"{prefix}weight"] = _np(node["scale"])
    out[f"{prefix}bias"] = _np(node["bias"])


def export_mha(node: dict, prefix: str, out: dict) -> None:
    out[f"{prefix}in_proj_weight"] = np.concatenate(
        [_np(node[k]["kernel"]).T for k in ("q_proj", "k_proj", "v_proj")], axis=0
    )
    out[f"{prefix}in_proj_bias"] = np.concatenate(
        [_np(node[k]["bias"]) for k in ("q_proj", "k_proj", "v_proj")], axis=0
    )
    export_linear(node["out_proj"], f"{prefix}out_proj.", out)


def export_encoder_layer(node: dict, prefix: str, out: dict) -> None:
    export_mha(node["self_attn"], f"{prefix}self_attn.", out)
    export_linear(node["linear1"], f"{prefix}linear1.", out)
    export_linear(node["linear2"], f"{prefix}linear2.", out)
    export_layernorm(node["norm1"], f"{prefix}norm1.", out)
    export_layernorm(node["norm2"], f"{prefix}norm2.", out)


def export_encoder(node: dict, prefix: str, out: dict) -> None:
    if "layers_scan" in node:
        per_layer = unstack_layers(node["layers_scan"]["layer"])
    else:
        n = sum(1 for k in node if k.startswith("layers_"))
        per_layer = [node[f"layers_{i}"] for i in range(n)]
    for i, lp in enumerate(per_layer):
        export_encoder_layer(lp, f"{prefix}layers.{i}.", out)
    if "norm" in node:
        export_layernorm(node["norm"], f"{prefix}norm.", out)


def export_m2fnet_state_dict(params: dict, model) -> dict[str, np.ndarray]:
    """Convert this framework's M2FNet params to a reference-compatible
    ``model_state_dict`` (numpy values; ``model`` is the mer_tpu M2FNet the
    params belong to, used for toggles and the classifier index math)."""
    out: dict[str, np.ndarray] = {}

    if model.audio_enabled:
        for i in range(model.n_transformers_audio):
            export_encoder(params[f"audio_encoders_{i}"], f"audio_encoders.{i}.", out)
        export_linear(params["audio_proj"], "audio_proj.", out)

    if model.text_enabled:
        for i in range(model.n_transformers_text):
            export_encoder(params[f"text_encoders_{i}"], f"text_encoders.{i}.", out)
        export_linear(params["text_proj"], "text_proj.", out)

    if model.fam_enabled:
        for i in range(model.n_layers_fam):
            fam = params[f"fusion_layers_{i}"]
            export_mha(fam["multihead_attention"], f"fusion_layers.{i}.multihead_attention.", out)
            export_linear(fam["linear"], f"fusion_layers.{i}.linear.", out)

    # reference output_layer Sequential index math (torch_import.py:136-150)
    linear_indices = [0]
    pos = 1
    for _ in range(max(model.n_layers_classifier - 2, 0)):
        pos += 1  # ReLU
        linear_indices.append(pos)
        pos += 1
    pos += 2  # ReLU, Dropout
    for j, seq_idx in enumerate(linear_indices):
        export_linear(params[f"classifier_{j}"], f"output_layer.{seq_idx}.", out)
    export_linear(params["classifier_out"], f"output_layer.{pos}.", out)
    return out


def save_reference_checkpoint(path: str, params: dict, model, epoch: int = 0) -> None:
    """Write a checkpoint the reference's ``src/test.py:35-41`` loads as-is:
    ``torch.save({'epoch', 'model_state_dict'})`` with torch tensors."""
    import torch

    # copy: jax arrays surface as non-writable numpy views
    sd = {k: torch.from_numpy(np.array(v)) for k, v in export_m2fnet_state_dict(params, model).items()}
    torch.save({"epoch": epoch, "model_state_dict": sd}, path)
