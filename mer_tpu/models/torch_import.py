"""Torch -> Flax weight conversion for the fusion model stack.

Lets users of the reference implementation carry their trained checkpoints
(``torch.save({'model_state_dict': ...})``, reference src/train.py:163-168)
straight into this framework.  Host-side only; torch is imported lazily and
never touches the TPU compute path.

Naming maps (torch state_dict -> flax param tree):

  nn.MultiheadAttention          MultiheadAttention (models/layers.py)
    in_proj_weight[0:E]    ->      q_proj.kernel (transposed)
    in_proj_weight[E:2E]   ->      k_proj.kernel
    in_proj_weight[2E:3E]  ->      v_proj.kernel
    out_proj.weight        ->      out_proj.kernel

  nn.TransformerEncoderLayer     TransformerEncoderLayer
    self_attn.*            ->      self_attn.*
    linear1/linear2        ->      linear1/linear2
    norm1/norm2            ->      norm1/norm2 (weight->scale)

  nn.TransformerEncoder          TransformerEncoder
    layers.{i}.*           ->      layers_{i}.*
    norm.*                 ->      norm.*

  M2FNet (reference src/model.py)  M2FNet (models/m2fnet.py)
    audio_encoders.{i}     ->      audio_encoders_{i}
    text_encoders.{i}      ->      text_encoders_{i}
    audio_proj/text_proj   ->      audio_proj/text_proj
    fusion_layers.{i}.multihead_attention -> fusion_layers_{i}.multihead_attention
    fusion_layers.{i}.linear              -> fusion_layers_{i}.linear
    output_layer.{seq idx} ->      classifier_0..N / classifier_out
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np


def _np(t: Any) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t.astype(np.float32)
    return t.detach().cpu().numpy().astype(np.float32)


def stack_layers(per_layer: list[dict]) -> dict:
    """Stack identical per-layer param trees on a new leading axis — the
    parameter layout of nn.scan-based encoders (layers_scan/layer/...)."""
    import jax

    return jax.tree.map(lambda *leaves: np.stack(leaves, axis=0), *per_layer)


def convert_linear(sd: Mapping[str, Any], prefix: str) -> dict:
    return {
        "kernel": _np(sd[f"{prefix}weight"]).T,
        "bias": _np(sd[f"{prefix}bias"]),
    }


def convert_layernorm(sd: Mapping[str, Any], prefix: str) -> dict:
    return {
        "scale": _np(sd[f"{prefix}weight"]),
        "bias": _np(sd[f"{prefix}bias"]),
    }


def convert_mha(sd: Mapping[str, Any], prefix: str, embed_dim: int) -> dict:
    w = _np(sd[f"{prefix}in_proj_weight"])
    b = _np(sd[f"{prefix}in_proj_bias"])
    e = embed_dim
    return {
        "q_proj": {"kernel": w[0:e].T, "bias": b[0:e]},
        "k_proj": {"kernel": w[e : 2 * e].T, "bias": b[e : 2 * e]},
        "v_proj": {"kernel": w[2 * e : 3 * e].T, "bias": b[2 * e : 3 * e]},
        "out_proj": convert_linear(sd, f"{prefix}out_proj."),
    }


def convert_encoder_layer(sd: Mapping[str, Any], prefix: str, embed_dim: int) -> dict:
    return {
        "self_attn": convert_mha(sd, f"{prefix}self_attn.", embed_dim),
        "linear1": convert_linear(sd, f"{prefix}linear1."),
        "linear2": convert_linear(sd, f"{prefix}linear2."),
        "norm1": convert_layernorm(sd, f"{prefix}norm1."),
        "norm2": convert_layernorm(sd, f"{prefix}norm2."),
    }


def convert_encoder(sd: Mapping[str, Any], prefix: str, embed_dim: int, num_layers: int,
                    final_norm: bool = True, scan_layers: bool = False) -> dict:
    out: dict = {}
    per_layer = [convert_encoder_layer(sd, f"{prefix}layers.{i}.", embed_dim) for i in range(num_layers)]
    if scan_layers:
        out["layers_scan"] = {"layer": stack_layers(per_layer)}
    else:
        for i, lp in enumerate(per_layer):
            out[f"layers_{i}"] = lp
    if final_norm:
        out["norm"] = convert_layernorm(sd, f"{prefix}norm.")
    return out


def convert_m2fnet_state_dict(sd: Mapping[str, Any], model) -> dict:
    """Convert a reference M2FNet ``model_state_dict`` to this framework's
    M2FNet params (``model`` is a mer_tpu.models.M2FNet instance, used for
    dimensions/toggles)."""
    params: dict = {}

    if model.audio_enabled:
        for i in range(model.n_transformers_audio):
            params[f"audio_encoders_{i}"] = convert_encoder(
                sd, f"audio_encoders.{i}.", model.d_model_audio, model.n_layers_audio,
                scan_layers=model.scan_layers,
            )
        params["audio_proj"] = convert_linear(sd, "audio_proj.")

    if model.text_enabled:
        for i in range(model.n_transformers_text):
            params[f"text_encoders_{i}"] = convert_encoder(
                sd, f"text_encoders.{i}.", model.d_model_text, model.n_layers_text,
                scan_layers=model.scan_layers,
            )
        params["text_proj"] = convert_linear(sd, "text_proj.")

    if model.fam_enabled:
        for i in range(model.n_layers_fam):
            params[f"fusion_layers_{i}"] = {
                "multihead_attention": convert_mha(
                    sd, f"fusion_layers.{i}.multihead_attention.", model.d_model_fam
                ),
                "linear": convert_linear(sd, f"fusion_layers.{i}.linear."),
            }

    # reference output_layer is an nn.Sequential; Linear positions depend on
    # n_layers_classifier (src/model.py:89-100): Linear at 0, then every
    # (ReLU, Linear) pair, with (ReLU, Dropout, Linear) at the tail.
    linear_indices = [0]
    pos = 1
    for _ in range(max(model.n_layers_classifier - 2, 0)):
        pos += 1  # ReLU
        linear_indices.append(pos)
        pos += 1
    pos += 2  # ReLU, Dropout
    final_index = pos

    for j, seq_idx in enumerate(linear_indices):
        params[f"classifier_{j}"] = convert_linear(sd, f"output_layer.{seq_idx}.")
    params["classifier_out"] = convert_linear(sd, f"output_layer.{final_index}.")

    return params


def load_reference_checkpoint(path: str, model) -> dict:
    """Load a reference ``m2fnet.pth`` (src/train.py:163-168 layout) into
    Flax params for ``model``."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=True)
    sd = ckpt["model_state_dict"] if "model_state_dict" in ckpt else ckpt
    return convert_m2fnet_state_dict(sd, model)
