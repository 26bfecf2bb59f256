"""int8 quantized serving path for the M2FNet fusion model.

The fusion serving workload is HBM-bandwidth-bound: at the reference batch
(32 dialogues, <=33 utterances) activations are tiny and every step re-reads
the full 86.3M-parameter weight set.  Storing the dense kernels as int8
(per-output-channel symmetric scales) cuts that traffic 2x vs bf16 / 4x vs
f32, and the GEMMs run as int8 x int8 -> int32 on the MXU (2x bf16 MACs on
v5e) via ``lax.dot_general(..., preferred_element_type=int32)``.

Recipe:
- weights: post-training symmetric per-output-channel int8
  (``scale = max|W| / 127`` over the input axis), biases / LayerNorms f32;
- activations: dynamic per-row symmetric int8 at each GEMM input (computed
  on-chip from the live tensor — no calibration set needed);
- attention score/PV math stays bf16 (activation-activation products over
  <=33 utterances — negligible traffic, keeps softmax exact in f32).

This is a *serving engine*, not a Flax module: ``quantize_m2fnet`` converts
a trained/converted param tree once, and ``M2FNetInt8.apply`` is a purely
functional deterministic forward over the quantized tree (jit/shard as
usual).  Numerics change (hence separate from the training model, mirroring
the reference's eval-time ``model.eval()`` contract at src/test.py:35-40);
tolerance vs the f32 forward is pinned in tests/test_serving_quant.py.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Quantized primitives
# ---------------------------------------------------------------------------


def quantize_weight(w: jnp.ndarray) -> dict:
    """Per-output-channel symmetric int8 for a Flax kernel [..., in, out]
    (leading axes = scan-stacked layers). Returns {"q": int8, "scale": f32}."""
    w = jnp.asarray(w, jnp.float32)
    amax = jnp.max(jnp.abs(w), axis=-2, keepdims=True)  # reduce the input axis
    scale = jnp.maximum(amax / 127.0, 1e-12)
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return {"q": q, "scale": scale.astype(jnp.float32)}


def int8_dense(x: jnp.ndarray, wq: dict, bias: jnp.ndarray | None,
               act_scale: jnp.ndarray | None = None) -> jnp.ndarray:
    """y = dequant(quant(x) @ Wq) + b.

    x: [..., K] float; wq["q"]: [K, N] int8; wq["scale"]: [1, N].
    The GEMM is int8 x int8 -> int32 (MXU native); dequantization is a cheap
    elementwise rescale by (activation_scale * channel_scale).

    Activation quantization: dynamic per-row symmetric by default (abs-max
    reduction over the live tensor); with ``act_scale`` (a calibrated scalar,
    see ``calibration``) the reduction is skipped and quantization is
    deterministic batch-to-batch.
    """
    if act_scale is None:
        ax = jnp.max(jnp.abs(x), axis=-1, keepdims=True).astype(jnp.float32)
        a_scale = jnp.maximum(ax / 127.0, 1e-12)
    else:
        a_scale = act_scale
    xq = jnp.clip(jnp.round(x / a_scale), -127, 127).astype(jnp.int8)
    y = jax.lax.dot_general(
        xq, wq["q"],
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)
    y = y * a_scale * wq["scale"].reshape(1, -1)
    if bias is not None:
        y = y + bias
    return y


def _layer_norm(x: jnp.ndarray, p: dict, eps: float = 1e-5) -> jnp.ndarray:
    x = x.astype(jnp.float32)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


# ---------------------------------------------------------------------------
# Param-tree quantization
# ---------------------------------------------------------------------------


def quantize_tree(params: Any, skip_subtrees: tuple[str, ...] = ()) -> Any:
    """Recursively replace every Dense ``{"kernel", "bias"}`` node with its
    int8 form; LayerNorm ``{"scale", "bias"}`` nodes and everything else stay
    f32 (they are a negligible fraction of the bytes).

    ``skip_subtrees`` names path components whose kernels must stay float —
    conv stacks whose [k, in, out] kernels don't fit the per-output-channel
    GEMM scheme (e.g. wav2vec2's feature_extractor / pos_conv_embed)."""

    def rec(node, path):
        if isinstance(node, dict):
            if "kernel" in node and not any(s in path for s in skip_subtrees):
                out = {"kernel_q": quantize_weight(node["kernel"])}
                if "bias" in node:
                    out["bias"] = jnp.asarray(node["bias"], jnp.float32)
                return out
            return {k: rec(v, path + (k,)) for k, v in node.items()}
        return jnp.asarray(node, jnp.float32)

    return rec(params, ())


def quantize_m2fnet(params: Any) -> Any:
    """Quantize a trained M2FNet param tree (from Solver / torch_import) for
    the int8 serving engine. One-time host/device transform."""
    return quantize_tree(params)


def quantized_bytes(qparams: Any) -> int:
    return sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(qparams))


def _dense(x, node):
    if _CALIBRATION_SINK is not None:
        # eager observer pass: record the largest |activation| seen per site.
        # Sites are identified by the node object inside the qparams tree;
        # per-layer slices of scan-stacked nodes carry an explicit "_site"
        # (stacked-node id, layer) key instead (see scan_stacked).
        amax = float(jnp.max(jnp.abs(x)))
        key = node.get("_site", id(node))
        _CALIBRATION_SINK[key] = max(_CALIBRATION_SINK.get(key, 0.0), amax)
    return int8_dense(x, node["kernel_q"], node.get("bias"), node.get("act_scale"))


def _slice_stacked(node, i: int):
    """Layer ``i`` of a scan-stacked qparams subtree, annotating each dense
    node with its calibration site (stacked-node id, layer)."""
    if isinstance(node, dict):
        if "kernel_q" in node:
            out = {k: jax.tree.map(lambda a: a[i], v) if k != "_site" else v for k, v in node.items()}
            out["_site"] = (id(node), i)
            return out
        return {k: _slice_stacked(v, i) for k, v in node.items()}
    return node[i]


def scan_stacked(layer_fn, carry, stacked):
    """lax.scan ``layer_fn`` over a scan-stacked qparams subtree.

    During a calibration pass the scan is unrolled in Python (lax.scan traces
    its body, so eager activation observation is impossible inside it) with
    per-layer site annotations; stacked ``act_scale`` entries are stored as
    [L] arrays so the production scan slices a scalar per layer."""
    if _CALIBRATION_SINK is not None:
        n_layers = jax.tree.leaves(stacked)[0].shape[0]
        for i in range(n_layers):
            carry = layer_fn(carry, _slice_stacked(stacked, i))
        return carry

    def body(c, layer_p):
        return layer_fn(c, layer_p), None

    carry, _ = jax.lax.scan(body, carry, stacked)
    return carry


# ---------------------------------------------------------------------------
# Static activation calibration (quantization-aware serving)
# ---------------------------------------------------------------------------


_CALIBRATION_SINK: dict | None = None


class calibration:
    """Context manager for post-training static activation calibration.

    Run representative batches through an int8 engine's (un-jitted) forward
    inside this context; every quantized GEMM site records the largest
    activation magnitude it sees.  ``apply_calibration`` then bakes the
    resulting per-tensor scales into the qparams tree, after which serving
    skips the per-row abs-max reduction and quantization is deterministic::

        qp = quantize_m2fnet(params)
        with calibration() as sink:
            for b in calib_batches:          # EAGER — do not jit this pass
                server.apply(qp, b["text"], b["audio"], b["padding_mask"])
        qp = apply_calibration(qp, sink)     # static scales baked in
        predict = jax.jit(server.apply)      # jit as usual
    """

    def __init__(self):
        self.sink: dict[int, float] = {}

    def __enter__(self):
        global _CALIBRATION_SINK
        assert _CALIBRATION_SINK is None, "nested calibration contexts"
        _CALIBRATION_SINK = self.sink
        return self.sink

    def __exit__(self, *exc):
        global _CALIBRATION_SINK
        _CALIBRATION_SINK = None
        return False


def apply_calibration(qparams: Any, sink: dict, headroom: float = 1.0) -> Any:
    """Bake observed activation abs-max values into the qparams tree as
    static per-tensor ``act_scale`` entries (scale = headroom * amax / 127).
    Scan-stacked dense nodes (sites keyed (node id, layer)) get an [L] array
    that the production lax.scan slices per layer.  Sites never exercised
    during calibration keep dynamic quantization.

    Must be called on the SAME tree object the calibration pass ran over —
    sites are identified by node identity, so rebuilding the tree (e.g.
    ``jax.device_put``) between calibrate and apply would match nothing;
    that case raises instead of silently leaving every site dynamic."""

    matched = 0

    def scale_of(amax: float):
        return max(headroom * amax / 127.0, 1e-12)

    def rec(node):
        nonlocal matched
        if isinstance(node, dict):
            if "kernel_q" in node:
                if node["kernel_q"]["q"].ndim == 3:  # scan-stacked [L, K, N]
                    n_layers = node["kernel_q"]["q"].shape[0]
                    per_layer = [sink.get((id(node), i)) for i in range(n_layers)]
                    if any(a is None or a <= 0.0 for a in per_layer):
                        return node
                    out = dict(node)
                    out["act_scale"] = jnp.asarray([scale_of(a) for a in per_layer], jnp.float32)
                    matched += 1
                    return out
                amax = sink.get(id(node))
                if amax is None or amax <= 0.0:
                    return node
                out = dict(node)
                out["act_scale"] = jnp.float32(scale_of(amax))
                matched += 1
                return out
            return {k: rec(v) for k, v in node.items()}
        return node

    out = rec(qparams)
    if sink and matched == 0:
        raise ValueError(
            f"calibration sink has {len(sink)} observed sites but none matched this "
            "tree — apply_calibration must receive the same tree object the "
            "calibration pass ran over (device_put/rebuilds change node identity; "
            "device_put AFTER applying instead)"
        )
    return out


# ---------------------------------------------------------------------------
# Functional M2FNet forward over the quantized tree
# ---------------------------------------------------------------------------


_NEG_INF = -1e30


def _attention(q, k, v, num_heads: int, key_padding_mask):
    """bf16 attention over [B, S, D] projections (activation-activation math;
    int8 buys nothing at <=33 utterances)."""
    b, sq, d = q.shape
    sk = k.shape[1]
    dh = d // num_heads
    split = lambda x, s: x.reshape(b, s, num_heads, dh).transpose(0, 2, 1, 3)
    q, k, v = split(q, sq), split(k, sk), split(v, sk)
    scale = 1.0 / math.sqrt(dh)
    s = jnp.einsum(
        "bhqd,bhkd->bhqk", (q * scale).astype(jnp.bfloat16), k.astype(jnp.bfloat16)
    ).astype(jnp.float32)
    if key_padding_mask is not None:
        s = s + jnp.where(key_padding_mask, _NEG_INF, 0.0)[:, None, None, :]
    p = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", p.astype(jnp.bfloat16), v.astype(jnp.bfloat16))
    return out.astype(jnp.float32).transpose(0, 2, 1, 3).reshape(b, sq, d)


def _mha(x_q, x_kv_key, x_kv_val, p: dict, num_heads: int, mask):
    """MultiheadAttention parity (models/layers.py:31-75) over int8 weights."""
    q = _dense(x_q, p["q_proj"])
    k = _dense(x_kv_key, p["k_proj"])
    v = _dense(x_kv_val, p["v_proj"])
    out = _attention(q, k, v, num_heads, mask)
    return _dense(out, p["out_proj"])


def _encoder_layer(x, p: dict, num_heads: int, mask):
    """Post-LN torch TransformerEncoderLayer (models/layers.py:78-112)."""
    attn = _mha(x, x, x, p["self_attn"], num_heads, mask)
    x = _layer_norm(x + attn, p["norm1"])
    h = jax.nn.relu(_dense(x, p["linear1"]))
    h = _dense(h, p["linear2"])
    return _layer_norm(x + h, p["norm2"])


def _encoder(x, p: dict, num_heads: int, num_layers: int, mask):
    """TransformerEncoder (+final LN), supporting both the unrolled
    (layers_{i}) and scan-stacked (layers_scan, leading L axis) layouts."""
    if "layers_scan" in p:
        x = scan_stacked(
            lambda carry, layer_p: _encoder_layer(carry, layer_p, num_heads, mask),
            x, p["layers_scan"]["layer"],
        )
    else:
        for i in range(num_layers):
            x = _encoder_layer(x, p[f"layers_{i}"], num_heads, mask)
    if "norm" in p:
        x = _layer_norm(x, p["norm"])
    return x


class M2FNetInt8:
    """Deterministic int8 serving forward for M2FNet.

    Args:
        model: the (trained) M2FNet Flax module — hyperparameters are read
            from it so the quantized forward mirrors the exact architecture
            (reference src/model.py:102-143 semantics, eval mode).
    """

    def __init__(self, model):
        if not (model.audio_enabled and model.text_enabled and model.fam_enabled):
            raise ValueError("int8 serving engine supports the full-modality M2FNet config")
        self.m = model

    def apply(self, qparams: Any, text: jnp.ndarray, audio: jnp.ndarray,
              padding_mask: jnp.ndarray) -> jnp.ndarray:
        m, p = self.m, qparams

        for i in range(m.n_transformers_audio):
            audio = audio + _encoder(
                audio, p[f"audio_encoders_{i}"], m.n_head_audio, m.n_layers_audio, padding_mask
            )
        audio = _dense(audio, p["audio_proj"])

        for i in range(m.n_transformers_text):
            text = text + _encoder(
                text, p[f"text_encoders_{i}"], m.n_head_text, m.n_layers_text, padding_mask
            )
        text = _dense(text, p["text_proj"])

        for i in range(m.n_layers_fam):
            fam = p[f"fusion_layers_{i}"]
            x = _mha(text, audio, text, fam["multihead_attention"], m.n_head_fam, padding_mask)
            x = jax.nn.relu(jnp.concatenate([x, text], axis=-1))
            text = jax.nn.relu(_dense(x, fam["linear"]))

        x = jnp.concatenate([audio, text], axis=-1)
        x = jax.nn.relu(_dense(x, p["classifier_0"]))
        for i in range(max(m.n_layers_classifier - 2, 0)):
            x = jax.nn.relu(_dense(x, p[f"classifier_{i + 1}"]))
        return _dense(x, p["classifier_out"])
