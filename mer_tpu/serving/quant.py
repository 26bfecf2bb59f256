"""int8 quantized serving path for the M2FNet fusion model.

Every fusion forward re-reads the full 86.3M-parameter weight set while the
activations stay tiny (32 dialogues x <=33 utterances).  Storing the dense
kernels as int8 (per-output-channel symmetric scales) cuts weight HBM
traffic 2x vs bf16 / 4x vs f32, and in a8w8 mode the GEMMs run as
int8 x int8 -> int32 on the MXU (2x bf16 MACs on v5e) via
``lax.dot_general(..., preferred_element_type=int32)``.

Honest scope (measured, BENCH_LOCAL fusion_roofline): at the reference
batch the forward is NOT weight-bandwidth-bound — weight reads are a
minority of the wall time (small per-layer GEMMs leave the MXU latency-
bound), so int8 shifts the headline only a few percent there.  The traffic
cut pays where weights dominate: larger models, memory-capacity-constrained
serving (87 MB vs 345 MB resident), and batch-1 latency paths.

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
               act_scale: jnp.ndarray | None = None, weight_only: bool = False) -> jnp.ndarray:
    """y = dequant(quant(x) @ Wq) + b.

    x: [..., K] float; wq["q"]: [K, N] int8; wq["scale"]: [1, N].

    Two modes:

    - a8w8 (default): the GEMM is int8 x int8 -> int32 (MXU native, 2x bf16
      MAC rate on v5e); activations are quantized dynamically per row
      (abs-max reduction over the live tensor) or statically when
      ``act_scale`` (a calibrated scalar, see ``calibration``) is baked in.
    - w8 (``weight_only=True``): weights stay int8 in HBM (the 2x-vs-bf16
      traffic cut) but are cast to bf16 on the fly and the GEMM runs
      bf16 x bf16 with f32 accumulation — no activation quantization math
      at all, and no activation quantization *error*. The right trade at
      small batch, where the dynamic-quant elementwise work doesn't
      amortize (BENCH r2: a8w8 beat bf16 by only 1.2% at the reference
      workload).
    """
    if weight_only:
        y = jax.lax.dot_general(
            x.astype(jnp.bfloat16), wq["q"].astype(jnp.bfloat16),
            dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        y = y * wq["scale"].reshape(1, -1)
        if bias is not None:
            y = y + bias
        return y
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


def quantize_tree(params: Any, skip_subtrees: tuple[str, ...] = (),
                  weight_only: bool = False) -> Any:
    """Recursively replace every Dense ``{"kernel", "bias"}`` node with its
    int8 form; LayerNorm ``{"scale", "bias"}`` nodes and everything else stay
    f32 (they are a negligible fraction of the bytes).

    ``skip_subtrees`` names path components whose kernels must stay float —
    conv stacks whose [k, in, out] kernels don't fit the per-output-channel
    GEMM scheme (e.g. wav2vec2's feature_extractor / pos_conv_embed).

    ``weight_only=True`` marks every site for w8 serving (int8 weights in
    HBM, bf16 GEMM — see ``int8_dense``).  The marker is a leafless ``()``
    entry under the ``"w8"`` key, so it passes through jax.device_put /
    tree.map / scan-slicing untouched (those only see array leaves)."""

    def rec(node, path):
        if isinstance(node, dict):
            if "kernel" in node and not any(s in path for s in skip_subtrees):
                out = {"kernel_q": quantize_weight(node["kernel"])}
                if "bias" in node:
                    out["bias"] = jnp.asarray(node["bias"], jnp.float32)
                if weight_only:
                    out["w8"] = ()
                return out
            return {k: rec(v, path + (k,)) for k, v in node.items()}
        return jnp.asarray(node, jnp.float32)

    return rec(params, ())


def quantize_m2fnet(params: Any, weight_only: bool = False) -> Any:
    """Quantize a trained M2FNet param tree (from Solver / torch_import) for
    the int8 serving engine. One-time host/device transform."""
    return quantize_tree(params, weight_only=weight_only)


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
    return int8_dense(x, node["kernel_q"], node.get("bias"), node.get("act_scale"),
                      weight_only="w8" in node)


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


def _dense_site_paths(qparams: Any) -> dict[int, tuple]:
    """Map id(dense node) -> tree path for every quantized GEMM site."""
    out: dict[int, tuple] = {}

    def rec(node, path):
        if isinstance(node, dict):
            if "kernel_q" in node:
                out[id(node)] = path
                return
            for k, v in node.items():
                rec(v, path + (k,))

    rec(qparams, ())
    return out


class calibration:
    """Context manager for post-training static activation calibration.

    Run representative batches through an int8 engine's (un-jitted) forward
    inside this context; every quantized GEMM site records the largest
    activation magnitude it sees.  ``apply_calibration`` then bakes the
    resulting per-tensor scales into the qparams tree, after which serving
    skips the per-row abs-max reduction and quantization is deterministic::

        qp = quantize_m2fnet(params)
        with calibration(qp) as sink:
            for b in calib_batches:          # EAGER — do not jit this pass
                server.apply(qp, b["text"], b["audio"], b["padding_mask"])
        qp = apply_calibration(qp, sink)     # static scales baked in
        predict = jax.jit(server.apply)      # jit as usual

    Passing the qparams tree re-keys the sink by *tree path* on exit, so
    ``apply_calibration`` matches sites structurally — robust to subtrees
    being rebuilt (jax.tree.map / device_put) between calibrate and apply.
    Without the tree, sites are keyed by node identity and the exact same
    tree object must be passed to ``apply_calibration``.
    """

    def __init__(self, tree: Any = None):
        self.sink: dict = {}
        self._id_to_path = None if tree is None else _dense_site_paths(tree)

    def __enter__(self):
        global _CALIBRATION_SINK
        assert _CALIBRATION_SINK is None, "nested calibration contexts"
        _CALIBRATION_SINK = self.sink
        return self.sink

    def __exit__(self, *exc):
        global _CALIBRATION_SINK
        _CALIBRATION_SINK = None
        if self._id_to_path is not None:
            # re-key by tree path (in place: callers hold the sink dict)
            items = list(self.sink.items())
            self.sink.clear()
            for key, amax in items:
                if isinstance(key, tuple):  # scan-stacked site: (id, layer)
                    node_id, layer = key
                    path = self._id_to_path.get(node_id)
                    self.sink[key if path is None else (path, layer)] = amax
                else:
                    path = self._id_to_path.get(key)
                    self.sink[key if path is None else path] = amax
        return False


def _sink_site(key):
    """The per-node site of a sink key: strip the layer index off a
    scan-stacked key ((id|path, layer)); plain keys (id or path tuple of
    str path components) pass through."""
    if isinstance(key, tuple) and len(key) == 2 and isinstance(key[1], int) \
            and isinstance(key[0], (int, tuple)):
        return key[0]
    return key


def apply_calibration(qparams: Any, sink: dict, headroom: float = 1.0,
                      allow_partial: bool = False) -> Any:
    """Bake observed activation abs-max values into the qparams tree as
    static per-tensor ``act_scale`` entries (scale = headroom * amax / 127).
    Scan-stacked dense nodes (sites keyed (site, layer)) get an [L] array
    that the production lax.scan slices per layer.

    Sites are matched by tree path when the calibration context was given
    the tree (``calibration(qp)`` — robust to rebuilt subtrees), else by
    node identity (requires the SAME tree object the calibration pass ran
    over; ``jax.device_put`` the tree AFTER applying, not before).  If any
    observed site fails to match — e.g. a subtree rebuilt between an
    identity-keyed calibrate and apply — this raises rather than silently
    serving those sites with dynamic quantization; pass
    ``allow_partial=True`` to accept a partial bake (e.g. when calibrating
    several engines into one sink)."""

    matched_sites: set = set()
    partial_sites: list = []  # scan-stacked nodes with SOME layers observed

    def scale_of(amax: float):
        return max(headroom * amax / 127.0, 1e-12)

    def lookup(node, path, layer=None):
        for site in (path, id(node)):
            key = site if layer is None else (site, layer)
            if key in sink:
                return site, sink[key]
        return None, None

    def rec(node, path):
        if isinstance(node, dict):
            if "kernel_q" in node:
                if node["kernel_q"]["q"].ndim == 3:  # scan-stacked [L, K, N]
                    n_layers = node["kernel_q"]["q"].shape[0]
                    hits = [lookup(node, path, layer=i) for i in range(n_layers)]
                    per_layer = [a for _, a in hits]
                    matched_sites.update(s for s, _ in hits if s is not None)
                    if any(a is None or a <= 0.0 for a in per_layer):
                        # a half-observed stack cannot bake (the [L] array
                        # needs every layer) — that is a partial match, not
                        # a clean miss; surface it rather than silently
                        # leaving the whole site on dynamic quantization
                        if any(a is not None and a > 0.0 for a in per_layer):
                            partial_sites.append(path)
                        return node
                    out = dict(node)
                    out["act_scale"] = jnp.asarray([scale_of(a) for a in per_layer], jnp.float32)
                    return out
                site, amax = lookup(node, path)
                if site is not None:
                    matched_sites.add(site)
                if amax is None or amax <= 0.0:
                    return node
                out = dict(node)
                out["act_scale"] = jnp.float32(scale_of(amax))
                return out
            return {k: rec(v, path + (k,)) for k, v in node.items()}
        return node

    out = rec(qparams, ())
    if partial_sites and not allow_partial:
        raise ValueError(
            f"scan-stacked site(s) {sorted(map(str, partial_sites))[:3]} were "
            "calibrated for only a subset of their layers — the whole stack "
            "stays on dynamic quantization. Run the calibration pass over "
            "every layer (a full forward), or pass allow_partial=True"
        )
    observed_sites = {_sink_site(k) for k in sink}
    unmatched = observed_sites - matched_sites
    if unmatched and not allow_partial:
        raise ValueError(
            f"{len(unmatched)}/{len(observed_sites)} calibrated sites did not match "
            f"this tree (e.g. {sorted(map(str, unmatched))[:3]}) — identity-keyed "
            "sites break when the tree is rebuilt between calibrate and apply "
            "(pass the tree to calibration(qp) for path-keyed matching, or "
            "device_put AFTER applying); allow_partial=True accepts a partial bake"
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
