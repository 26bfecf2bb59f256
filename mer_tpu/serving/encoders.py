"""int8 serving engines for the stage-1 feature-extractor backbones.

Embedding export is the bandwidth-bound serving workload of stage 1: the
reference iterates whole splits through RoBERTa ([CLS] pooling,
text/embeddings.py:69-93) and wav2vec2 (masked mean pooling,
audio_wav2vec2/embeddings.py:68-94) at inference batch sizes, re-reading
~125M / ~95M params per step.  Same recipe as the M2FNet engine (quant.py):
per-output-channel int8 kernels + dynamic per-row activation quantization,
int8 x int8 -> int32 MXU GEMMs — 4x less weight HBM traffic than f32.

What stays float: embeddings tables (gathers, not GEMMs), LayerNorms, and
the wav2vec2 conv frontend (its [k, in, out] kernels don't fit the
per-output-channel GEMM scheme and the convs are compute-, not
weight-bound); attention score/PV math runs bf16 with f32 softmax.

These are functional engines over ``quantize_roberta`` / ``quantize_wav2vec2``
trees, mirroring models/roberta.py and models/wav2vec2.py exactly (both the
unrolled ``layer_{i}`` and scan-stacked ``layers_scan`` layouts); error
envelopes are pinned in tests/test_serving_quant.py.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from mer_tpu.serving.quant import _attention, _dense, _layer_norm, quantize_tree, scan_stacked


def quantize_roberta(params: Any, weight_only: bool = False) -> Any:
    """Quantize a TextERC (or bare RobertaModel) param tree."""
    return quantize_tree(params, weight_only=weight_only)


def quantize_wav2vec2(params: Any, weight_only: bool = False) -> Any:
    """Quantize an AudioERC (or bare Wav2Vec2Model) param tree; the conv
    frontend and positional conv stay float."""
    return quantize_tree(params, skip_subtrees=("feature_extractor", "pos_conv_embed"),
                         weight_only=weight_only)


def _gelu(x):
    return jax.nn.gelu(x, approximate=False)


# ---------------------------------------------------------------------------
# RoBERTa
# ---------------------------------------------------------------------------


def _roberta_layer(hidden, p: dict, num_heads: int, eps: float, mask):
    """Post-LN HF Roberta layer (models/roberta.py:83-103) over int8 weights."""
    q = _dense(hidden, p["attention"]["query"])
    k = _dense(hidden, p["attention"]["key"])
    v = _dense(hidden, p["attention"]["value"])
    attn = _attention(q, k, v, num_heads, mask)
    attn = _dense(attn, p["attention_output"])
    hidden = _layer_norm(hidden + attn, p["attention_layernorm"], eps)
    inter = _gelu(_dense(hidden, p["intermediate"]))
    out = _dense(inter, p["output"])
    return _layer_norm(hidden + out, p["output_layernorm"], eps)


class RobertaInt8:
    """int8 serving forward for TextERC: [CLS] embeddings (the export
    contract, reference text/embeddings.py:83) and classifier logits.

    Args:
        model: the TextERC Flax module the params came from (architecture
            hyperparameters are read from its config).
    """

    def __init__(self, model):
        self.cfg = model.cfg

    def _encode(self, p: dict, input_ids, attention_mask):
        from mer_tpu.models.roberta import create_position_ids

        c = self.cfg
        word = p["word_embeddings"]["embedding"][input_ids]
        pos = p["position_embeddings"]["embedding"][create_position_ids(input_ids, c.pad_token_id)]
        tok = p["token_type_embeddings"]["embedding"][jnp.zeros_like(input_ids)]
        hidden = _layer_norm(word + pos + tok, p["embeddings_layernorm"], c.layer_norm_eps)

        mask = attention_mask == 0  # True = ignore (torch convention)
        if "layers_scan" in p:
            hidden = scan_stacked(
                lambda carry, lp: _roberta_layer(carry, lp, c.num_attention_heads, c.layer_norm_eps, mask),
                hidden, p["layers_scan"]["layer"],
            )
        else:
            for i in range(c.num_hidden_layers):
                hidden = _roberta_layer(hidden, p[f"layer_{i}"], c.num_attention_heads, c.layer_norm_eps, mask)
        return hidden

    def embed(self, qparams: Any, input_ids, attention_mask) -> jnp.ndarray:
        """[N, H] [CLS]-token embeddings (reference text/embeddings.py:83)."""
        return self._encode(qparams["roberta"], input_ids, attention_mask)[:, 0, :]

    def apply(self, qparams: Any, input_ids, attention_mask) -> jnp.ndarray:
        """[N, num_labels] classifier logits (TextERC.__call__ parity)."""
        cls = self.embed(qparams, input_ids, attention_mask)
        head = qparams["classifier_head"]
        x = jnp.tanh(_dense(cls, head["dense"]))
        return _dense(x, head["out_proj"])


# ---------------------------------------------------------------------------
# wav2vec2
# ---------------------------------------------------------------------------


def _conv1d(x, kernel, strides: int, padding, groups: int = 1):
    """lax conv over [B, L, C] with a Flax-layout [k, in/groups, out] kernel.
    bf16 inputs/kernels on the MXU with f32 accumulation (the serving
    engine's conv frontend is compute-bound; bf16 doubles MXU rate)."""
    return jax.lax.conv_general_dilated(
        x.astype(jnp.bfloat16), kernel.astype(jnp.bfloat16),
        window_strides=(strides,), padding=padding,
        dimension_numbers=("NWC", "WIO", "NWC"), feature_group_count=groups,
        preferred_element_type=jnp.float32,
    )


def _w2v_layer(hidden, p: dict, num_heads: int, eps: float, mask):
    """Post-LN wav2vec2 encoder layer (models/wav2vec2.py:99-128)."""
    q = _dense(hidden, p["q_proj"])
    k = _dense(hidden, p["k_proj"])
    v = _dense(hidden, p["v_proj"])
    attn = _dense(_attention(q, k, v, num_heads, mask), p["out_proj"])
    hidden = _layer_norm(hidden + attn, p["layer_norm"], eps)
    ff = _gelu(_dense(hidden, p["intermediate"]))
    ff = _dense(ff, p["output"])
    return _layer_norm(hidden + ff, p["final_layer_norm"], eps)


class Wav2Vec2Int8:
    """int8 serving forward for AudioERC: masked mean-pooled embeddings (the
    export contract, reference audio_wav2vec2/embeddings.py:85) and
    classifier logits.  The conv frontend runs float (see module docstring).
    """

    def __init__(self, model):
        self.cfg = model.cfg

    def _frames(self, p: dict, waveforms):
        c = self.cfg
        x = waveforms[:, :, None].astype(jnp.float32)
        fe = p["feature_extractor"]
        for i, (k, s) in enumerate(zip(c.conv_kernel, c.conv_stride)):
            x = _conv1d(x, fe[f"conv_{i}"]["kernel"], s, "VALID")
            if i == 0:
                # GroupNorm(num_groups=C): per-channel norm over time
                mu = jnp.mean(x, axis=1, keepdims=True)
                var = jnp.mean(jnp.square(x - mu), axis=1, keepdims=True)
                gn = fe["group_norm"]
                x = (x - mu) * jax.lax.rsqrt(var + c.layer_norm_eps) * gn["scale"] + gn["bias"]
            x = _gelu(x)
        return x

    def _encode(self, p: dict, waveforms, lengths):
        c = self.cfg
        feats = self._frames(p, waveforms)
        out_lengths = c.feat_extract_output_lengths(lengths.astype(jnp.int32))
        t = feats.shape[1]
        frame_valid = jnp.arange(t)[None, :] < out_lengths[:, None]

        x = _layer_norm(feats, p["feature_projection_norm"], c.layer_norm_eps)
        x = _dense(x, p["feature_projection"])
        x = jnp.where(frame_valid[..., None], x, 0.0)

        pc = p["pos_conv_embed"]["conv"]
        k = c.num_conv_pos_embeddings
        pos = _conv1d(x, pc["kernel"], 1, [(k // 2, k // 2)],
                      groups=c.num_conv_pos_embedding_groups) + pc["bias"]
        if k % 2 == 0:
            pos = pos[:, :-1, :]
        x = x + _gelu(pos)
        x = _layer_norm(x, p["encoder_layer_norm"], c.layer_norm_eps)

        mask = ~frame_valid
        if "layers_scan" in p:
            x = scan_stacked(
                lambda carry, lp: _w2v_layer(carry, lp, c.num_attention_heads, c.layer_norm_eps, mask),
                x, p["layers_scan"]["layer"],
            )
        else:
            for i in range(c.num_hidden_layers):
                x = _w2v_layer(x, p[f"layer_{i}"], c.num_attention_heads, c.layer_norm_eps, mask)
        return x, out_lengths

    def embed(self, qparams: Any, waveforms, lengths) -> jnp.ndarray:
        """[N, H] masked mean-pooled frame embeddings
        (reference audio_wav2vec2/embeddings.py:85)."""
        hidden, out_lengths = self._encode(qparams["wav2vec2"], waveforms, lengths)
        t = hidden.shape[1]
        valid = (jnp.arange(t)[None, :] < out_lengths[:, None])[..., None]
        summed = jnp.sum(jnp.where(valid, hidden, 0.0), axis=1)
        return summed / jnp.maximum(out_lengths[:, None], 1)

    def apply(self, qparams: Any, waveforms, lengths) -> jnp.ndarray:
        """[N, num_labels] classifier logits (AudioERC.__call__ parity)."""
        pooled = self.embed(qparams, waveforms, lengths)
        x = jnp.tanh(_dense(pooled, qparams["head_dense"]))
        return _dense(x, qparams["head_out"])
