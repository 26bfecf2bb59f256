"""RoBERTa encoder + classification head (stage-1a text feature extractor).

The reference fine-tunes HF's torch ``RobertaModel`` with a
``RobertaClassificationHead`` (text/model.py:9-22) and exports [CLS]-token
embeddings (text/embeddings.py:83).  This is the same architecture as a
native Flax implementation (fused attention path shared with the rest of the
framework), with a converter from HF torch checkpoints so reference users
can carry fine-tuned weights over.

Numerics parity notes (verified against transformers torch in tests):
- position ids start at padding_idx+1 and advance only on non-pad tokens
  (RoBERTa's create_position_ids_from_input_ids)
- post-LN encoder blocks, exact (erf) GELU, LayerNorm eps 1e-5
- attention masks keys only (padded queries produce garbage that is never
  read — the head uses token 0, always real, and pooling masks pads)
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from mer_tpu.ops.attention import dot_product_attention


@dataclass(frozen=True)
class RobertaConfig:
    vocab_size: int = 50265
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 514
    type_vocab_size: int = 1
    pad_token_id: int = 1
    layer_norm_eps: float = 1e-5
    hidden_dropout: float = 0.1
    attention_dropout: float = 0.1
    num_labels: int = 7

    @classmethod
    def base(cls) -> "RobertaConfig":
        return cls()

    @classmethod
    def large(cls) -> "RobertaConfig":
        return cls(hidden_size=1024, num_hidden_layers=24, num_attention_heads=16, intermediate_size=4096)


def create_position_ids(input_ids: jnp.ndarray, pad_token_id: int) -> jnp.ndarray:
    """RoBERTa position ids: cumsum over non-pad positions, offset by pad id."""
    mask = (input_ids != pad_token_id).astype(jnp.int32)
    incremental = jnp.cumsum(mask, axis=1) * mask
    return incremental + pad_token_id


class RobertaSelfAttention(nn.Module):
    cfg: RobertaConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden, key_padding_mask, deterministic=True):
        c = self.cfg
        head_dim = c.hidden_size // c.num_attention_heads
        b, s, _ = hidden.shape
        dense = lambda name: nn.Dense(c.hidden_size, dtype=self.dtype, name=name)

        q = dense("query")(hidden).reshape(b, s, c.num_attention_heads, head_dim).transpose(0, 2, 1, 3)
        k = dense("key")(hidden).reshape(b, s, c.num_attention_heads, head_dim).transpose(0, 2, 1, 3)
        v = dense("value")(hidden).reshape(b, s, c.num_attention_heads, head_dim).transpose(0, 2, 1, 3)

        rng = self.make_rng("dropout") if (not deterministic and c.attention_dropout > 0) else None
        out = dot_product_attention(
            q, k, v, key_padding_mask=key_padding_mask,
            dropout_rate=c.attention_dropout, dropout_rng=rng, deterministic=deterministic,
        )
        return out.transpose(0, 2, 1, 3).reshape(b, s, c.hidden_size)


class RobertaLayer(nn.Module):
    cfg: RobertaConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden, key_padding_mask, deterministic=True):
        c = self.cfg
        ln = lambda name: nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype, name=name)
        drop = lambda x: nn.Dropout(c.hidden_dropout, deterministic=deterministic)(x)

        attn = RobertaSelfAttention(c, dtype=self.dtype, name="attention")(
            hidden, key_padding_mask, deterministic
        )
        attn = nn.Dense(c.hidden_size, dtype=self.dtype, name="attention_output")(attn)
        hidden = ln("attention_layernorm")(hidden + drop(attn))

        inter = nn.Dense(c.intermediate_size, dtype=self.dtype, name="intermediate")(hidden)
        inter = nn.gelu(inter, approximate=False)
        out = nn.Dense(c.hidden_size, dtype=self.dtype, name="output")(inter)
        hidden = ln("output_layernorm")(hidden + drop(out))
        return hidden


class _ScanRobertaLayer(nn.Module):
    cfg: RobertaConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, carry, key_padding_mask, deterministic):
        out = RobertaLayer(self.cfg, dtype=self.dtype, name="layer")(carry, key_padding_mask, deterministic)
        return out, None


class RobertaModel(nn.Module):
    """Encoder without pooler (the reference disables pooling, text/model.py:16).

    ``scan_layers=True`` compiles one layer and lax.scans it over stacked
    params — same numerics, ~L-times smaller XLA program."""

    cfg: RobertaConfig
    dtype: jnp.dtype = jnp.float32
    scan_layers: bool = False
    remat: bool = False
    remat_policy: str | None = None  # None/full | dots | dots_no_batch (utils/remat.py)

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray, attention_mask: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        c = self.cfg
        word = nn.Embed(c.vocab_size, c.hidden_size, dtype=self.dtype, name="word_embeddings")(input_ids)
        pos_ids = create_position_ids(input_ids, c.pad_token_id)
        pos = nn.Embed(c.max_position_embeddings, c.hidden_size, dtype=self.dtype, name="position_embeddings")(pos_ids)
        tok = nn.Embed(c.type_vocab_size, c.hidden_size, dtype=self.dtype, name="token_type_embeddings")(
            jnp.zeros_like(input_ids)
        )
        hidden = word + pos + tok
        hidden = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype, name="embeddings_layernorm")(hidden)
        hidden = nn.Dropout(c.hidden_dropout, deterministic=deterministic)(hidden)

        key_padding_mask = attention_mask == 0  # True = ignore (torch convention)
        hidden = hidden.astype(self.dtype)  # scan carry type must be stable
        if self.scan_layers:
            layer_cls = _ScanRobertaLayer
            if self.remat:
                from mer_tpu.utils.remat import resolve_remat_policy

                layer_cls = nn.remat(layer_cls, static_argnums=(3,),
                                     policy=resolve_remat_policy(self.remat_policy))
            scanned = nn.scan(
                layer_cls,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                length=c.num_hidden_layers,
                in_axes=(nn.broadcast, nn.broadcast),
            )(c, dtype=self.dtype, name="layers_scan")
            hidden, _ = scanned(hidden, key_padding_mask, deterministic)
        else:
            layer_cls = RobertaLayer
            if self.remat:
                from mer_tpu.utils.remat import resolve_remat_policy

                layer_cls = nn.remat(RobertaLayer, static_argnums=(3,),
                                     policy=resolve_remat_policy(self.remat_policy))
            for i in range(c.num_hidden_layers):
                hidden = layer_cls(c, dtype=self.dtype, name=f"layer_{i}")(
                    hidden, key_padding_mask, deterministic
                )
        return hidden  # last_hidden_state


class RobertaClassificationHead(nn.Module):
    """HF RobertaClassificationHead parity: CLS -> dropout -> dense -> tanh
    -> dropout -> out_proj."""

    cfg: RobertaConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        c = self.cfg
        x = hidden[:, 0, :]  # <s> ([CLS]) token
        x = nn.Dropout(c.hidden_dropout, deterministic=deterministic)(x)
        x = nn.Dense(c.hidden_size, dtype=self.dtype, name="dense")(x)
        x = jnp.tanh(x)
        x = nn.Dropout(c.hidden_dropout, deterministic=deterministic)(x)
        return nn.Dense(c.num_labels, dtype=self.dtype, name="out_proj")(x)


class TextERC(nn.Module):
    """RoBERTa + classification head — the stage-1a fine-tuning model
    (reference text/model.py:9-22).  ``freeze()`` semantics are realized in
    the solver via parameter partitioning ('roberta' vs 'classifier_head'
    subtrees), not module state."""

    cfg: RobertaConfig
    dtype: jnp.dtype = jnp.float32
    scan_layers: bool = False
    remat: bool = False  # rematerialize each layer in the backward (memory<->FLOPs)
    remat_policy: str | None = None

    def setup(self):
        self.roberta = RobertaModel(
            self.cfg, dtype=self.dtype, scan_layers=self.scan_layers, remat=self.remat,
            remat_policy=self.remat_policy,
        )
        self.classifier_head = RobertaClassificationHead(self.cfg, dtype=self.dtype)

    def __call__(self, input_ids, attention_mask, deterministic: bool = True):
        hidden = self.roberta(input_ids, attention_mask, deterministic)
        return self.classifier_head(hidden, deterministic)

    def embed(self, input_ids, attention_mask, deterministic: bool = True):
        """[CLS] embeddings for export (reference text/embeddings.py:83)."""
        hidden = self.roberta(input_ids, attention_mask, deterministic)
        return hidden[:, 0, :]


# ---------------------------------------------------------------------------
# HF torch -> flax conversion
# ---------------------------------------------------------------------------

def _np(t) -> np.ndarray:
    return t.detach().cpu().numpy().astype(np.float32)


def convert_hf_roberta(sd: dict, cfg: RobertaConfig, prefix: str = "", scan_layers: bool = False) -> dict:
    """Convert an HF torch RobertaModel state_dict to RobertaModel params.

    ``prefix`` handles nesting (e.g. 'roberta.' inside a TextERC checkpoint,
    cf. the reference's extract_roberta_state_dict, text/embeddings.py:14-22).
    ``scan_layers`` stacks per-layer params on a leading axis for the
    nn.scan-based encoder.
    """
    g = lambda k: _np(sd[prefix + k])
    lin = lambda k: {"kernel": g(f"{k}.weight").T, "bias": g(f"{k}.bias")}
    lnp = lambda k: {"scale": g(f"{k}.weight"), "bias": g(f"{k}.bias")}

    params = {
        "word_embeddings": {"embedding": g("embeddings.word_embeddings.weight")},
        "position_embeddings": {"embedding": g("embeddings.position_embeddings.weight")},
        "token_type_embeddings": {"embedding": g("embeddings.token_type_embeddings.weight")},
        "embeddings_layernorm": lnp("embeddings.LayerNorm"),
    }
    per_layer = []
    for i in range(cfg.num_hidden_layers):
        p = f"encoder.layer.{i}."
        per_layer.append(
            {
                "attention": {
                    "query": lin(p + "attention.self.query"),
                    "key": lin(p + "attention.self.key"),
                    "value": lin(p + "attention.self.value"),
                },
                "attention_output": lin(p + "attention.output.dense"),
                "attention_layernorm": lnp(p + "attention.output.LayerNorm"),
                "intermediate": lin(p + "intermediate.dense"),
                "output": lin(p + "output.dense"),
                "output_layernorm": lnp(p + "output.LayerNorm"),
            }
        )
    if scan_layers:
        from mer_tpu.models.torch_import import stack_layers

        params["layers_scan"] = {"layer": stack_layers(per_layer)}
    else:
        for i, lp in enumerate(per_layer):
            params[f"layer_{i}"] = lp
    return params


def convert_hf_classification_head(sd: dict, prefix: str = "classifier.") -> dict:
    g = lambda k: _np(sd[prefix + k])
    return {
        "dense": {"kernel": g("dense.weight").T, "bias": g("dense.bias")},
        "out_proj": {"kernel": g("out_proj.weight").T, "bias": g("out_proj.bias")},
    }
