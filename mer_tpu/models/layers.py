"""Transformer building blocks with torch-module semantics, in Flax.

The fusion model (reference src/model.py) is built from
``nn.MultiheadAttention`` and post-LN ``nn.TransformerEncoderLayer`` /
``nn.TransformerEncoder``.  These Flax modules reproduce those semantics
exactly (verified against torch in tests/test_layers.py):

- MultiheadAttention: packed-equivalent q/k/v projections + out projection,
  dropout on attention probabilities, key_padding_mask True = ignore.
- TransformerEncoderLayer: post-LN residual blocks,
  ``x = LN1(x + Drop(SelfAttn(x)))``, ``x = LN2(x + Drop(FFN(x)))``,
  FFN = Linear(d, d_ff) -> ReLU -> Drop -> Linear(d_ff, d), d_ff = 2048
  (torch default, the reference never overrides it).
- TransformerEncoder: N stacked layers + a final LayerNorm (the reference
  passes ``norm=LayerNorm(d)`` at src/model.py:62,74).

Everything is batch-first [B, S, D]; the reference's seq-first permutes
(src/model.py:105,108) are a torch-layout artifact with no numeric effect.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp
from flax import linen as nn

from mer_tpu.ops.attention import dot_product_attention


class MultiheadAttention(nn.Module):
    """torch.nn.MultiheadAttention parity (batch_first)."""

    embed_dim: int
    num_heads: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,
        key: jnp.ndarray,
        value: jnp.ndarray,
        key_padding_mask: jnp.ndarray | None = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        if self.embed_dim % self.num_heads:
            raise ValueError("embed_dim must be divisible by num_heads")
        head_dim = self.embed_dim // self.num_heads
        dense = lambda name: nn.Dense(
            self.embed_dim, dtype=self.dtype, param_dtype=self.param_dtype, name=name
        )

        b, sq, _ = query.shape
        sk = key.shape[1]

        q = dense("q_proj")(query).reshape(b, sq, self.num_heads, head_dim).transpose(0, 2, 1, 3)
        k = dense("k_proj")(key).reshape(b, sk, self.num_heads, head_dim).transpose(0, 2, 1, 3)
        v = dense("v_proj")(value).reshape(b, sk, self.num_heads, head_dim).transpose(0, 2, 1, 3)

        dropout_rng = None
        if self.dropout > 0.0 and not deterministic:
            dropout_rng = self.make_rng("dropout")

        out = dot_product_attention(
            q, k, v,
            key_padding_mask=key_padding_mask,
            dropout_rate=self.dropout,
            dropout_rng=dropout_rng,
            deterministic=deterministic,
        )
        out = out.transpose(0, 2, 1, 3).reshape(b, sq, self.embed_dim)
        return dense("out_proj")(out)


class TransformerEncoderLayer(nn.Module):
    """torch.nn.TransformerEncoderLayer parity (post-LN, ReLU, d_ff=2048)."""

    d_model: int
    nhead: int
    dim_feedforward: int = 2048
    dropout: float = 0.1
    activation: Callable[[jnp.ndarray], jnp.ndarray] = nn.relu
    layer_norm_eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        src: jnp.ndarray,
        src_key_padding_mask: jnp.ndarray | None = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        ln = lambda name: nn.LayerNorm(
            epsilon=self.layer_norm_eps, dtype=self.dtype, param_dtype=self.param_dtype, name=name
        )
        drop = lambda x: nn.Dropout(self.dropout, deterministic=deterministic)(x)

        attn_out = MultiheadAttention(
            self.d_model, self.nhead, dropout=self.dropout,
            dtype=self.dtype, param_dtype=self.param_dtype, name="self_attn",
        )(src, src, src, key_padding_mask=src_key_padding_mask, deterministic=deterministic)
        x = ln("norm1")(src + drop(attn_out))

        h = nn.Dense(self.dim_feedforward, dtype=self.dtype, param_dtype=self.param_dtype, name="linear1")(x)
        h = drop(self.activation(h))
        h = nn.Dense(self.d_model, dtype=self.dtype, param_dtype=self.param_dtype, name="linear2")(h)
        x = ln("norm2")(x + drop(h))
        return x


class _ScanEncoderLayer(nn.Module):
    """Carry-style wrapper so TransformerEncoderLayer composes with nn.scan."""

    d_model: int
    nhead: int
    dim_feedforward: int
    dropout: float
    layer_norm_eps: float
    dtype: jnp.dtype
    param_dtype: jnp.dtype

    @nn.compact
    def __call__(self, carry, src_key_padding_mask, deterministic):
        out = TransformerEncoderLayer(
            d_model=self.d_model, nhead=self.nhead, dim_feedforward=self.dim_feedforward,
            dropout=self.dropout, layer_norm_eps=self.layer_norm_eps,
            dtype=self.dtype, param_dtype=self.param_dtype, name="layer",
        )(carry, src_key_padding_mask=src_key_padding_mask, deterministic=deterministic)
        return out, None


class TransformerEncoder(nn.Module):
    """torch.nn.TransformerEncoder parity: N layers + optional final LayerNorm.

    ``scan_layers=True`` runs the stack as a lax.scan over one compiled layer
    (params stacked on a leading axis) — numerically identical, but the XLA
    program is ~N times smaller, which matters when compilation is the
    bottleneck (remote-compile TPU environments, large models).
    ``remat=True`` additionally rematerializes each layer in the backward
    pass, trading FLOPs for activation memory.
    """

    d_model: int
    nhead: int
    num_layers: int
    dim_feedforward: int = 2048
    dropout: float = 0.1
    final_norm: bool = True
    layer_norm_eps: float = 1e-5
    scan_layers: bool = False
    remat: bool = False
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        src: jnp.ndarray,
        src_key_padding_mask: jnp.ndarray | None = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        x = src.astype(self.dtype)  # scan carry type must be stable
        common = dict(
            d_model=self.d_model, nhead=self.nhead, dim_feedforward=self.dim_feedforward,
            dropout=self.dropout, layer_norm_eps=self.layer_norm_eps,
            dtype=self.dtype, param_dtype=self.param_dtype,
        )
        if self.scan_layers:
            layer_cls = _ScanEncoderLayer
            if self.remat:
                layer_cls = nn.remat(layer_cls, static_argnums=(3,))
            scanned = nn.scan(
                layer_cls,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                length=self.num_layers,
                in_axes=(nn.broadcast, nn.broadcast),
            )(name="layers_scan", **common)
            x, _ = scanned(x, src_key_padding_mask, deterministic)
        else:
            for i in range(self.num_layers):
                x = TransformerEncoderLayer(name=f"layers_{i}", **common)(
                    x, src_key_padding_mask=src_key_padding_mask, deterministic=deterministic
                )
        if self.final_norm:
            x = nn.LayerNorm(
                epsilon=self.layer_norm_eps, dtype=self.dtype, param_dtype=self.param_dtype, name="norm"
            )(x)
        return x


class MLP(nn.Module):
    """Simple Dense stack used by classifier heads."""

    features: tuple[int, ...]
    activation: Callable[[jnp.ndarray], jnp.ndarray] = nn.relu
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i, f in enumerate(self.features):
            x = nn.Dense(f, dtype=self.dtype, param_dtype=self.param_dtype, name=f"dense_{i}")(x)
            if i < len(self.features) - 1:
                x = self.activation(x)
        return x
