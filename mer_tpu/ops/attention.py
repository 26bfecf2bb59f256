"""Scaled dot-product attention ops.

The reference leans on ``torch.nn.MultiheadAttention`` /
``nn.TransformerEncoder`` (src/model.py:8,61,73) whose masking convention is
``key_padding_mask`` with True = ignore.  Here the core attention math is a
standalone op so that:

- models call one function (`dot_product_attention`) regardless of backend,
- a fused Pallas flash-attention kernel can be swapped in on TPU for the long
  frame/token axes (wav2vec2 ~499 frames, RoBERTa <=512 tokens) while the
  jnp path remains the reference/golden implementation,
- masking semantics live in exactly one place.

Layout is [B, H, S, Dh] inside the op; callers reshape.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

_NEG_INF = -1e30  # large-negative mask bias (safer than -inf for padded rows)


def dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    key_padding_mask: jnp.ndarray | None = None,
    dropout_rate: float = 0.0,
    dropout_rng: jax.Array | None = None,
    deterministic: bool = True,
    use_pallas: bool | None = None,
) -> jnp.ndarray:
    """Multi-head scaled dot-product attention.

    Args:
        q, k, v: [B, H, Sq, Dh], [B, H, Sk, Dh], [B, H, Sk, Dh].
        key_padding_mask: optional [B, Sk] boolean, True = ignore that key
            (torch convention, src/model.py:14,107).
        dropout_rate: attention-probability dropout (torch MHA semantics).
        use_pallas: force/forbid the fused TPU kernel; default auto-selects
            (TPU backend, no dropout, shapes large enough to pay off).

    Returns:
        [B, H, Sq, Dh] attention output.
    """
    if use_pallas is None:
        use_pallas = _should_use_pallas(q, dropout_rate, deterministic)
    if use_pallas:
        from mer_tpu.ops.flash_attention import flash_attention

        return flash_attention(q, k, v, key_padding_mask=key_padding_mask)

    return _attention_reference(
        q, k, v,
        key_padding_mask=key_padding_mask,
        dropout_rate=dropout_rate,
        dropout_rng=dropout_rng,
        deterministic=deterministic,
    )


def _should_use_pallas(q: jnp.ndarray, dropout_rate: float, deterministic: bool) -> bool:
    # Measured on v5e (f32, B8 H12 dh64, device-chained scan timing,
    # scripts/bench_attention.py, round 2 — adaptive q-blocks + fused/tiled
    # backward kernels):
    #            XLA fwd | pallas fwd | XLA fwd+bwd | pallas fwd+bwd
    #   s=512:    1.23   |   1.22     |    1.52     |   1.51    -> tie
    #   s=1024:   2.92   |   2.01     |    5.30     |   2.99    -> pallas
    #   s=2048:   8.11   |   3.54     |   18.15     |   7.38    -> pallas
    #   s=4096:  14.77   |   5.25     |   33.20     |  16.16    -> pallas
    #   s=8192: 1336(!)  |  31.2      |   719.6     |  51.9     -> pallas
    #   (B4 at 4096, B2 at 8192; XLA's unfused path materializes the
    #    [B,H,S,S] probabilities — 6.4 GB at 8192 — hence the collapse.)
    # Auto-dispatch: pallas from s>=512 with no upper bound;
    # MER_TPU_FLASH_ATTENTION=1 forces it, =0 forces XLA.
    import os

    force = os.environ.get("MER_TPU_FLASH_ATTENTION")
    if force == "0":
        return False
    if dropout_rate > 0.0 and not deterministic:
        return False
    try:
        backend = jax.default_backend()
    except RuntimeError:
        return False
    if backend != "tpu":
        return False
    sq, dh = q.shape[-2], q.shape[-1]
    if dh % 8 != 0:
        return False
    if force == "1":
        return sq >= 128
    return sq >= 512


def _attention_reference(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    key_padding_mask: jnp.ndarray | None,
    dropout_rate: float,
    dropout_rng: jax.Array | None,
    deterministic: bool,
) -> jnp.ndarray:
    dh = q.shape[-1]
    scale = 1.0 / math.sqrt(dh)
    # [B, H, Sq, Sk]
    scores = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k)

    if key_padding_mask is not None:
        bias = jnp.where(key_padding_mask[:, None, None, :], _NEG_INF, 0.0).astype(scores.dtype)
        scores = scores + bias

    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)

    if dropout_rate > 0.0 and not deterministic:
        if dropout_rng is None:
            raise ValueError("dropout_rng required when dropout is active")
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, probs.shape)
        probs = jnp.where(keep, probs / (1.0 - dropout_rate), 0.0)

    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)
