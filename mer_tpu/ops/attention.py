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
    # Measured on v5e (bf16, h8-12, dh64), execution-verified timings:
    #   s=512:   XLA 0.81 ms  | pallas 1.05 ms   -> XLA
    #   s=2048:  XLA 2.19 ms  | pallas 1.95 ms   -> pallas (single-pass)
    #   s=4096:  XLA 5.00 ms  | pallas 3.72 ms   -> pallas (single-pass)
    #   s=8192:  XLA 10.1 ms  | pallas-stream 14.2 ms -> XLA (its own fusion streams)
    # Auto-dispatch uses the kernel only in its measured win zone
    # [2048, 4096]; MER_TPU_FLASH_ATTENTION=1 forces it, =0 forces XLA.
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
    return 2048 <= sq <= 4096


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
