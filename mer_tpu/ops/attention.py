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
        use_pallas = _should_use_pallas(q, k, dropout_rate, deterministic)
    if use_pallas:
        from mer_tpu.ops.flash_attention import flash_attention

        if dropout_rate > 0.0 and not deterministic:
            if dropout_rng is None:
                raise ValueError("dropout_rng required when dropout is active")
            # in-kernel dropout: the TPU hardware PRNG generates the keep
            # mask per tile from this seed (and regenerates it in the
            # backward) — no [B, H, Sq, Sk] mask/probability HBM traffic.
            # Stream identity is not behavior contract (utils/rng.py).
            seed = jax.random.randint(
                dropout_rng, (2,), -(2 ** 31), 2 ** 31 - 1, dtype=jnp.int32)
            return flash_attention(
                q, k, v, key_padding_mask=key_padding_mask,
                dropout_rate=float(dropout_rate), dropout_seed=seed)
        return flash_attention(q, k, v, key_padding_mask=key_padding_mask)

    return _attention_reference(
        q, k, v,
        key_padding_mask=key_padding_mask,
        dropout_rate=dropout_rate,
        dropout_rng=dropout_rng,
        deterministic=deterministic,
    )


def _should_use_pallas(q: jnp.ndarray, k: jnp.ndarray, dropout_rate: float, deterministic: bool) -> bool:
    # Measured on v5e (f32, dh64, device-chained scan timing,
    # scripts/bench_attention.py, round 3 — adaptive q-blocks, bh-blocked
    # small-S grid, fused/tiled backward kernels). PRODUCTION shapes first —
    # the exact shapes the benched pipelines run (RoBERTa context windows at
    # batch 32 land in the 64/128/256 buckets, wav2vec2 is 499 frames at
    # batch 8):
    #                       XLA fwd | pallas fwd | XLA fwd+bwd | pallas fwd+bwd
    #   B32 s=64:            1.49   |   1.61     |    1.52     |   2.00   -> XLA
    #   B32 s=128:           1.56   |   1.72     |    1.53     |   2.05   -> XLA
    #   B32 s=256:           1.97   |   2.59     |    2.01     |   2.70   -> XLA
    #   B8  s=499 (w2v):     1.64   |   1.77     |    1.83     |   2.09   -> XLA
    #   B8  s=512:           1.55   |   1.65     |    1.87     |   2.08   -> XLA
    #   B8  s=1024:          3.26   |   2.23     |    5.63     |   3.68   -> pallas
    #   B8  s=2048:          8.41   |   3.81     |   18.53     |   7.89   -> pallas
    #   B4  s=4096:         14.91   |   5.41     |   33.44     |  12.36   -> pallas
    #   B2  s=8192:       1335.6(!) |  31.0      |   720.1     |   43.1   -> pallas
    # Below ~512 keys both paths sit near the launch floor and XLA's batched
    # GEMM+softmax fusion wins — the encoders' production attention therefore
    # runs on XLA, and the flash kernels are the LONG-sequence path (the e2e
    # streaming growth axis + ring attention), where XLA's materialized
    # [B,H,S,S] probabilities (6.4 GB at 8192) collapse it.
    # Auto-dispatch: pallas from s>=1024; MER_TPU_FLASH_ATTENTION=1 forces
    # the kernel (s>=128), =0 forces XLA.
    import os

    force = os.environ.get("MER_TPU_FLASH_ATTENTION")
    if force == "0":
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
    if dropout_rate > 0.0 and not deterministic:
        # TRAINING with attention-prob dropout: the XLA path materializes
        # [B, H, Sq, Sk] probabilities AND a same-shaped dropout mask in HBM
        # in both directions — measured r5 (b32 h12 s256 dh64, bf16,
        # scripts/profile_fe_regions.py): XLA 3.03 ms fwd+bwd per layer vs
        # the in-kernel-dropout flash path 0.29 ms (nodrop; dropout adds
        # only the on-chip PRNG). Dispatch to the kernel over its whole
        # supported range (single-pass backward: sk <= 2048). Hardware PRNG
        # -> TPU backend only, which this branch already is.
        from mer_tpu.ops.flash_attention import BWD_FUSED_MAX

        return sq >= 128 and k.shape[-2] <= BWD_FUSED_MAX
    if force == "1":
        return sq >= 128
    return sq >= 1024


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
