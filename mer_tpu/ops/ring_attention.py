"""Ring attention over the sequence-parallel (sp) mesh axis.

The reference never needs sequence parallelism (dialogues <=33 utterances,
audio <=1001 frames — SURVEY.md §5), but the long-audio streaming axis is
where this framework grows past a single chip's HBM.  This op turns the
`sequence_sharding` hook (parallel/mesh.py) from "let GSPMD all-gather K/V"
into a real context-parallel algorithm:

- Q, K, V arrive sharded [B, H, S/sp, Dh] along the sp axis (one shard per
  device, `jax.shard_map`).
- Each of the sp steps computes the local Q block against the currently
  held K/V block with a fused online-softmax update (the same rescaling
  algebra as the streaming flash kernel, ops/flash_attention.py), then
  rotates K/V (and the key-padding bias) one hop around the ring with
  `jax.lax.ppermute` — riding ICI neighbor links instead of an all-gather.
- Communication overlaps compute: the ppermute for step t+1 is issued
  before step t's block math (double-buffered ring, the scaling-book
  pattern).

Peak memory per device is O(S/sp) for K/V instead of O(S) after an
all-gather; comm volume equals one full K/V rotation (same bytes as an
all-gather, but pipelined and overlapped).

Numerics: exact online-softmax — bitwise-stable rescaling, tested equal to
full attention on the virtual 8-device CPU mesh
(tests/test_ring_attention.py).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_NEG_INF = -1e30


def _block_update(q, k, v, bias, m_prev, l_prev, acc):
    """One online-softmax block update (flash algebra).

    q: [B, H, Sq, Dh]; k/v: [B, H, Bk, Dh]; bias: [B, Bk] additive key bias.
    m/l: [B, H, Sq, 1]; acc: [B, H, Sq, Dh].
    """
    scale = 1.0 / math.sqrt(q.shape[-1])
    s = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k).astype(jnp.float32)
    s = s + bias[:, None, None, :]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m_prev - m_new)
    l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc_new = acc * alpha + jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v).astype(jnp.float32)
    return m_new, l_new, acc_new


def _ring_body(q, k, v, bias, axis_name: str):
    """Per-shard ring attention body (runs inside shard_map)."""
    sp = jax.lax.psum(1, axis_name)
    b, h, sq, dh = q.shape

    m = jnp.full((b, h, sq, 1), _NEG_INF, jnp.float32)
    l = jnp.zeros((b, h, sq, 1), jnp.float32)
    acc = jnp.zeros((b, h, sq, dh), jnp.float32)

    perm = [(i, (i + 1) % sp) for i in range(sp)]

    def step(t, carry):
        k_t, v_t, bias_t, m_t, l_t, acc_t = carry
        # issue the rotation for the NEXT step first so the collective
        # overlaps this step's block math (skipped on the last step)
        rotate = t < sp - 1
        k_nxt, v_nxt, bias_nxt = jax.lax.cond(
            rotate,
            lambda ops: tuple(jax.lax.ppermute(o, axis_name, perm) for o in ops),
            lambda ops: ops,
            (k_t, v_t, bias_t),
        )
        m_t, l_t, acc_t = _block_update(q, k_t, v_t, bias_t, m_t, l_t, acc_t)
        return k_nxt, v_nxt, bias_nxt, m_t, l_t, acc_t

    _, _, _, m, l, acc = jax.lax.fori_loop(0, sp, step, (k, v, bias, m, l, acc))
    return (acc / jnp.maximum(l, 1e-30)).astype(q.dtype)


def _ring_body_kernel(q, k, v, bias, axis_name: str, interpret: bool):
    """Ring body with the Pallas streaming kernel doing each local block
    (ROADMAP round-2 item: kernel *inside* the shard_map ring).  Each step
    runs flash_attention_with_lse on (q, K_t, V_t) — fused scores/softmax/PV
    on the MXU, no [Sq, Bk] HBM tensor — and the (out, lse) pairs merge
    across ring steps with exact logsumexp weighting:

        lse'  = logaddexp(lse, lse_t)
        o'    = o * e^(lse - lse') + o_t * e^(lse_t - lse')

    Backward is the fused/tiled Pallas backward per block (the lse cotangent
    from the merge rides the kernels' delta term), with autodiff handling the
    merge + ppermute reversal — so a ring training step never materializes
    probabilities in HBM either direction."""
    from mer_tpu.ops.flash_attention import flash_attention_with_lse

    sp = jax.lax.psum(1, axis_name)
    b, h, sq, dh = q.shape

    o = jnp.zeros((b, h, sq, dh), jnp.float32)
    lse = jnp.full((b, h, sq), _NEG_INF, jnp.float32)

    perm = [(i, (i + 1) % sp) for i in range(sp)]

    def step(t, carry):
        k_t, v_t, bias_t, o_t, lse_t = carry
        rotate = t < sp - 1
        k_nxt, v_nxt, bias_nxt = jax.lax.cond(
            rotate,
            lambda ops: tuple(jax.lax.ppermute(o_, axis_name, perm) for o_ in ops),
            lambda ops: ops,
            (k_t, v_t, bias_t),
        )
        blk_o, blk_lse = flash_attention_with_lse(q, k_t, v_t, bias_t, interpret)
        lse_new = jnp.logaddexp(lse_t, blk_lse)
        w_prev = jnp.exp(lse_t - lse_new)[..., None]
        w_blk = jnp.exp(blk_lse - lse_new)[..., None]
        o_new = o_t * w_prev + blk_o.astype(jnp.float32) * w_blk
        return k_nxt, v_nxt, bias_nxt, o_new, lse_new

    _, _, _, o, lse = jax.lax.fori_loop(0, sp, step, (k, v, bias, o, lse))
    return o.astype(q.dtype)


def ring_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    mesh: Mesh,
    key_padding_mask: jnp.ndarray | None = None,
    axis_name: str = "sp",
    use_kernel: bool | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Context-parallel attention: [B, H, S, Dh] with S sharded over ``sp``.

    Args:
        q, k, v: [B, H, S, Dh]; S must divide the sp axis size. Inputs may be
            replicated or already sp-sharded — shard_map partitions them.
        mesh: mesh containing ``axis_name``.
        key_padding_mask: optional [B, S] bool, True = ignore key (torch
            convention, reference src/model.py:14).
        use_kernel: run each local block through the Pallas streaming kernel
            instead of jnp block math. Default (None): the jnp block body —
            the kernel ring is exactness-tested only in interpret mode on
            CPU meshes (this machine has a single TPU chip, so the compiled
            multi-chip kernel path has never executed); opt in explicitly or
            via MER_TPU_RING_KERNEL=1 once validated on a real pod
            (ROADMAP §multi-host bring-up). ``interpret=True`` lets the
            kernel path run on CPU meshes (tests).

    Returns:
        [B, H, S, Dh], sharded like q.
    """
    b, h, s, dh = q.shape
    sp = mesh.shape[axis_name]
    if s % sp != 0:
        raise ValueError(f"sequence length {s} must divide sp={sp}")
    if key_padding_mask is None:
        bias = jnp.zeros((b, s), jnp.float32)
    else:
        bias = jnp.where(key_padding_mask, _NEG_INF, 0.0).astype(jnp.float32)

    if use_kernel is None:
        import os

        use_kernel = os.environ.get("MER_TPU_RING_KERNEL") == "1"
    seq = P(None, None, axis_name, None)
    if use_kernel:
        body = functools.partial(_ring_body_kernel, axis_name=axis_name, interpret=interpret)
    else:
        body = functools.partial(_ring_body, axis_name=axis_name)
    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(seq, seq, seq, P(None, axis_name)),
        out_specs=seq,
        check_vma=False,
    )
    return fn(q, k, v, bias)


def sequence_parallel_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    mesh: Mesh | None = None,
    key_padding_mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Dispatch: ring attention when a mesh with sp>1 is supplied, otherwise
    the single-device fused/XLA path (ops/attention.py)."""
    if mesh is not None and "sp" in mesh.axis_names and mesh.shape["sp"] > 1:
        return ring_attention(q, k, v, mesh=mesh, key_padding_mask=key_padding_mask)
    from mer_tpu.ops.attention import dot_product_attention

    return dot_product_attention(q, k, v, key_padding_mask=key_padding_mask)
