"""Fused masked attention kernel (Pallas TPU).

For the frame/token axes of this workload (RoBERTa <=512 tokens, wav2vec2
<=499 frames, mel 1001 frames) the whole K/V row set for one (batch, head)
fits comfortably in VMEM (512 x 128 x f32 = 256 KB), so the kernel computes
one q-block's full attention in a single pass — scores, masked softmax and
the value contraction fused on-chip.  vs. the unfused XLA path this avoids
materializing [B, H, S, S] probabilities in HBM, the dominant memory traffic
of the encoders' attention at these sizes.

Masking semantics match mer_tpu.ops.attention (torch key_padding_mask,
True = ignore).  Inputs are padded to block multiples by the wrapper; padded
*query* rows produce garbage that callers never read (same contract as the
reference's torch modules), padded *key* rows are masked out.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_Q = 128
BLOCK_K = 512          # streaming kernel's K/V tile
STREAM_THRESHOLD = 4096  # above this many keys, stream K/V with online softmax
_NEG_INF = -1e30


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(q_ref, k_ref, v_ref, bias_ref, out_ref, *, scale: float):
    q = q_ref[0]          # [BQ, D]
    k = k_ref[0]          # [S, D]
    v = v_ref[0]          # [S, D]
    bias = bias_ref[0]    # [1, S]

    scores = jax.lax.dot_general(
        q * scale, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [BQ, S]
    scores = scores + bias  # broadcast [1, S]

    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    p = p / denom

    out_ref[0] = jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32).astype(out_ref.dtype)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    key_padding_mask: jnp.ndarray | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """[B, H, Sq, Dh] x [B, H, Sk, Dh]^2 -> [B, H, Sq, Dh], fused on TPU.

    Differentiable: the forward runs the Pallas kernel; the backward
    recomputes attention through the jnp reference implementation (exact
    same math) so jax.grad works without a hand-written backward kernel.
    """
    b, sk = q.shape[0], k.shape[2]
    if key_padding_mask is None:
        key_ignore = jnp.zeros((b, sk), bool)
    else:
        key_ignore = key_padding_mask
    key_bias = jnp.where(key_ignore, _NEG_INF, 0.0).astype(jnp.float32)  # [B, Sk]
    return _flash_core(q, k, v, key_bias, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _flash_core(q, k, v, key_bias, interpret=False):
    return _flash_impl(q, k, v, key_bias, interpret)


def _flash_fwd(q, k, v, key_bias, interpret):
    return _flash_impl(q, k, v, key_bias, interpret), (q, k, v, key_bias)


def _flash_bwd(interpret, residuals, g):
    q, k, v, key_bias = residuals

    def ref(q, k, v, key_bias):
        # reference math in bias form (avoids bool-mask cotangents)
        dh = q.shape[-1]
        scores = jnp.einsum("bhqd,bhkd->bhqk", q * (1.0 / math.sqrt(dh)), k)
        scores = scores + key_bias[:, None, None, :]
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
        return jnp.einsum("bhqk,bhkd->bhqd", probs, v)

    _, vjp = jax.vjp(ref, q, k, v, key_bias)
    dq, dk, dv, dbias = vjp(g)
    return dq, dk, dv, jnp.zeros_like(key_bias)


_flash_core.defvjp(_flash_fwd, _flash_bwd)


def _stream_kernel(q_ref, k_ref, v_ref, bias_ref, out_ref, m_ref, l_ref, acc_ref, *, scale: float):
    """Online-softmax flash attention: one (bh, q-block) accumulates across
    the k-block grid axis; m/l/acc scratch persists across those steps."""
    ki = pl.program_id(2)
    n_k = pl.num_programs(2)

    @pl.when(ki == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]        # [BQ, D]
    kb = k_ref[0]       # [BK, D]
    vb = v_ref[0]       # [BK, D]
    bias = bias_ref[0]  # [1, BK]

    s = jax.lax.dot_general(
        q * scale, kb,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bias  # [BQ, BK]

    m_prev = m_ref[:, :1]                       # [BQ, 1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    p = jnp.exp(s - m_new)                      # [BQ, BK]
    alpha = jnp.exp(m_prev - m_new)             # [BQ, 1]

    l_new = l_ref[:, :1] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc_ref[:] = acc_ref[:] * alpha + jnp.dot(
        p.astype(vb.dtype), vb, preferred_element_type=jnp.float32
    )
    m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
    l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(ki == n_k - 1)
    def _():
        out_ref[0] = (acc_ref[:] / jnp.maximum(l_ref[:, :1], 1e-30)).astype(out_ref.dtype)


def _flash_stream(qp, kp, vp, bias, sq_p, sk_p, dh_p, scale, q_dtype, interpret):
    """Streaming path: K/V visited in BLOCK_K tiles, VMEM holds one tile."""
    bh = qp.shape[0]
    grid = (bh, sq_p // BLOCK_Q, sk_p // BLOCK_K)
    return pl.pallas_call(
        functools.partial(_stream_kernel, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, BLOCK_Q, dh_p), lambda i, j, t: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLOCK_K, dh_p), lambda i, j, t: (i, t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLOCK_K, dh_p), lambda i, j, t: (i, t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, BLOCK_K), lambda i, j, t: (i, 0, t), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, BLOCK_Q, dh_p), lambda i, j, t: (i, j, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, sq_p, dh_p), q_dtype),
        scratch_shapes=[
            pltpu.VMEM((BLOCK_Q, 128), jnp.float32),   # running max m
            pltpu.VMEM((BLOCK_Q, 128), jnp.float32),   # running denom l
            pltpu.VMEM((BLOCK_Q, dh_p), jnp.float32),  # output accumulator
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * bh * sq_p * sk_p * dh_p * 2,
            bytes_accessed=(qp.size + kp.size + vp.size) * 4,
            transcendentals=bh * sq_p * sk_p,
        ),
        interpret=interpret,
    )(qp, kp, vp, bias)


def _flash_impl(q, k, v, key_bias, interpret=False, force_stream: bool | None = None) -> jnp.ndarray:
    b, h, sq, dh = q.shape
    sk = k.shape[2]
    scale = 1.0 / math.sqrt(dh)

    stream = force_stream if force_stream is not None else sk > STREAM_THRESHOLD
    sq_p = _round_up(sq, BLOCK_Q)
    sk_p = _round_up(sk, BLOCK_K if stream else 128)
    dh_p = _round_up(dh, 128)

    qp = jnp.pad(q, ((0, 0), (0, 0), (0, sq_p - sq), (0, dh_p - dh))).reshape(b * h, sq_p, dh_p)
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, sk_p - sk), (0, dh_p - dh))).reshape(b * h, sk_p, dh_p)
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, sk_p - sk), (0, dh_p - dh))).reshape(b * h, sk_p, dh_p)

    # key bias [B, Sk] -> [BH, 1, Sk_p] with -inf beyond the true sk tail
    bias = jnp.pad(key_bias.astype(jnp.float32), ((0, 0), (0, sk_p - sk)), constant_values=_NEG_INF)
    bias = bias[:, None, :]
    bias = jnp.broadcast_to(bias[:, None], (b, h, 1, sk_p)).reshape(b * h, 1, sk_p)

    if stream:
        out = _flash_stream(qp, kp, vp, bias, sq_p, sk_p, dh_p, scale, q.dtype, interpret)
        return out.reshape(b, h, sq_p, dh_p)[:, :, :sq, :dh]

    grid = (b * h, sq_p // BLOCK_Q)
    out = pl.pallas_call(
        functools.partial(_kernel, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, BLOCK_Q, dh_p), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk_p, dh_p), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk_p, dh_p), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, sk_p), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, BLOCK_Q, dh_p), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, sq_p, dh_p), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * sq_p * sk_p * dh_p * 2,
            bytes_accessed=(qp.size + kp.size + vp.size) * 4,
            transcendentals=b * h * sq_p * sk_p,
        ),
        interpret=interpret,
    )(qp, kp, vp, bias)

    return out.reshape(b, h, sq_p, dh_p)[:, :, :sq, :dh]
