"""Find a faster lowering for the wav2vec2 grouped positional conv.

profile_w2v_parts.py puts proj+pos_conv at 2.07 ms / 15.9% of bf16 peak at
the 32x4s export shape — the grouped conv (k=128, groups=16, C=768 on
[32, 199, 768], torchaudio WAV2VEC2_BASE pos_conv_embed,
audio_wav2vec2/model.py:9) is ~60 GF and the obvious culprit.  Variants:

  grouped_nwc   the module's lowering (lax.conv, feature_group_count=16)
  groups2batch  groups moved to the batch axis: [B,T,16,48] -> [16B,T,48],
                16 dense convs of cin=cout=48 batched together
  grouped_ncw   channels-first dimension numbers (NCW/OIW)
  dense_bdiag   dense conv with a block-diagonal [128,768,768] kernel —
                16x the FLOPs (962 GF) but plain dense-conv tiling
  tap_matmul    unrolled sum over 128 taps of [B,T,16,48]x[16,48,48]
                batched einsums on shifted views

Each timing uses the perturbed chained-scan harness (CLAUDE.md gotchas 6/8;
loop-invariant bodies get hoisted — see probe_w2v_layer0).

Usage: python scripts/probe_w2v_posconv.py [batch] [frames]
"""

from __future__ import annotations

import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

import numpy as np

import mer_tpu  # noqa: F401
import jax
import jax.numpy as jnp

B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
T = int(sys.argv[2]) if len(sys.argv) > 2 else 199
C, K, G = 768, 128, 16
CG = C // G
DTYPE = jnp.bfloat16
REPEATS = 20
PAD = K // 2


def timed(fn, x, *args) -> float:
    def chained(xx, *a):
        def body(c, _):
            out = fn((xx.astype(jnp.float32) + c * 1e-30).astype(xx.dtype), *a)
            return c + jnp.sum(out).astype(jnp.float32), None

        acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=REPEATS)
        return acc

    j = jax.jit(chained)
    float(j(x, *args))
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(j(x, *args))
        times.append((time.perf_counter() - t0) / REPEATS)
    return min(times)


def grouped_nwc(x, w):
    # w: [K, CG, C]
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(1,), padding=[(PAD, PAD)],
        dimension_numbers=("NWC", "WIO", "NWC"), feature_group_count=G,
    )
    return out[:, :-1, :]


def groups2batch(x, w):
    b, t, _ = x.shape
    xg = x.reshape(b, t, G, CG).transpose(2, 0, 1, 3).reshape(G * b, t, CG)
    # w[K, CG, C] -> per-group [K, CG, CG]; groups become conv batch
    wg = w.reshape(K, CG, G, CG)  # out channel co = g*CG + j -> w[..., g, j]
    outs = []
    for g in range(G):
        outs.append(jax.lax.conv_general_dilated(
            xg[g * b : (g + 1) * b], wg[:, :, g], window_strides=(1,),
            padding=[(PAD, PAD)], dimension_numbers=("NWC", "WIO", "NWC"),
        ))
    out = jnp.stack(outs, axis=2)  # [B, T+1, G, CG]
    return out.reshape(b, t + 1, C)[:, :-1, :]


def grouped_ncw(x, w):
    xt = x.transpose(0, 2, 1)  # [B, C, T]
    wt = w.transpose(2, 1, 0)  # [C_out, CG, K]
    out = jax.lax.conv_general_dilated(
        xt, wt, window_strides=(1,), padding=[(PAD, PAD)],
        dimension_numbers=("NCW", "OIW", "NCW"), feature_group_count=G,
    )
    return out.transpose(0, 2, 1)[:, :-1, :]


def dense_bdiag(x, wd):
    # wd: [K, C, C] block-diagonal
    out = jax.lax.conv_general_dilated(
        x, wd, window_strides=(1,), padding=[(PAD, PAD)],
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    return out[:, :-1, :]


def tap_matmul(x, wg):
    # wg: [K, G, CG, CG]; out[t] = sum_tau x[t + tau - PAD] @ wg[tau]
    b, t, _ = x.shape
    xp = jnp.pad(x, ((0, 0), (PAD, PAD), (0, 0))).reshape(b, t + 2 * PAD, G, CG)
    acc = jnp.zeros((b, t + 1, G, CG), jnp.float32)
    for tau in range(K):
        acc = acc + jnp.einsum(
            "btgc,gcd->btgd", xp[:, tau : tau + t + 1], wg[tau],
            preferred_element_type=jnp.float32,
        )
    return acc.reshape(b, t + 1, C)[:, :t, :].astype(x.dtype)


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, T, C)).astype(np.float32)).astype(DTYPE)
    w = jnp.asarray(rng.normal(size=(K, CG, C)).astype(np.float32) * 0.02).astype(DTYPE)
    wg = w.reshape(K, CG, G, CG).transpose(0, 2, 1, 3)  # [K, G, CG, CG]
    wd = np.zeros((K, C, C), np.float32)
    wnp = np.asarray(w.astype(jnp.float32))
    for g in range(G):
        wd[:, g * CG : (g + 1) * CG, g * CG : (g + 1) * CG] = (
            wnp.reshape(K, CG, G, CG)[:, :, g]
        )
    wd = jnp.asarray(wd).astype(DTYPE)

    fl = 2 * B * T * K * CG * C
    ref = np.asarray(grouped_nwc(x, w).astype(jnp.float32)).astype(np.float64)
    for name, fn, weight in [
        ("grouped_nwc", grouped_nwc, w),
        ("groups2batch", groups2batch, w),
        ("grouped_ncw", grouped_ncw, w),
        ("dense_bdiag", dense_bdiag, wd),
        ("tap_matmul", tap_matmul, wg),
    ]:
        got = np.asarray(fn(x, weight).astype(jnp.float32)).astype(np.float64)
        rel = np.abs(ref - got).max() / max(np.abs(ref).max(), 1e-9)
        dt = timed(fn, x, weight)
        print(
            f"{name:14s}: {dt*1e3:8.3f} ms  {fl/dt/1e12:6.1f} TFLOP/s "
            f"({fl/dt/197e12*100:5.1f}% bf16 peak)  rel_err {rel:.2e}"
        )


if __name__ == "__main__":
    main()
