"""Decompose the wav2vec2 conv-stack's layer-0 cost on the chip.

profile_w2v_conv.py --per-layer showed the whole stack (11.1 ms, 32x4s bf16)
is dominated by layer 0 + GroupNorm: a standalone conv0+GN program costs
~9.5 ms while layers 1-6 carry 99% of the FLOPs (624 of 628 GF).  Layer 0's
bandwidth floor is ~2.6 ms ([32,12799,512] bf16 written once, read twice,
normalized written once) — so ~7 ms is lowering overhead.  This probe times
each candidate sub-part to find it:

  conv0_xla    lax.conv (k=10, s=5, cin=1) alone, output materialized
  conv0_gemm   fold-GEMM formulation: wave->[B,T/10,10] rows, even/odd
               phase GEMMs [.,10]@[10,512], interleaved via a lane-halving
               reshape ([T/2,1024]->[T,512])
  gn_only      GroupNorm(512,512) stats+normalize+GELU on a precomputed
               [32,12799,512] bf16 input
  layer0_xla   the full layer-0 chain as ConvFeatureExtractor runs it
  layer0_gemm  conv0_gemm + GN + GELU
  stack_mixed  conv0_gemm + GN + GELU + XLA convs 1..6 (no other change)

Each timing materializes its full output through a jnp.sum (the chained-scan
harness otherwise lets XLA slice away the normalize; CLAUDE.md gotcha 6).
The sum itself re-reads the output (~0.5 ms at 419 MB) — compare variants,
not absolutes.
"""

from __future__ import annotations

import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

import numpy as np

import mer_tpu  # noqa: F401  (compile cache)
import jax
import jax.numpy as jnp

from mer_tpu.models.wav2vec2 import Wav2Vec2Config, ConvFeatureExtractor

B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
SECS = float(sys.argv[2]) if len(sys.argv) > 2 else 4.0
L = int(16000 * SECS)
DTYPE = jnp.bfloat16
REPEATS = 10
cfg = Wav2Vec2Config.base()
C = 512


def timed(fn, x, *args) -> float:
    """Chained-scan timing with the first argument PERTURBED per iteration —
    without this the body is loop-invariant and XLA hoists it out of the
    while loop (first version of this probe measured exactly that: 3.4 ms
    for a stack the perturbed harness puts at 11.1 ms).  The full jnp.sum
    defeats dead-code elimination of the normalize tail (costs one extra
    read of the output — compare variants, not absolutes)."""

    def chained(xx, *a):
        def body(c, _):
            # compute the perturbation in f32 and cast into the input dtype:
            # bf16(1e-30) is statically 0 (hoistable again), while a runtime
            # cast of c*1e-30 is 0-valued but not foldable
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


def conv0_xla(kernel, wave):
    x = wave[:, :, None].astype(DTYPE)
    return jax.lax.conv_general_dilated(
        x, kernel.astype(DTYPE), window_strides=(5,), padding="VALID",
        dimension_numbers=("NWC", "WIO", "NWC"),
    )


def conv0_gemm(kernel, wave):
    """k=10, s=5, cin=1 as two phase GEMMs over a [B, T/10, 10] fold.

    rows r[m] = wave[10m:10m+10]; even outputs t=2m read exactly r[m]; odd
    outputs t=2m+1 read wave[10m+5:10m+15] = second half of r[m] + first half
    of r[m+1].  Interleave even/odd back with the lane-halving reshape
    [T/2, 2C] -> [T, C] (row m = [even_m | odd_m])."""
    w = kernel.astype(DTYPE).reshape(10, C)  # [k, cin=1, C] -> [10, C]
    b, l = wave.shape
    n = l // 10  # 6400 rows of 10
    r = wave[:, : n * 10].astype(DTYPE).reshape(b, n, 10)
    even = jnp.einsum("bnk,kc->bnc", r, w)  # t = 2m, m in [0, n)
    # odd phase: [r[m, 5:] | r[m+1, :5]]
    shifted = jnp.concatenate([r[:, :, 5:], jnp.roll(r, -1, axis=1)[:, :, :5]], axis=-1)
    odd = jnp.einsum("bnk,kc->bnc", shifted, w)
    inter = jnp.concatenate([even, odd], axis=-1).reshape(b, 2 * n, C)
    t_out = (l - 10) // 5 + 1
    return inter[:, :t_out]


def gn_gelu(gp, x):
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=1, keepdims=True)
    var = xf.var(axis=1, keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + cfg.layer_norm_eps)
    x = (xf * gp["scale"] + gp["bias"]).astype(jnp.float32)
    x = 0.5 * x * (1.0 + jax.lax.erf(x * np.float32(1.0 / np.sqrt(2.0))))
    return x.astype(DTYPE)


def rest_of_stack(params, x):
    for i in range(1, 7):
        kernel = params[f"conv_{i}"]["kernel"].astype(DTYPE)
        x = jax.lax.conv_general_dilated(
            x, kernel, window_strides=(cfg.conv_stride[i],), padding="VALID",
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        x = jax.nn.gelu(x, approximate=False)
    return x


def main():
    rng = np.random.default_rng(0)
    wave = jnp.asarray(rng.normal(size=(B, L)).astype(np.float32))
    model = ConvFeatureExtractor(cfg, dtype=DTYPE)
    params = model.init(jax.random.PRNGKey(0), wave[:1])["params"]
    k0 = params["conv_0"]["kernel"]
    gp = params["group_norm"]

    # equality check for the gemm formulation
    a = np.asarray(conv0_xla(k0, wave[:2])).astype(np.float64)
    b_ = np.asarray(conv0_gemm(k0, wave[:2])).astype(np.float64)
    rel = np.abs(a - b_).max() / max(np.abs(a).max(), 1e-9)
    print(f"conv0 gemm-vs-xla max rel err (bf16): {rel:.2e}")

    x1 = conv0_xla(k0, wave)  # precomputed input for gn_only
    x1 = jax.block_until_ready(x1)

    variants = {
        "conv0_xla": (lambda: timed(lambda w, k: conv0_xla(k, w), wave, k0)),
        "conv0_gemm": (lambda: timed(lambda w, k: conv0_gemm(k, w), wave, k0)),
        "gn_only": (lambda: timed(lambda x, g: gn_gelu(g, x), x1, gp)),
        "rest16_xla": (lambda: timed(lambda x, p: rest_of_stack(p, x), x1, params)),
        "layer0_xla": (lambda: timed(lambda w, k, g: gn_gelu(g, conv0_xla(k, w)), wave, k0, gp)),
        "layer0_gemm": (lambda: timed(lambda w, k, g: gn_gelu(g, conv0_gemm(k, w)), wave, k0, gp)),
        "stack_mixed": (lambda: timed(
            lambda w, p: rest_of_stack(p, gn_gelu(p["group_norm"], conv0_gemm(p["conv_0"]["kernel"], w))),
            wave, params)),
        "stack_xla": (lambda: timed(
            lambda w, p: rest_of_stack(p, gn_gelu(p["group_norm"], conv0_xla(p["conv_0"]["kernel"], w))),
            wave, params)),
    }
    for name, run in variants.items():
        dt = run()
        print(f"{name:12s}: {dt*1e3:8.3f} ms/batch")


if __name__ == "__main__":
    main()
