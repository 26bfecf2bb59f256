"""Profile the wav2vec2 conv feature extractor: XLA conv lowering vs a
GEMM reformulation (strided-window reshape + matmul).

The conv stack is ~38% of the export-path FLOPs (7 temporal convs, 512ch;
analytic: ~21.5 GFLOP/4s-clip vs ~35.5 for the 12-layer encoder), and the
wav2vec2 export runs at 34.6% MFU vs RoBERTa's 50% (BENCH_LOCAL.json) —
this isolates whether XLA's conv1d lowering is the gap.

Timing protocol: device-chained lax.scan repeats, one scalar fetch
(CLAUDE.md gotchas 6/8).

Usage: python scripts/profile_w2v_conv.py [batch] [seconds]
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

from mer_tpu.models.wav2vec2 import (
    ConvFeatureExtractor, Wav2Vec2Config, conv_stack_gemm,
)

_pos = [a for a in sys.argv[1:] if not a.startswith("--")]
B = int(_pos[0]) if len(_pos) > 0 else 32
SECS = float(_pos[1]) if len(_pos) > 1 else 4.0
L = int(16000 * SECS)
DTYPE = jnp.bfloat16
REPEATS = 20

cfg = Wav2Vec2Config.base()


def conv_flops(batch: int, length: int) -> float:
    total = 0.0
    l = length
    cin = 1
    for dim, k, s in zip(cfg.conv_dim, cfg.conv_kernel, cfg.conv_stride):
        l = (l - k) // s + 1
        total += 2.0 * l * k * cin * dim
        cin = dim
    return total * batch


def timed(fn, params, wav) -> float:
    """Min wall over 3 fetch-synced runs of REPEATS device-chained
    iterations. The carry perturbs the input each iteration (the
    bench_attention.py trick) so XLA cannot hoist the loop-invariant conv
    out of the scan."""

    def chained(p, w):
        def body(c, _):
            out = fn(p, w + c * 1e-30)
            return jnp.sum(out[..., 0, 0]).astype(jnp.float32), None

        acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=REPEATS)
        return acc

    j = jax.jit(chained)
    float(j(params, wav))  # compile + warm
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(j(params, wav))
        times.append((time.perf_counter() - t0) / REPEATS)
    return min(times)


def conv_prefix(params, w, n_layers: int, dtype=DTYPE):
    """Forward through the first ``n_layers`` convs of the stack (with the
    layer-0 GroupNorm + GELU exactly as ConvFeatureExtractor applies them).
    Timing prefixes 1..7 gives a per-layer cost breakdown by differencing."""
    import flax.linen as nn_

    x = w[:, :, None].astype(dtype)
    for i, (dim, k, s) in enumerate(
        zip(cfg.conv_dim[:n_layers], cfg.conv_kernel[:n_layers], cfg.conv_stride[:n_layers])
    ):
        kernel = params[f"conv_{i}"]["kernel"].astype(dtype)
        x = jax.lax.conv_general_dilated(
            x, kernel, window_strides=(s,), padding="VALID",
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        if i == 0:
            gp = params["group_norm"]
            xf = x.astype(jnp.float32)
            mean = xf.mean(axis=1, keepdims=True)
            var = xf.var(axis=1, keepdims=True)
            xf = (xf - mean) * jax.lax.rsqrt(var + cfg.layer_norm_eps)
            x = (xf * gp["scale"] + gp["bias"]).astype(dtype)
        x = nn_.gelu(x, approximate=False)
    return x


def main():
    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.normal(size=(B, L)).astype(np.float32))

    model = ConvFeatureExtractor(cfg, dtype=DTYPE)
    params = model.init(jax.random.PRNGKey(0), wav)["params"]

    def xla_conv(p, w):
        return model.apply({"params": p}, w)

    def gemm_conv(p, w):
        return conv_stack_gemm(p, w, cfg, dtype=DTYPE)

    # numerics first (bf16 tolerance)
    a = np.asarray(xla_conv(params, wav[:2])).astype(np.float64)
    b = np.asarray(gemm_conv(params, wav[:2])).astype(np.float64)
    rel = np.abs(a - b).max() / max(np.abs(a).max(), 1e-9)
    print(f"gemm-vs-xla max rel err (bf16): {rel:.2e}")

    fl = conv_flops(B, L)
    for name, fn in [("xla_conv", xla_conv), ("gemm_conv", gemm_conv)]:
        dt = timed(fn, params, wav)
        print(
            f"{name}: {dt*1e3:8.3f} ms/batch  "
            f"{fl/dt/1e12:6.1f} TFLOP/s  ({fl/dt/197e12*100:4.1f}% bf16 peak)"
        )

    if "--per-layer" in sys.argv:
        # prefix timings -> per-layer deltas (which conv layer actually costs)
        prev = 0.0
        for n in range(1, len(cfg.conv_dim) + 1):
            fn = lambda p, w, n=n: conv_prefix(p, w, n)
            dt = timed(fn, params, wav)
            layer_fl = conv_flops(B, L) if n == 7 else None
            print(
                f"prefix conv_0..conv_{n-1}: {dt*1e3:8.3f} ms  "
                f"(delta conv_{n-1}: {(dt-prev)*1e3:7.3f} ms)"
            )
            prev = dt

    if "--pallas" in sys.argv:
        from mer_tpu.ops.w2v_conv_pallas import conv_stack_fused

        def pallas_conv(p, w):
            return conv_stack_fused(p, w, cfg, dtype=DTYPE)

        a = np.asarray(xla_conv(params, wav[:2])).astype(np.float64)
        c = np.asarray(pallas_conv(params, wav[:2])).astype(np.float64)
        rel = np.abs(a - c).max() / max(np.abs(a).max(), 1e-9)
        print(f"pallas-vs-xla max rel err (bf16): {rel:.2e}")
        dt = timed(pallas_conv, params, wav)
        print(
            f"pallas_conv: {dt*1e3:8.3f} ms/batch  "
            f"{fl/dt/1e12:6.1f} TFLOP/s  ({fl/dt/197e12*100:4.1f}% bf16 peak)"
        )

    if "--l0fused" in sys.argv:
        from mer_tpu.ops.w2v_conv_pallas import conv_stack_l0fused

        def l0_conv(p, w):
            return conv_stack_l0fused(p, w, cfg, dtype=DTYPE)

        a = np.asarray(xla_conv(params, wav[:2])).astype(np.float64)
        c = np.asarray(l0_conv(params, wav[:2])).astype(np.float64)
        rel = np.abs(a - c).max() / max(np.abs(a).max(), 1e-9)
        print(f"l0fused-vs-xla max rel err (bf16): {rel:.2e}")
        dt = timed(l0_conv, params, wav)
        print(
            f"l0fused_conv: {dt*1e3:8.3f} ms/batch  "
            f"{fl/dt/1e12:6.1f} TFLOP/s  ({fl/dt/197e12*100:4.1f}% bf16 peak)"
        )

    if "--gnfused" in sys.argv:
        from mer_tpu.ops.w2v_conv_pallas import conv_stack_gnfused

        def gn_conv(p, w):
            return conv_stack_gnfused(p, w, cfg, dtype=DTYPE)

        a = np.asarray(xla_conv(params, wav[:2])).astype(np.float64)
        c = np.asarray(gn_conv(params, wav[:2])).astype(np.float64)
        rel = np.abs(a - c).max() / max(np.abs(a).max(), 1e-9)
        print(f"gnfused-vs-xla max rel err (bf16): {rel:.2e}")
        dt = timed(gn_conv, params, wav)
        print(
            f"gnfused_conv: {dt*1e3:8.3f} ms/batch  "
            f"{fl/dt/1e12:6.1f} TFLOP/s  ({fl/dt/197e12*100:4.1f}% bf16 peak)"
        )


if __name__ == "__main__":
    main()
