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

B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
SECS = float(sys.argv[2]) if len(sys.argv) > 2 else 4.0
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


if __name__ == "__main__":
    main()
