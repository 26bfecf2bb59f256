"""Isolate the Pallas log-mel KERNEL REGION vs the unfused XLA path.

Device-resident frames in, device log-mel out — no tunnel, no framing, no
normalization: just the GEMM-NDFT + magnitude + mel projection + log that
`ops/logmel_pallas.py` fuses (VERDICT round 1: the end-to-end bench was
host-transfer-bound, so the fusion claim was unproven).

Usage: python scripts/bench_logmel_kernel.py [--iters 50]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import mer_tpu  # noqa: F401,E402
from mer_tpu.ops.logmel import MelConfig  # noqa: E402
from mer_tpu.ops.logmel_pallas import _operands, logmel_frames_pallas  # noqa: E402


def timed(fn, args, iters: int) -> float:
    """Device-chained scan timing (see scripts/bench_attention.py): immune to
    per-dispatch tunnel latency; fn is traced inline in ONE jit."""
    first, rest = args[0], args[1:]

    @jax.jit
    def many(first, *rest):
        def body(c, _):
            out = fn(first + c * 1e-30, *rest)
            return jnp.sum(out) * 1e-30, None

        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=iters)
        return c

    float(many(first, *rest))
    t0 = time.perf_counter()
    float(many(first, *rest))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()

    cfg = MelConfig()
    cos_p, sin_p, mel_t = _operands(cfg)
    cos_j, sin_j, mel_j = jnp.asarray(cos_p), jnp.asarray(sin_p), jnp.asarray(mel_t)

    def xla_unfused(frames):  # NOT jitted here: timed() jits the scan, and a
        # nested jit would create a call boundary XLA can't fuse across —
        # unfairly slowing the XLA side ~10x (measured)
        # the same padded GEMM-NDFT math, left to XLA to schedule/fuse
        f = jnp.pad(frames, ((0, 0), (0, 0), (0, cos_p.shape[0] - frames.shape[-1])))
        re = jnp.einsum("bfn,nk->bfk", f, cos_j)
        im = jnp.einsum("bfn,nk->bfk", f, sin_j)
        mag = jnp.sqrt(re * re + im * im)
        mel = jnp.einsum("bfk,km->bfm", mag, mel_j)
        return jnp.log(mel + np.finfo(np.float64).eps)[..., : cfg.n_mels]

    pallas = lambda frames: logmel_frames_pallas(frames, cfg)

    rng = np.random.default_rng(0)
    results = {}
    for b, f in [(32, 1001), (8, 1001), (64, 1001)]:
        frames = jnp.asarray(rng.normal(size=(b, f, cfg.n_fft)).astype(np.float32))
        xla_ms = timed(xla_unfused, (frames,), args.iters)
        pal_ms = timed(pallas, (frames,), args.iters)
        results[f"b{b}_f{f}"] = {
            "xla_ms": round(xla_ms, 3),
            "pallas_ms": round(pal_ms, 3),
            "speedup": round(xla_ms / pal_ms, 2),
            "clips_per_s_pallas": round(b / (pal_ms / 1e3), 0),
        }
        print(f"b{b}_f{f}", results[f"b{b}_f{f}"], flush=True)

    print(json.dumps(results))
    with open("/tmp/bench_logmel_kernel.json", "w") as fo:
        json.dump(results, fo, indent=1)


if __name__ == "__main__":
    main()
