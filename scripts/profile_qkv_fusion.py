"""Does fusing the q/k/v projections into ONE GEMM help at M2FNet shapes?

Self-attention projects the same [N, d] activations through three separate
[d, d] GEMMs; concatenating the weights gives one [d, 3d] GEMM — fewer
kernel launches and a wider MXU tile. Measure both at the fusion model's
token counts (b=32/512 dialogues x U=8) and RoBERTa's (32x128), with the
concat of the three weight params INSIDE the jit (how a real implementation
keeping the reference param tree would run).

Usage: python scripts/profile_qkv_fusion.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

import mer_tpu  # noqa: F401


def timed(fn, args, iters=50):
    first, rest = args[0], args[1:]

    @jax.jit
    def many(first, *rest):
        def body(c, _):
            out = fn(first + c * 1e-30, *rest)
            return jnp.sum(out[0][..., 0]) * 1e-30 if isinstance(out, tuple) else jnp.sum(out[..., 0]) * 1e-30, None

        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=iters)
        return c

    float(many(first, *rest))
    t0 = time.perf_counter()
    float(many(first, *rest))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    d = 768
    rng = np.random.default_rng(0)
    ws = [jnp.asarray(rng.normal(size=(d, d)).astype(np.float32) * 0.02, jnp.bfloat16) for _ in range(3)]
    bs = [jnp.asarray(np.zeros(d, np.float32), jnp.bfloat16) for _ in range(3)]

    def separate(x, wq, wk, wv, bq, bk, bv):
        return x @ wq + bq, x @ wk + bk, x @ wv + bv

    def fused(x, wq, wk, wv, bq, bk, bv):
        w = jnp.concatenate([wq, wk, wv], axis=1)
        b = jnp.concatenate([bq, bk, bv])
        y = x @ w + b
        return y[:, :d], y[:, d : 2 * d], y[:, 2 * d :]

    for n in (256, 1056, 4096, 32 * 128):
        x = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32), jnp.bfloat16)
        sep = timed(separate, (x, *ws, *bs))
        fus = timed(fused, (x, *ws, *bs))
        print(f"N={n:6d}  separate {sep:7.3f} ms   fused {fus:7.3f} ms   ({sep / fus:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
