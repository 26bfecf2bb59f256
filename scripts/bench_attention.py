"""Measure fused Pallas attention vs XLA at the workload's REAL shapes.

Shapes that actually occur (SURVEY.md §5): RoBERTa 512 tokens x 12 heads x
dh 64, wav2vec2 499->512 frames x 12 x 64, fusion <=33 utterances (too small
to matter), and the long-audio growth axis 2048-8192. Reports fwd and
fwd+bwd (training) timings; run on the real chip.

Usage: python scripts/bench_attention.py [--iters 30]
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

import mer_tpu  # noqa: F401,E402  (enables the compile cache)
from mer_tpu.ops.attention import _attention_reference  # noqa: E402
from mer_tpu.ops.flash_attention import flash_attention  # noqa: E402


def timed(fn, args, iters: int) -> float:
    """Device-chained timing: iters iterations inside ONE jitted scan, each
    iteration's input perturbed by the previous iteration's output so nothing
    is hoisted or CSE'd. Measures pure device time — immune to the per-
    dispatch tunnel latency of this dev setup (CLAUDE.md timing gotcha)."""
    q, rest = args[0], args[1:]

    @jax.jit
    def many(q, *rest):
        def body(c, _):
            # cast back: a bf16 q promoted by the f32 carry would silently
            # time the f32 kernel
            out = fn((q + c * 1e-30).astype(q.dtype), *rest)
            leaf = out[0] if isinstance(out, tuple) else out
            leaf = leaf[0] if isinstance(leaf, tuple) else leaf
            # f32 carry regardless of leaf dtype (scan carry must be stable)
            return jnp.sum(leaf).astype(jnp.float32) * 1e-30, None

        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=iters)
        return c

    float(many(q, *rest))  # compile + warm
    t0 = time.perf_counter()
    float(many(q, *rest))
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--out", default="/tmp/bench_attention.json")
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    results = {}

    shapes = [
        # the ACTUAL benched-pipeline shapes (round-2 VERDICT weak #2):
        # RoBERTa context windows land mostly in the 64/128/256 buckets at
        # batch 32 (data/text_fe.py:20), wav2vec2 is 499 frames at batch 8
        ("roberta_b32_s64", 32, 12, 64, 64),
        ("roberta_b32_s128", 32, 12, 128, 64),
        ("roberta_b32_s256", 32, 12, 256, 64),
        ("wav2vec2_b8_s499", 8, 12, 499, 64),
        ("roberta_512", 8, 12, 512, 64),
        ("wav2vec2_512", 8, 12, 512, 64),
        ("long_1024", 8, 12, 1024, 64),
        ("long_2048", 8, 12, 2048, 64),
        ("long_4096", 4, 12, 4096, 64),
        ("long_8192", 2, 12, 8192, 64),
    ]

    for name, b, h, s, dh in shapes:
        iters = args.iters if s < 8192 else max(4, args.iters // 6)
        q, k, v = (
            jnp.asarray(rng.normal(size=(b, h, s, dh)).astype(np.float32)) for _ in range(3)
        )
        mask = jnp.asarray(rng.random((b, s)) < 0.1)

        xla_fwd = jax.jit(
            lambda q, k, v: _attention_reference(
                q, k, v, key_padding_mask=mask, dropout_rate=0.0,
                dropout_rng=None, deterministic=True,
            )
        )
        pal_fwd = jax.jit(lambda q, k, v: flash_attention(q, k, v, key_padding_mask=mask))

        def train_of(fwd):
            def loss(q, k, v):
                return jnp.sum(fwd(q, k, v) ** 2)

            return jax.jit(jax.grad(loss, argnums=(0, 1, 2)))

        qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))
        row = {
            "xla_fwd_ms": timed(xla_fwd, (q, k, v), iters),
            "pallas_fwd_ms": timed(pal_fwd, (q, k, v), iters),
            # serving path: bf16 inputs -> bf16 MXU matmuls, f32 accumulation
            # + f32 softmax inside the kernel (tests/test_flash_attention.py
            # ::TestFlashAttentionBf16 pins the numerics)
            "pallas_fwd_bf16_ms": timed(pal_fwd, (qb, kb, vb), iters),
            "xla_fwdbwd_ms": timed(train_of(lambda q, k, v: _attention_reference(
                q, k, v, key_padding_mask=mask, dropout_rate=0.0,
                dropout_rng=None, deterministic=True)), (q, k, v), iters),
            "pallas_fwdbwd_ms": timed(
                train_of(lambda q, k, v: flash_attention(q, k, v, key_padding_mask=mask)),
                (q, k, v), iters,
            ),
        }
        results[name] = {k: round(v, 3) for k, v in row.items()}
        print(name, results[name], flush=True)

    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
