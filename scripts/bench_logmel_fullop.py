"""Full log_mel_spectrogram op, XLA vs Pallas kernel path, device-chained.

After the gather-free rewrite (reflect_pad_batch + strided-slice framing)
the per-call bench showed the Pallas path AHEAD end-to-end (14.4k vs 9.3k
clips/s) even though the isolated kernel region loses slightly — settle it
with scan-chained timing of the whole op (wave -> normalized quantized
spectrogram), which is what production (mel cache build, e2e mel branch)
actually runs.

Usage: python scripts/bench_logmel_fullop.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

import mer_tpu  # noqa: F401
from mer_tpu.ops.logmel import MelConfig, log_mel_spectrogram

# the raw python function: tracing it inline inside the timing scan avoids
# a nested-jit call boundary (measured ~10x unfair slowdown on the XLA side
# in scripts/bench_logmel_kernel.py)
_raw_op = log_mel_spectrogram.__wrapped__


def timed(fn, args, iters=30) -> float:
    first, rest = args[0], args[1:]

    @jax.jit
    def many(first, *rest):
        def body(c, _):
            out = fn(first + c * 1e-30, *rest)
            return jnp.sum(out[0, 0, 0]) * 1e-30, None

        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=iters)
        return c

    float(many(first, *rest))
    t0 = time.perf_counter()
    float(many(first, *rest))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    cfg = MelConfig()
    rng = np.random.default_rng(0)
    results = {}
    for b in (8, 32, 64):
        audio = jnp.asarray(rng.normal(size=(b, cfg.max_samples)).astype(np.float32))
        length = jnp.asarray(rng.integers(16000, cfg.max_samples, size=(b,)).astype(np.int32))
        xla_ms = timed(
            lambda a, l: _raw_op(a, l, cfg, channels_first=False, use_pallas=False),
            (audio, length),
        )
        pal_ms = timed(
            lambda a, l: _raw_op(a, l, cfg, channels_first=False, use_pallas=True),
            (audio, length),
        )
        results[f"b{b}"] = {
            "xla_ms": round(xla_ms, 3),
            "pallas_ms": round(pal_ms, 3),
            "speedup": round(xla_ms / pal_ms, 2),
            "clips_per_s_best": round(b / (min(xla_ms, pal_ms) / 1e3), 0),
        }
        print(f"b{b}", results[f"b{b}"], flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
