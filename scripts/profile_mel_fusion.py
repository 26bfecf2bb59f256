"""Why is the mel-variant e2e stage2 (fusion over 300-d audio embeddings)
~7x slower than the 768-d default (BENCH_LOCAL e2e_mel_stages)?  Time the
jitted table-gather fusion forward for both configs on identical batch
streams, plus ablations (n_head 6 at 768-d, 300-d padded to 384).

Usage: python scripts/profile_mel_fusion.py
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
from mer_tpu.models import M2FNet


def bench_variant(name, d_audio, n_head_audio, n_batches=40, b=32, u=33, n_rows=4096):
    model = M2FNet(
        d_model_audio=d_audio, n_head_audio=n_head_audio,
        dtype=jnp.bfloat16, scan_layers=True,
    )
    rng = np.random.default_rng(0)
    table_t = jnp.asarray(rng.normal(size=(n_rows, 768)).astype(np.float32))
    table_a = jnp.asarray(rng.normal(size=(n_rows, d_audio)).astype(np.float32))
    idxm = jnp.asarray(rng.integers(0, n_rows, size=(b, u)).astype(np.int32))
    mask = jnp.asarray(rng.random((b, u)) < 0.1)

    params = model.init(
        jax.random.PRNGKey(0), table_t[idxm], table_a[idxm], mask
    )["params"]

    def fused(params, table_t, table_a, idxm, mask):
        safe = jnp.maximum(idxm, 0)
        valid = (idxm >= 0)[..., None]
        text = jnp.where(valid, table_t[safe], 0)
        audio = jnp.where(valid, table_a[safe], 0)
        return jnp.argmax(model.apply({"params": params}, text, audio, mask), axis=-1)

    jfused = jax.jit(fused)
    out = jfused(params, table_t, table_a, idxm, mask)
    np.asarray(out).ravel()[:1]
    t0 = time.perf_counter()
    last = None
    for _ in range(n_batches):
        last = jfused(params, table_t, table_a, idxm, mask)
    np.asarray(last).ravel()[:1]
    ms = (time.perf_counter() - t0) / n_batches * 1e3
    print(f"{name}: {ms:.2f} ms/batch ({b * u / ms * 1e3:.0f} utt/s)", flush=True)
    return ms


def main():
    bench_variant("default_768_h8", 768, 8)
    bench_variant("mel_300_h6", 300, 6)
    bench_variant("768_h6", 768, 6)
    bench_variant("mel_384_h6", 384, 6)


if __name__ == "__main__":
    main()
