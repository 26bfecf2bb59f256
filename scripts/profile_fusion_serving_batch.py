"""Serving-batch sweep for the fusion forward: the headline serves the
reference's test split at its batch_size=32 (src/config.yaml test loader) —
[32*U, 768] GEMMs leave the MXU starved (32% MFU). Same workload re-collated
at larger serving batches amortizes per-op overheads and fills the MXU.

Usage: python scripts/profile_fusion_serving_batch.py
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
from mer_tpu.models import M2FNet


def main():
    u = 8
    model = M2FNet(dtype=jnp.bfloat16, scan_layers=True)
    rng = np.random.default_rng(0)
    results = {}
    params = None
    for b in (32, 64, 128, 256, 512):
        text = jnp.asarray(rng.normal(size=(b, u, 768)).astype(np.float32))
        audio = jnp.asarray(rng.normal(size=(b, u, 768)).astype(np.float32))
        mask = jnp.asarray(rng.random((b, u)) < 0.1)
        if params is None:
            params = jax.device_put(
                jax.tree.map(
                    lambda x: jnp.asarray(x, jnp.bfloat16),
                    model.init(jax.random.PRNGKey(0), text[:2], audio[:2], mask[:2])["params"],
                )
            )

        @jax.jit
        def fwd(p, t, a, m):
            return jnp.argmax(model.apply({"params": p}, t, a, m), axis=-1)

        out = fwd(params, text, audio, mask)
        float(out.ravel()[0])
        iters = 30
        t0 = time.perf_counter()
        last = None
        for _ in range(iters):
            last = fwd(params, text, audio, mask)
        float(last.ravel()[0])
        ms = (time.perf_counter() - t0) / iters * 1e3
        results[f"b{b}"] = {"ms": round(ms, 2), "utt_per_s": round(b * u / ms * 1e3, 0)}
        print(b, results[f"b{b}"], flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
