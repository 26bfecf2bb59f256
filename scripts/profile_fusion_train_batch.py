"""Batch sweep for the fusion train step: the b=32 reference batch leaves the
step small-GEMM + optimizer-bandwidth bound (scripts/profile_fusion_train.py:
fwd 2.35 ms, in-step Adam ~3 ms ~= the 7-pass f32 param/moment traffic floor).
Measure utt/s vs batch to pick the TPU-tuned fusion train batch.

Usage: python scripts/profile_fusion_train_batch.py
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
import optax

import mer_tpu  # noqa: F401  (compile cache)
from mer_tpu.models import M2FNet
from mer_tpu.objectives.classification import cross_entropy
from mer_tpu.train.solver import torch_adam


def timed(fn, args, iters=30):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]  # execution-verified sync
    t0 = time.perf_counter()
    last = None
    for _ in range(iters):
        last = fn(*args)
    np.asarray(jax.tree.leaves(last)[0]).ravel()[:1]
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    u, d = 8, 768
    model = M2FNet(dtype=jnp.bfloat16, scan_layers=True)
    rng = np.random.default_rng(0)

    results = {}
    for b in (32, 64, 128, 256, 512):
        text = jnp.asarray(rng.normal(size=(b, u, d)).astype(np.float32))
        audio = jnp.asarray(rng.normal(size=(b, u, d)).astype(np.float32))
        mask = jnp.asarray(rng.random((b, u)) < 0.1)
        emotion = jnp.asarray(rng.integers(0, 7, size=(b, u)).astype(np.int32))

        params = model.init(jax.random.PRNGKey(0), text, audio, mask)["params"]
        opt = torch_adam(5e-5, weight_decay=0.01)
        opt_state = opt.init(params)
        key = jax.random.PRNGKey(1)

        def step(params, opt_state, key, text, audio, mask, emotion):
            def loss_fn(p):
                logits = model.apply(
                    {"params": p}, text, audio, mask,
                    deterministic=False, rngs={"dropout": key},
                )
                return cross_entropy(logits, emotion, label_smoothing=0.1, ignore_index=-1)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, new_opt = opt.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), new_opt, loss

        jstep = jax.jit(step)
        ms = timed(jstep, (params, opt_state, key, text, audio, mask, emotion))
        results[f"b{b}"] = {"step_ms": round(ms, 2), "utt_per_s": round(b * u / ms * 1e3, 1)}
        print(b, results[f"b{b}"], flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
