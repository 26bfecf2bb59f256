"""Decompose the fusion train step's wall clock (BENCH_LOCAL shows ~8.8%
MFU): measure the jitted step under ablations — dropout off, cheaper PRNG
(rbg vs threefry), inference-only forward — to locate where the non-matmul
time goes. Device-chained timing (CLAUDE.md gotcha 6/8).

Usage: python scripts/profile_fusion_train.py
"""

from __future__ import annotations

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
    jax.tree.leaves(out)[0].block_until_ready()
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]  # execution-verified sync
    t0 = time.perf_counter()
    last = None
    for _ in range(iters):
        last = fn(*args)
    np.asarray(jax.tree.leaves(last)[0]).ravel()[:1]
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    b, u, d = 32, 8, 768
    rng = np.random.default_rng(0)
    text = jnp.asarray(rng.normal(size=(b, u, d)).astype(np.float32))
    audio = jnp.asarray(rng.normal(size=(b, u, d)).astype(np.float32))
    mask = jnp.asarray(rng.random((b, u)) < 0.1)
    emotion = jnp.asarray(rng.integers(0, 7, size=(b, u)).astype(np.int32))

    model = M2FNet(dtype=jnp.bfloat16, scan_layers=True)
    params = model.init(jax.random.PRNGKey(0), text, audio, mask)["params"]
    opt = torch_adam(5e-5, weight_decay=0.01)
    opt_state = opt.init(params)
    key = jax.random.PRNGKey(1)

    def make_step(deterministic):
        def step(params, opt_state, key):
            def loss_fn(p):
                logits = model.apply(
                    {"params": p}, text, audio, mask,
                    deterministic=deterministic,
                    rngs=None if deterministic else {"dropout": key},
                )
                return cross_entropy(logits, emotion, label_smoothing=0.1, ignore_index=-1)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, new_opt = opt.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), new_opt, loss

        return jax.jit(step)

    def fwd_only(params, key):
        logits = model.apply({"params": params}, text, audio, mask,
                             deterministic=False, rngs={"dropout": key})
        return cross_entropy(logits, emotion, label_smoothing=0.1, ignore_index=-1)

    def adam_only(params, opt_state):
        grads = jax.tree.map(lambda x: x * 1e-6, params)
        updates, new_opt = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_opt

    results = {}
    results["fwd_dropout_ms"] = timed(jax.jit(fwd_only), (params, key))
    results["adam_update_ms"] = timed(jax.jit(adam_only), (params, opt_state))
    results["step_dropout_ms"] = timed(make_step(False), (params, opt_state, key))
    results["step_nodrop_ms"] = timed(make_step(True), (params, opt_state, key))

    # cheaper PRNG for the dropout masks (TPU-native: threefry is VPU-heavy)
    jax.config.update("jax_default_prng_impl", "rbg")
    key_rbg = jax.random.PRNGKey(2)
    results["step_dropout_rbg_ms"] = timed(make_step(False), (params, opt_state, key_rbg))
    jax.config.update("jax_default_prng_impl", "threefry2x32")

    for k, v in results.items():
        print(f"{k}: {v:.2f}")


if __name__ == "__main__":
    main()
