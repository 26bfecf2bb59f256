"""Decompose the fusion train step's wall clock (BENCH_LOCAL: 22.6% MFU at
the tuned batch 256 vs a roofline floor of ~13.6 ms/step against a measured
~41.8 ms/step — ~28 ms/step is neither peak-GEMM nor HBM-floor time).

Ablations per batch size: fwd-only, adam-only, full step with dropout
(threefry), full step with the TPU hardware PRNG (rbg) for the dropout
masks, full step without dropout, and grads-without-optimizer. The model
has ~140M dropout-mask elements per forward (12 encoder layers x
[B,U,768]/[B,U,3072] masks + 5 FAM layers), so mask generation is the
prime suspect: threefry2x32 is a long VPU op chain per 32 bits, while
rbg lowers to the TPU's RngBitGenerator instruction.

Device-chained timing (CLAUDE.md gotcha 6/8): params are carried through
the loop so steps chain; one value fetch at the end.

Usage: python scripts/profile_fusion_train.py [b1 b2 ...]  (default 32 256)
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


def timed_chained(step, params, opt_state, key, iters=20):
    """Time a (params, opt_state, key) -> (params, opt_state, loss) step with
    the param tree chained through the loop (true per-step cost, one fetch).
    The step donates its state args, so work on copies — the caller's trees
    stay valid for the next ablation."""
    p = jax.tree.map(jnp.copy, params)
    s = jax.tree.map(jnp.copy, opt_state)
    p, s, loss = step(p, s, key)
    np.asarray(loss).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(iters):
        p, s, loss = step(p, s, key)
    np.asarray(loss).ravel()[:1]
    return (time.perf_counter() - t0) / iters * 1e3


def timed(fn, args, iters=20):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    t0 = time.perf_counter()
    last = None
    for _ in range(iters):
        last = fn(*args)
    np.asarray(jax.tree.leaves(last)[0]).ravel()[:1]
    return (time.perf_counter() - t0) / iters * 1e3


def profile_batch(b, u=8, d=768):
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
    key_rbg = jax.random.key(1, impl="rbg")

    # batch arrays travel as jit ARGUMENTS — closing over them embeds ~19 MB
    # of HLO constants at b=256, the remote compiler's HTTP-413 failure mode
    # (CLAUDE.md gotcha 3)
    batch = (text, audio, mask, emotion)

    def make_step(deterministic, with_opt=True):
        def step(params, opt_state, key, text, audio, mask, emotion):
            def loss_fn(p):
                logits = model.apply(
                    {"params": p}, text, audio, mask,
                    deterministic=deterministic,
                    rngs=None if deterministic else {"dropout": key},
                )
                return cross_entropy(logits, emotion, label_smoothing=0.1, ignore_index=-1)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            if not with_opt:
                return params, opt_state, loss
            updates, new_opt = opt.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), new_opt, loss

        jstep = jax.jit(step, donate_argnums=(0, 1))
        return lambda p, s, k: jstep(p, s, k, *batch)

    def fwd_only(params, key, text, audio, mask, emotion):
        logits = model.apply({"params": params}, text, audio, mask,
                             deterministic=False, rngs={"dropout": key})
        return cross_entropy(logits, emotion, label_smoothing=0.1, ignore_index=-1)

    def fwd_eval(params, text, audio, mask, emotion):
        logits = model.apply({"params": params}, text, audio, mask, deterministic=True)
        return cross_entropy(logits, emotion, label_smoothing=0.1, ignore_index=-1)

    def adam_only(params, opt_state):
        grads = jax.tree.map(lambda x: x * 1e-6, params)
        updates, new_opt = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_opt

    jfwd_eval = jax.jit(fwd_eval)
    jfwd_only = jax.jit(fwd_only)
    r = {}
    r["fwd_eval_ms"] = timed(jfwd_eval, (params, *batch))
    r["fwd_dropout_ms"] = timed(jfwd_only, (params, key, *batch))
    r["fwd_dropout_rbg_ms"] = timed(jfwd_only, (params, key_rbg, *batch))
    r["adam_update_ms"] = timed(jax.jit(adam_only), (params, opt_state))
    r["grads_nodrop_ms"] = timed_chained(make_step(True, with_opt=False), params, opt_state, key)
    r["step_nodrop_ms"] = timed_chained(make_step(True), params, opt_state, key)
    r["step_dropout_ms"] = timed_chained(make_step(False), params, opt_state, key)
    r["step_dropout_rbg_ms"] = timed_chained(make_step(False), params, opt_state, key_rbg)
    return {k: round(v, 2) for k, v in r.items()}


def main():
    batches = [int(a) for a in sys.argv[1:]] or [32, 256]
    results = {}
    for b in batches:
        results[f"b{b}"] = profile_batch(b)
        print(f"b{b}: {results[f'b{b}']}", flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
