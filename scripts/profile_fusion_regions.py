"""Per-region decomposition of the fusion tuned train step (VERDICT r4 #2).

BENCH_LOCAL r4: fusion_train_tuned = 41.8 ms/step at b256 (334.5 ms / 8
steps), of which GEMM-at-peak 9.4 + optimizer-HBM 2.9 + param/grad-HBM 1.3
= 13.6 ms are explained floors — ~28 ms/step unattributed. This script
measures every region of the actual production step (Solver._scan_train,
solver.py:216-230) so the gap is named, not guessed:

  1. the HBM batch gather inside the scan body (gather_fusion_batch)
  2. the 12 encoder layers (6 audio + 6 text), fwd and fwd+bwd
  3. FAM region by model-config subtraction (full vs fam_enabled=False)
  4. dropout mask generation + apply (threefry vs rbg vs off)
  5. the Adam update, the CE loss

Backward anchors consume EVERY grad leaf (a single-leaf anchor lets XLA
DCE most of the backward — measured r5). All timings are device-chained scans (CLAUDE.md gotcha 6/8): iters
iterations inside ONE jitted program with a data dependency, one fetch.
Every array operand travels as a jit ARGUMENT (closed-over trees are baked
into the HLO as literals -> oversized remote-compile programs, gotcha 3).
``harness_floor_ms`` is the empty-body calibration: each row is inflated by
~(dispatch+fetch)/iters; subtract the floor when comparing small regions.
Model dims = production headline (d=768, 6+6 encoders, 5 FAM, dropout 0.4,
bf16 compute / f32 params). Reference hot loop: src/train.py:217-231.

Usage: python scripts/profile_fusion_regions.py [batch] [part]
  part: all | gather | regions | model | dropout  (default all)
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
from mer_tpu.data.fusion import gather_fusion_batch
from mer_tpu.models import M2FNet
from mer_tpu.models.layers import MultiheadAttention, TransformerEncoder
from mer_tpu.objectives.classification import cross_entropy
from mer_tpu.train.solver import torch_adam

B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
PART = sys.argv[2] if len(sys.argv) > 2 else "all"
U = 8
D = 768
N_STEPS = 8  # the tuned epoch's step count (2048 dialogues / 256)


def chained_ms(fn, args, iters=50):
    """One jitted scan of `iters` data-chained iterations; per-iter ms.
    ``fn(*args)`` -> pytree. ALL args are jit arguments; the first is
    perturbed by the carry so XLA cannot hoist the body."""

    @jax.jit
    def many(first, *rest):
        def body(c, _):
            perturb = lambda x: x + (c * 1e-30).astype(x.dtype)
            out = fn(jax.tree.map(perturb, first), *rest)
            leaf = jax.tree.leaves(out)[0]
            return jnp.sum(leaf.astype(jnp.float32)) * 1e-30, None

        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=iters)
        return c

    first, rest = args[0], args[1:]
    float(many(first, *rest))  # compile + execute sync
    t0 = time.perf_counter()
    float(many(first, *rest))
    return (time.perf_counter() - t0) / iters * 1e3


class _Progress(dict):
    def __setitem__(self, k, v):
        super().__setitem__(k, v)
        print(f"  {k} = {round(v, 3) if isinstance(v, float) else v}",
              file=sys.stderr, flush=True)


def main():
    rng = np.random.default_rng(0)
    r = _Progress({"batch": B, "utterances": U})

    text = jnp.asarray(rng.normal(size=(B, U, D)).astype(np.float32))
    audio = jnp.asarray(rng.normal(size=(B, U, D)).astype(np.float32))
    mask = jnp.asarray(rng.random((B, U)) < 0.1)
    emotion = jnp.asarray(rng.integers(0, 7, size=(B, U)).astype(np.int32))
    key_tf = jax.random.key(1, impl="threefry2x32")
    key_rbg = jax.random.key(1, impl="rbg")

    r["harness_floor_ms"] = chained_ms(lambda x: x * 1.0000001, (text,))

    # ---- 1. the scan-body batch gather vs a contiguous-slice feed ----------
    if PART in ("all", "gather"):
        n_dialogues = N_STEPS * B
        text_all = jnp.asarray(rng.normal(size=(n_dialogues, 33, D)).astype(np.float32))
        audio_all = jnp.asarray(rng.normal(size=(n_dialogues, 33, D)).astype(np.float32))
        emotion_all = jnp.asarray(rng.integers(0, 7, size=(n_dialogues, 33)).astype(np.int32))
        perm = rng.permutation(n_dialogues).astype(np.int32)
        idx_all = jnp.asarray(perm.reshape(N_STEPS, B))

        def gather_only(idx_all, t, a, e):
            def body(c, idx_row):
                b = gather_fusion_batch(t, a, e, idx_row, U)
                return c + jnp.sum(b["text"][..., 0]) * 1e-30, None

            c, _ = jax.lax.scan(body, jnp.float32(0), idx_all)
            return c

        r["gather_scan_ms_per_step"] = chained_ms(
            gather_only, (idx_all, text_all, audio_all, emotion_all), iters=4) / N_STEPS

        def prestack(idx_all, t, a, e):
            flat = idx_all.reshape(-1)
            return (t[flat, :U].reshape(N_STEPS, B, U, D),
                    a[flat, :U].reshape(N_STEPS, B, U, D),
                    e[flat, :U].reshape(N_STEPS, B, U))

        r["prestack_once_ms"] = chained_ms(
            prestack, (idx_all, text_all, audio_all, emotion_all), iters=4)

        t_st, a_st, e_st = jax.jit(prestack)(idx_all, text_all, audio_all, emotion_all)

        def slice_only(t_st, a_st, e_st):
            def body(c, xs):
                t, a, e = xs
                return c + jnp.sum(t[..., 0]) * 1e-30, None

            c, _ = jax.lax.scan(body, jnp.float32(0), (t_st, a_st, e_st))
            return c

        r["slice_scan_ms_per_step"] = chained_ms(
            slice_only, (t_st, a_st, e_st), iters=4) / N_STEPS
        del text_all, audio_all, emotion_all, t_st, a_st, e_st

    # ---- 2. module regions at the step's activation shape ------------------
    common = dict(dtype=jnp.bfloat16, param_dtype=jnp.float32)

    def region(name, apply_fn, init_fn, x, array_rest, iters=50):
        """apply_fn(params, x, *array_rest) -> array; static flags (e.g.
        deterministic) must be baked into apply_fn, NOT passed as args —
        only arrays travel through jit."""
        params = init_fn(x, *array_rest)

        def fwd(x, params, *rest):
            return apply_fn(params, x, *rest)

        def fwdbwd(x, params, *rest):
            def loss_fn(p):
                out = apply_fn(p, x, *rest)
                return jnp.sum(out.astype(jnp.float32) ** 2) * 1e-6

            loss, grads = jax.value_and_grad(loss_fn)(params)
            return loss + sum(jnp.sum(g.astype(jnp.float32).ravel()[:1])
                           for g in jax.tree.leaves(grads)) * 1e-30

        r[f"{name}_fwd_ms"] = chained_ms(fwd, (x, params, *array_rest), iters)
        r[f"{name}_fwdbwd_ms"] = chained_ms(fwdbwd, (x, params, *array_rest), iters)

    if PART in ("all", "regions"):
        enc = TransformerEncoder(d_model=D, nhead=8, num_layers=6, dropout=0.4,
                                 scan_layers=True, **common)
        region(
            "enc6",
            lambda p, x, m: enc.apply({"params": p}, x, m, False, rngs={"dropout": key_rbg}),
            lambda x, m: enc.init({"params": jax.random.PRNGKey(0), "dropout": key_tf},
                                  x, m, False)["params"],
            text, (mask,))

        mha = MultiheadAttention(D, 8, dropout=0.4, **common)
        region(
            "mha1",
            lambda p, x, m: mha.apply({"params": p}, x, x, x, m, False,
                                      rngs={"dropout": key_rbg}),
            lambda x, m: mha.init({"params": jax.random.PRNGKey(0), "dropout": key_tf},
                                  x, x, x, m, False)["params"],
            text, (mask,))

        from flax import linen as nn

        class FFBlock(nn.Module):
            @nn.compact
            def __call__(self, x, deterministic=False):
                h = nn.Dense(2048, **common)(x)
                h = nn.Dropout(0.4, deterministic=deterministic)(nn.relu(h))
                h = nn.Dense(D, **common)(h)
                return nn.LayerNorm(dtype=jnp.bfloat16, param_dtype=jnp.float32)(x + h)

        ff = FFBlock()
        region(
            "ff1",
            lambda p, x: ff.apply({"params": p}, x, False, rngs={"dropout": key_rbg}),
            lambda x: ff.init({"params": jax.random.PRNGKey(0), "dropout": key_tf},
                              x, False)["params"],
            text, ())

    # ---- 3. full model / no-FAM / dropout and optimizer ablations ----------
    if PART in ("all", "model"):
        for name, kwargs in [("m2f_full", {}), ("m2f_nofam", {"fam_enabled": False})]:
            model = M2FNet(dtype=jnp.bfloat16, scan_layers=True, **kwargs)
            params = model.init({"params": jax.random.PRNGKey(0)}, text, audio, mask)["params"]

            def fwd(text, params, key, audio, mask):
                return model.apply({"params": params}, text, audio, mask,
                                   deterministic=False, rngs={"dropout": key})

            def fwd_nodrop(text, params, audio, mask):
                return model.apply({"params": params}, text, audio, mask, deterministic=True)

            def fwdbwd(text, params, key, audio, mask, emotion):
                def loss_fn(p):
                    logits = model.apply({"params": p}, text, audio, mask,
                                         deterministic=False, rngs={"dropout": key})
                    return cross_entropy(logits, emotion, label_smoothing=0.1, ignore_index=-1)

                loss, grads = jax.value_and_grad(loss_fn)(params)
                return loss + sum(jnp.sum(g.astype(jnp.float32).ravel()[:1])
                           for g in jax.tree.leaves(grads)) * 1e-30

            def fwdbwd_nodrop(text, params, audio, mask, emotion):
                def loss_fn(p):
                    logits = model.apply({"params": p}, text, audio, mask, deterministic=True)
                    return cross_entropy(logits, emotion, label_smoothing=0.1, ignore_index=-1)

                loss, grads = jax.value_and_grad(loss_fn)(params)
                return loss + sum(jnp.sum(g.astype(jnp.float32).ravel()[:1])
                           for g in jax.tree.leaves(grads)) * 1e-30

            it = 20
            r[f"{name}_fwd_ms"] = chained_ms(fwd, (text, params, key_rbg, audio, mask), it)
            r[f"{name}_fwdbwd_ms"] = chained_ms(
                fwdbwd, (text, params, key_rbg, audio, mask, emotion), it)
            if not kwargs:
                r["m2f_full_fwd_nodrop_ms"] = chained_ms(
                    fwd_nodrop, (text, params, audio, mask), it)
                r["m2f_full_fwd_threefry_ms"] = chained_ms(
                    fwd, (text, params, key_tf, audio, mask), it)
                r["m2f_full_fwdbwd_threefry_ms"] = chained_ms(
                    fwdbwd, (text, params, key_tf, audio, mask, emotion), it)
                r["m2f_full_fwdbwd_nodrop_ms"] = chained_ms(
                    fwdbwd_nodrop, (text, params, audio, mask, emotion), it)

                opt = torch_adam(5e-5, weight_decay=0.01)
                opt_state = opt.init(params)

                def adam_only(params, opt_state):
                    grads = jax.tree.map(lambda x: x * 1e-6, params)
                    updates, new_opt = opt.update(grads, opt_state, params)
                    return optax.apply_updates(params, updates)

                r["adam_update_ms"] = chained_ms(adam_only, (params, opt_state), iters=10)

    # ---- 4. dropout mask generation + apply at the step's mask volume ------
    if PART in ("all", "dropout"):
        big = jnp.asarray(rng.normal(size=(B, U, 2048)).astype(np.float32))

        def drop_many(x, key, n=17):
            out = x
            for i in range(n):
                k = jax.random.fold_in(key, i)
                keep = jax.random.bernoulli(k, 0.6, out.shape)
                out = jnp.where(keep, out / 0.6, 0.0)
            return out

        r["dropout17x_bU2048_rbg_ms"] = chained_ms(drop_many, (big, key_rbg))
        r["dropout17x_bU2048_threefry_ms"] = chained_ms(drop_many, (big, key_tf))

        logits = jnp.asarray(rng.normal(size=(B, U, 7)).astype(np.float32))
        r["ce_loss_fwd_ms"] = chained_ms(
            lambda l, e: cross_entropy(l, e, label_smoothing=0.1, ignore_index=-1),
            (logits, emotion))

    out = {k: (round(v, 3) if isinstance(v, float) else v) for k, v in r.items()}
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
