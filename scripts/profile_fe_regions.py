"""Per-region decomposition of the FE fine-tune train steps (VERDICT r4 #3).

BENCH_LOCAL r4: roberta_finetune_tuned 25.2% MFU (b32 x 256 tokens, bf16),
wav2vec2_finetune_tuned 25.7% (b16 x 10 s, remat) — while their export
forwards reach 56.5% / 39.5%. This measures where the backward+optimizer
side goes:

  RoBERTa (b32, s256):
    - fwd eval / fwd with dropout (rbg)
    - fwd+bwd without dropout / with dropout / full step (AdamW)
    - AdamW update alone (125M params, 7 f32 HBM passes)
    - embedding-table gather+scatter region (50k x 768 table)
    - attention region per layer: XLA reference fwd+bwd at (32,12,256,64),
      bf16, with and without prob dropout; pallas flash fwd+bwd (no dropout)
  wav2vec2 (b16, 10 s, remat dots_no_batch vs full):
    - conv frontend fwd / fwd+bwd
    - encoder fwd+bwd at (16, 499) with/without remat
    - full step

Device-chained scan timing throughout. Reference hot loops:
src/feature_extractors/text/train.py:211-227,
src/feature_extractors/audio_wav2vec2/model.py:19-29.

Usage: python scripts/profile_fe_regions.py [roberta|wav2vec2|both]
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

class _Progress(dict):
    def __setitem__(self, k, v):
        super().__setitem__(k, v)
        print(f"  {k} = {round(v, 3) if isinstance(v, float) else v}",
              file=sys.stderr, flush=True)


r: dict = _Progress()


def chained_ms(fn, args, iters=10):
    first, rest = args[0], args[1:]

    @jax.jit
    def many(first, *rest):
        def body(c, _):
            perturb = lambda x: x + (c * 1e-30).astype(x.dtype)
            out = fn(jax.tree.map(perturb, first), *rest)
            leaf = jax.tree.leaves(out)[0]
            return jnp.sum(leaf.astype(jnp.float32)) * 1e-30, None

        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=iters)
        return c

    float(many(first, *rest))
    t0 = time.perf_counter()
    float(many(first, *rest))
    return (time.perf_counter() - t0) / iters * 1e3


def loss_and_gradsum(loss_fn, params):
    loss, grads = jax.value_and_grad(loss_fn)(params)
    return loss + jnp.sum(jax.tree.leaves(grads)[0].astype(jnp.float32).ravel()[:1]) * 1e-30


def profile_roberta():
    from mer_tpu.models.roberta import RobertaConfig, TextERC
    from mer_tpu.objectives.classification import cross_entropy
    from mer_tpu.train.solver import torch_adamw

    B, S = 32, 256
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(2, 50000, size=(B, S)).astype(np.int32))
    am = jnp.ones((B, S), jnp.int32)
    emotion = jnp.asarray(rng.integers(0, 7, size=(B,)).astype(np.int32))
    key = jax.random.key(1, impl="rbg")
    key_tf = jax.random.key(1, impl="threefry2x32")

    model = TextERC(RobertaConfig.base(), dtype=jnp.bfloat16, scan_layers=True)
    params = model.init({"params": jax.random.PRNGKey(0)}, ids, am)["params"]

    def fwd_eval(ids, params):
        return model.apply({"params": params}, ids, am, deterministic=True)

    def fwd_drop(ids, params, key):
        return model.apply({"params": params}, ids, am, deterministic=False,
                           rngs={"dropout": key})

    def make_fwdbwd(deterministic, key):
        def f(ids, params):
            def loss_fn(p):
                logits = model.apply(
                    {"params": p}, ids, am, deterministic=deterministic,
                    rngs=None if deterministic else {"dropout": key})
                return cross_entropy(logits, emotion)

            return loss_and_gradsum(loss_fn, params)

        return f

    r["roberta_fwd_eval_ms"] = chained_ms(lambda i: fwd_eval(i, params), (ids,))
    r["roberta_fwd_dropout_rbg_ms"] = chained_ms(lambda i: fwd_drop(i, params, key), (ids,))
    r["roberta_fwd_dropout_threefry_ms"] = chained_ms(lambda i: fwd_drop(i, params, key_tf), (ids,))
    r["roberta_fwdbwd_nodrop_ms"] = chained_ms(make_fwdbwd(True, key), (ids, params))
    r["roberta_fwdbwd_dropout_ms"] = chained_ms(make_fwdbwd(False, key), (ids, params))

    # AdamW alone over the full tree
    opt = torch_adamw(2e-6, weight_decay=0.01)
    opt_state = opt.init(params)

    def adamw_only(params, opt_state):
        import optax

        grads = jax.tree.map(lambda x: x * 1e-6, params)
        updates, new_opt = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates)

    r["roberta_adamw_ms"] = chained_ms(lambda p: adamw_only(p, opt_state), (params,))

    # full production step (value_and_grad + AdamW, like FESolver._step_finetune)
    def full_step(params, opt_state, ids):
        import optax

        def loss_fn(p):
            logits = model.apply({"params": p}, ids, am, deterministic=False,
                                 rngs={"dropout": key})
            return cross_entropy(logits, emotion)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, new_opt = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_opt, loss

    jstep = jax.jit(full_step, donate_argnums=(0, 1))
    p = jax.tree.map(jnp.copy, params)
    s = jax.tree.map(jnp.copy, opt_state)
    p, s, loss = jstep(p, s, ids)
    np.asarray(loss).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(10):
        p, s, loss = jstep(p, s, ids)
    np.asarray(loss).ravel()[:1]
    r["roberta_full_step_ms"] = (time.perf_counter() - t0) / 10 * 1e3
    del p, s

    # embedding region: gather fwd + scatter-add bwd over the [50265, 768] table
    table = jnp.asarray(rng.normal(size=(50265, 768)).astype(np.float32))

    def embed_fwdbwd(ids, table):
        def loss_fn(t):
            return jnp.sum(t[ids].astype(jnp.float32) ** 2) * 1e-9

        g = jax.grad(loss_fn)(table)
        return jnp.sum(g.ravel()[:8])

    r["roberta_embed_gather_scatter_ms"] = chained_ms(lambda i: embed_fwdbwd(i, table), (ids,))

    # attention region, one layer's shape (bf16)
    from mer_tpu.ops.attention import _attention_reference
    from mer_tpu.ops.flash_attention import flash_attention

    q, k, v = (jnp.asarray(rng.normal(size=(B, 12, S, 64)).astype(np.float32)).astype(jnp.bfloat16)
               for _ in range(3))
    mask = jnp.zeros((B, S), bool)

    def xla_attn(q, k, v, dropout):
        return _attention_reference(
            q, k, v, key_padding_mask=mask,
            dropout_rate=0.1 if dropout else 0.0,
            dropout_rng=key if dropout else None, deterministic=not dropout)

    def attn_fwdbwd(attn_fn):
        def f(q, k, v):
            def loss_fn(args):
                return jnp.sum(attn_fn(*args).astype(jnp.float32) ** 2) * 1e-6

            g = jax.grad(loss_fn)((q, k, v))
            return jnp.sum(g[0].astype(jnp.float32).ravel()[:8])

        return f

    r["attn_xla_nodrop_fwd_ms"] = chained_ms(lambda q: xla_attn(q, k, v, False), (q,))
    r["attn_xla_drop_fwd_ms"] = chained_ms(lambda q: xla_attn(q, k, v, True), (q,))
    r["attn_xla_nodrop_fwdbwd_ms"] = chained_ms(
        attn_fwdbwd(lambda q, k, v: xla_attn(q, k, v, False)), (q, k, v))
    r["attn_xla_drop_fwdbwd_ms"] = chained_ms(
        attn_fwdbwd(lambda q, k, v: xla_attn(q, k, v, True)), (q, k, v))
    r["attn_pallas_fwdbwd_ms"] = chained_ms(
        attn_fwdbwd(lambda q, k, v: flash_attention(q, k, v, key_padding_mask=mask)),
        (q, k, v))


def profile_wav2vec2():
    from mer_tpu.models.wav2vec2 import AudioERC, Wav2Vec2Config
    from mer_tpu.objectives.classification import cross_entropy

    B, T = 16, 160000
    rng = np.random.default_rng(0)
    waves = jnp.asarray((rng.normal(size=(B, T)) * 0.1).astype(np.float32))
    lens = jnp.full((B,), T, jnp.int32)
    emotion = jnp.asarray(rng.integers(0, 7, size=(B,)).astype(np.int32))
    key = jax.random.key(1, impl="rbg")

    for remat_label, remat in [("remat", True), ("noremat", False)]:
        model = AudioERC(Wav2Vec2Config.base(), dtype=jnp.bfloat16,
                         scan_layers=True, remat=remat)
        try:
            params = model.init({"params": jax.random.PRNGKey(0)}, waves, lens)["params"]

            def fwdbwd(waves, params):
                def loss_fn(p):
                    logits = model.apply({"params": p}, waves, lens, deterministic=False,
                                         rngs={"dropout": key})
                    return cross_entropy(logits, emotion)

                return loss_and_gradsum(loss_fn, params)

            r[f"w2v_fwdbwd_dropout_{remat_label}_ms"] = chained_ms(
                fwdbwd, (waves, params), iters=5)
            if remat:
                def fwd_drop(waves, params):
                    return model.apply({"params": params}, waves, lens, deterministic=False,
                                       rngs={"dropout": key})

                def fwd_eval(waves, params):
                    return model.apply({"params": params}, waves, lens, deterministic=True)

                r["w2v_fwd_eval_ms"] = chained_ms(lambda w: fwd_eval(w, params), (waves,), iters=5)
                r["w2v_fwd_dropout_ms"] = chained_ms(lambda w: fwd_drop(w, params), (waves,), iters=5)

                # conv frontend region (standalone module, same dtype)
                from mer_tpu.models.wav2vec2 import ConvFeatureExtractor

                conv = ConvFeatureExtractor(Wav2Vec2Config.base(), dtype=jnp.bfloat16)
                cparams = conv.init(jax.random.PRNGKey(0), waves)["params"]

                def conv_fwdbwd(waves, cparams):
                    def loss_fn(p):
                        feats = conv.apply({"params": p}, waves)
                        return jnp.sum(feats.astype(jnp.float32) ** 2) * 1e-9

                    return loss_and_gradsum(loss_fn, cparams)

                try:
                    r["w2v_conv_fwd_ms"] = chained_ms(
                        lambda w: conv.apply({"params": cparams}, w), (waves,), iters=5)
                    r["w2v_conv_fwdbwd_ms"] = chained_ms(conv_fwdbwd, (waves, cparams), iters=5)
                except Exception as e:
                    r["w2v_conv_fwdbwd_error"] = str(e)[:200]
        except Exception as e:
            r[f"w2v_{remat_label}_error"] = str(e)[:200]
            continue


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("roberta", "both"):
        profile_roberta()
        print(json.dumps({k: round(v, 3) if isinstance(v, float) else v
                          for k, v in r.items()}), flush=True)
    if which in ("wav2vec2", "both"):
        profile_wav2vec2()
    print("FINAL " + json.dumps({k: round(v, 3) if isinstance(v, float) else v
                                 for k, v in r.items()}), flush=True)


if __name__ == "__main__":
    main()
