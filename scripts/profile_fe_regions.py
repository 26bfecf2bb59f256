"""Per-region decomposition of the FE fine-tune train steps (VERDICT r4 #3).

BENCH_LOCAL r4: roberta_finetune_tuned 25.2% MFU (b32 x 256 tokens, bf16),
wav2vec2_finetune_tuned 25.7% (b16 x 10 s, remat) — while their export
forwards reach 56.5% / 39.5%. This measures where the backward+optimizer
side goes:

  RoBERTa (b32, s256):
    - fwd eval / fwd with dropout (rbg vs threefry)
    - fwd+bwd without dropout / with dropout / full step (AdamW)
    - AdamW update alone (125M params, 7 f32 HBM passes)
    - embedding-table gather fwd + scatter-add bwd ([50265, 768])
    - attention region per layer at (32,12,256,64) bf16: XLA reference
      with/without prob dropout, fwd and fwd+bwd; pallas flash (no dropout)
  wav2vec2 (b16, 10 s):
    - conv frontend fwd / fwd+bwd; full fwd+bwd with and without remat

Device-chained scan timing; every array operand is a jit ARGUMENT
(closed-over param trees are the HTTP-413 oversized-program failure,
CLAUDE.md gotcha 3). ``harness_floor_ms`` calibrates the per-iteration
dispatch+fetch inflation. Reference hot loops:
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


def chained_ms(fn, args, iters=20):
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
    float(many(first, *rest))
    t0 = time.perf_counter()
    float(many(first, *rest))
    return (time.perf_counter() - t0) / iters * 1e3


def gradsum(loss, grads):
    """Consume EVERY gradient leaf (first element each): touching only one
    leaf lets XLA dead-code-eliminate the rest of the backward — measured
    r5, a 'fwd+bwd' region with a single-leaf anchor timed barely above the
    forward because most of the bwd was DCE'd."""
    s = sum(jnp.sum(g.astype(jnp.float32).ravel()[:1]) for g in jax.tree.leaves(grads))
    return loss + s * 1e-30


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

    r["harness_floor_ms"] = chained_ms(lambda x: x * 1.0000001, (ids.astype(jnp.float32),))

    def fwd_eval(ids, params, am):
        return model.apply({"params": params}, ids, am, deterministic=True)

    def fwd_drop(ids, params, key, am):
        return model.apply({"params": params}, ids, am, deterministic=False,
                           rngs={"dropout": key})

    def fwdbwd_nodrop(ids, params, am, emotion):
        def loss_fn(p):
            logits = model.apply({"params": p}, ids, am, deterministic=True)
            return cross_entropy(logits, emotion)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        return gradsum(loss, grads)

    def fwdbwd_drop(ids, params, key, am, emotion):
        def loss_fn(p):
            logits = model.apply({"params": p}, ids, am, deterministic=False,
                                 rngs={"dropout": key})
            return cross_entropy(logits, emotion)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        return gradsum(loss, grads)

    r["roberta_fwd_eval_ms"] = chained_ms(fwd_eval, (ids, params, am))
    r["roberta_fwd_dropout_rbg_ms"] = chained_ms(fwd_drop, (ids, params, key, am))
    r["roberta_fwd_dropout_threefry_ms"] = chained_ms(fwd_drop, (ids, params, key_tf, am))
    r["roberta_fwdbwd_nodrop_ms"] = chained_ms(fwdbwd_nodrop, (ids, params, am, emotion), iters=10)
    r["roberta_fwdbwd_dropout_ms"] = chained_ms(fwdbwd_drop, (ids, params, key, am, emotion), iters=10)

    import optax

    opt = torch_adamw(2e-6, weight_decay=0.01)
    opt_state = opt.init(params)

    def adamw_only(params, opt_state):
        grads = jax.tree.map(lambda x: x * 1e-6, params)
        updates, new_opt = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates)

    r["roberta_adamw_ms"] = chained_ms(adamw_only, (params, opt_state), iters=10)

    # full production step (fwd+bwd+AdamW), host-loop chained like FESolver
    def full_step(params, opt_state, ids, am, emotion):
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
    p, s, loss = jstep(p, s, ids, am, emotion)
    np.asarray(loss).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(10):
        p, s, loss = jstep(p, s, ids, am, emotion)
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

    r["roberta_embed_gather_scatter_ms"] = chained_ms(embed_fwdbwd, (ids, table))

    # attention region, one layer's shape (bf16)
    from mer_tpu.ops.attention import _attention_reference
    from mer_tpu.ops.flash_attention import flash_attention

    q, k, v = (jnp.asarray(rng.normal(size=(B, 12, S, 64)).astype(np.float32)).astype(jnp.bfloat16)
               for _ in range(3))
    mask = jnp.zeros((B, S), bool)

    def xla_attn_nodrop(q, k, v, mask):
        return _attention_reference(q, k, v, key_padding_mask=mask,
                                    dropout_rate=0.0, dropout_rng=None, deterministic=True)

    def xla_attn_drop(q, key, k, v, mask):
        return _attention_reference(q, k, v, key_padding_mask=mask,
                                    dropout_rate=0.1, dropout_rng=key, deterministic=False)

    def make_fwdbwd(attn):
        def f(q, *rest):
            def loss_fn(args):
                return jnp.sum(attn(*args).astype(jnp.float32) ** 2) * 1e-6

            g = jax.grad(loss_fn)((q, *rest))
            # consume every input grad — anchoring only dq DCEs dk/dv
            return sum(jnp.sum(x.astype(jnp.float32).ravel()[:8]) for x in g)

        return f

    r["attn_xla_nodrop_fwd_ms"] = chained_ms(xla_attn_nodrop, (q, k, v, mask))
    r["attn_xla_drop_fwd_ms"] = chained_ms(
        lambda q, k, v, mask: xla_attn_drop(q, key, k, v, mask), (q, k, v, mask))
    r["attn_xla_nodrop_fwdbwd_ms"] = chained_ms(
        make_fwdbwd(lambda q, k, v: xla_attn_nodrop(q, k, v, mask)), (q, k, v))
    r["attn_xla_drop_fwdbwd_ms"] = chained_ms(
        make_fwdbwd(lambda q, k, v: xla_attn_drop(q, key, k, v, mask)), (q, k, v))
    r["attn_pallas_fwdbwd_ms"] = chained_ms(
        make_fwdbwd(lambda q, k, v: flash_attention(q, k, v, key_padding_mask=mask)),
        (q, k, v))
    seed = jnp.asarray([11, 22], jnp.int32)
    r["attn_pallas_drop_fwdbwd_ms"] = chained_ms(
        make_fwdbwd(lambda q, k, v: flash_attention(
            q, k, v, key_padding_mask=mask, dropout_rate=0.1, dropout_seed=seed)),
        (q, k, v))


def profile_wav2vec2():
    from mer_tpu.models.wav2vec2 import AudioERC, ConvFeatureExtractor, Wav2Vec2Config
    from mer_tpu.objectives.classification import cross_entropy

    B, T = 16, 160000
    rng = np.random.default_rng(0)
    waves = jnp.asarray((rng.normal(size=(B, T)) * 0.1).astype(np.float32))
    lens = jnp.full((B,), T, jnp.int32)
    emotion = jnp.asarray(rng.integers(0, 7, size=(B,)).astype(np.int32))
    key = jax.random.key(1, impl="rbg")

    # conv frontend region (standalone module, same dtype)
    conv = ConvFeatureExtractor(Wav2Vec2Config.base(), dtype=jnp.bfloat16)
    cparams = conv.init(jax.random.PRNGKey(0), waves)["params"]

    def conv_fwd(waves, cparams):
        return conv.apply({"params": cparams}, waves)

    def conv_fwdbwd(waves, cparams):
        def loss_fn(p):
            feats = conv.apply({"params": p}, waves)
            return jnp.sum(feats.astype(jnp.float32) ** 2) * 1e-9

        loss, grads = jax.value_and_grad(loss_fn)(cparams)
        return gradsum(loss, grads)

    r["w2v_conv_fwd_ms"] = chained_ms(conv_fwd, (waves, cparams), iters=5)
    r["w2v_conv_fwdbwd_ms"] = chained_ms(conv_fwdbwd, (waves, cparams), iters=5)

    for remat_label, remat in [("remat", True), ("noremat", False)]:
        model = AudioERC(Wav2Vec2Config.base(), dtype=jnp.bfloat16,
                         scan_layers=True, remat=remat)
        try:
            params = model.init({"params": jax.random.PRNGKey(0)}, waves, lens)["params"]

            def fwdbwd(waves, params, key, lens, emotion):
                def loss_fn(p):
                    logits = model.apply({"params": p}, waves, lens, deterministic=False,
                                         rngs={"dropout": key})
                    return cross_entropy(logits, emotion)

                loss, grads = jax.value_and_grad(loss_fn)(params)
                return gradsum(loss, grads)

            r[f"w2v_fwdbwd_dropout_{remat_label}_ms"] = chained_ms(
                fwdbwd, (waves, params, key, lens, emotion), iters=5)
            if remat:
                def fwd_drop(waves, params, key, lens):
                    return model.apply({"params": params}, waves, lens, deterministic=False,
                                       rngs={"dropout": key})

                def fwd_eval(waves, params, lens):
                    return model.apply({"params": params}, waves, lens, deterministic=True)

                r["w2v_fwd_eval_ms"] = chained_ms(fwd_eval, (waves, params, lens), iters=5)
                r["w2v_fwd_dropout_ms"] = chained_ms(fwd_drop, (waves, params, key, lens), iters=5)
        except Exception as e:
            r[f"w2v_{remat_label}_error"] = str(e)[:200]
            continue


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("roberta", "both"):
        profile_roberta()
    if which in ("wav2vec2", "both"):
        profile_wav2vec2()
    print("FINAL " + json.dumps({k: round(v, 3) if isinstance(v, float) else v
                                 for k, v in r.items()}), flush=True)


if __name__ == "__main__":
    main()
