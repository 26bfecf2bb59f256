"""Shared wiring for the feature-extractor entry points.

Each pipeline keeps the reference's invocation surface
(``python src/feature_extractors/<name>/train.py`` from the repo root, same
config files).  Pretrained backbone weights (roberta-base / wav2vec2-base)
are imported from HF torch checkpoints when available locally; ``--random-init``
gives a smoke-runnable path without them.
"""

from __future__ import annotations

import argparse
import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)


def parse_args(argv=None, default_config: str | None = None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", default=default_config)
    p.add_argument("--data-root", default=None)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--random-init", action="store_true",
                   help="skip pretrained backbone import (smoke runs)")
    p.add_argument("--toy-tokenizer", action="store_true",
                   help="text pipeline: hash tokenizer instead of HF RoBERTa vocab")
    p.add_argument("--pretrained", default=None,
                   help="HF model name or local path for the backbone weights")
    p.add_argument("--variant", default=None,
                   help="text pipeline: roberta-base (default) or roberta-large")
    p.add_argument("--int8", action="store_true",
                   help="embedding export: int8 serving engine (mer_tpu/serving) "
                        "— 4x less weight HBM traffic than f32")
    p.add_argument("--per-batch-export", action="store_true",
                   help="embedding export: one dispatch+fetch per batch (the "
                        "reference's loop shape) instead of the scan-grouped "
                        "default (one dispatch per shape bucket, one fetch "
                        "total — see fe_common.scanned_export_table)")
    p.add_argument("--bf16", action="store_true",
                   help="force bf16 compute (f32 params/optimizer, f32 softmax/"
                        "LN stats) for the model forward/backward — 2x MXU rate; "
                        "without the flag the config's tpu.compute_dtype decides")
    p.add_argument("--f32", action="store_true",
                   help="force float32 compute (overrides config tpu.compute_dtype)")
    p.add_argument("--pp", type=int, default=1,
                   help="text/wav2vec2 fine-tune: pipeline-parallel stages "
                        "for the 12-layer encoder stack (GPipe over a "
                        "(dp, pp) mesh, parallel/pipeline.py); remaining "
                        "devices become dp. Requires scan_layers.")
    p.add_argument("--pp-microbatches", type=int, default=None,
                   help="microbatches per pipeline round (default: pp)")
    p.add_argument("--remat-policy", default=None, choices=["full", "dots", "dots_no_batch"],
                   help="with --remat: what the backward saves vs recomputes "
                        "(utils/remat.py; 'dots*' keeps MXU outputs and "
                        "recomputes only the elementwise chain)")
    p.add_argument("--remat", action="store_true",
                   help="text/wav2vec2 fine-tune: rematerialize each encoder "
                        "layer in the backward (activation memory ~1/L at the "
                        "cost of one extra forward)")
    p.add_argument("--zero1", action="store_true",
                   help="ZeRO-1: shard the Adam moments over the dp mesh axis "
                        "(sets tpu.zero1; cuts per-chip optimizer HBM to 1/dp — "
                        "see src/config.yaml and tests/test_zero1.py)")
    p.add_argument("--scan-layers", default="auto", choices=["auto", "true", "false"],
                   help="encoder layer-stack layout: 'false' = unrolled "
                        "per-layer submodules (the measured v5e training "
                        "default — the scanned stack's backward pays a "
                        "lax.scan overhead: RoBERTa fine-tune 40.7%% vs "
                        "33.7%% MFU, BENCH_LOCAL fe_train_layout), 'true' = "
                        "one nn.scan layer with [L, ...]-stacked params "
                        "(smaller compiled program; required by --pp). "
                        "'auto' = true when --pp > 1 or --remat, else false. "
                        "Checkpoints interchange across layouts "
                        "(models/layout.py via restore_into).")
    return p.parse_args(argv)


def resolve_scan_layers(args) -> bool:
    """Layer-stack layout for the FE backbones (see --scan-layers)."""
    flag = str(getattr(args, "scan_layers", "auto"))
    if flag in ("true", "false"):
        return flag == "true"
    # auto: --pp routes the stack through scanned_layer_pipeline (stacked
    # [L, ...] params); per-layer remat is likewise defined over the scan.
    return int(getattr(args, "pp", 1) or 1) > 1 or bool(getattr(args, "remat", False))


def resolve_compute_dtype(args, config=None):
    """Mixed-precision policy for the FE pipelines: bf16 *compute* with f32
    params and optimizer state (Flax ``dtype`` vs ``param_dtype``; LayerNorm
    statistics and the CE log-softmax stay f32 — objectives/classification.py
    upcasts logits).  ``--bf16``/``--f32`` force; otherwise the config's
    ``tpu.compute_dtype`` decides (the shipped FE configs default to bfloat16
    — the reference trains f32 only because torch-on-GPU made that the path
    of least resistance, text/train.py:221-224; on v5e the MXU runs bf16 at
    2x the f32 rate)."""
    import jax.numpy as jnp

    if getattr(args, "f32", False):
        return jnp.float32
    if getattr(args, "bf16", False):
        return jnp.bfloat16
    name = str(config.get_path("tpu.compute_dtype", "float32")) if config is not None else "float32"
    return jnp.bfloat16 if name in ("bfloat16", "bf16") else jnp.float32


def build_pp(args, model, kind: str):
    """``--pp N``: (mesh, pp_logits_fn) routing the model's scanned encoder
    stack through GPipe pipeline parallelism (parallel/pp_forward.py);
    remaining devices become the dp axis.  (None, None) when pp <= 1."""
    pp = int(getattr(args, "pp", 1) or 1)
    if pp <= 1:
        return None, None
    import jax

    from mer_tpu.parallel import audio_erc_logits_pp, make_pp_mesh, text_erc_logits_pp

    if not getattr(model, "scan_layers", False):
        raise ValueError("--pp requires scan_layers (stacked [L, ...] encoder params)")
    n = len(jax.devices())
    if n % pp:
        raise ValueError(f"--pp {pp} does not divide the {n} available devices")
    mesh = make_pp_mesh(pp=pp, dp=n // pp)
    mb = getattr(args, "pp_microbatches", None)
    # --remat composes with --pp; a named policy rides through as the remat
    # value (pipeline_apply: bool = full recompute, str = selective policy)
    remat = bool(getattr(args, "remat", False))
    policy = getattr(args, "remat_policy", None)
    if remat and policy and policy != "full":
        remat = policy
    cfg, dtype = model.cfg, model.dtype
    if kind == "text":
        def fn(params, input_ids, attention_mask, *, deterministic, rng):
            return text_erc_logits_pp(
                params, cfg, mesh, input_ids, attention_mask, dtype=dtype,
                deterministic=deterministic, rng=rng, microbatches=mb,
                batch_axis="dp", remat=remat)
    elif kind == "wav2vec2":
        def fn(params, waveforms, lengths, *, deterministic, rng):
            return audio_erc_logits_pp(
                params, cfg, mesh, waveforms, lengths, dtype=dtype,
                deterministic=deterministic, rng=rng, microbatches=mb,
                batch_axis="dp", remat=remat)
    else:
        raise ValueError(f"unknown pp kind {kind!r}")
    print(f"Pipeline parallelism: pp={pp} dp={n // pp} "
          f"(microbatches={mb if mb is not None else pp})")
    return mesh, fn


def load_text_model_and_tokenizer(args, variant: str | None = None, config=None):
    """TextERC + tokenizer; imports HF weights unless --random-init.

    Variant resolution order: --variant flag, config test.pretrained_model
    (the reference's knob, text/config.yaml), default roberta-base."""
    from mer_tpu.data.text_fe import ToyWhitespaceTokenizer, load_roberta_tokenizer
    from mer_tpu.models.roberta import RobertaConfig, TextERC, convert_hf_roberta

    variant = (
        getattr(args, "variant", None)
        or variant
        or (config.get_path("test.pretrained_model") if config is not None else None)
        or "roberta-base"
    )
    cfg = RobertaConfig.large() if "large" in variant else RobertaConfig.base()
    model = TextERC(
        cfg, dtype=resolve_compute_dtype(args, config),
        scan_layers=resolve_scan_layers(args), remat=bool(getattr(args, "remat", False)),
        remat_policy=getattr(args, "remat_policy", None),
    )

    tokenizer = (
        ToyWhitespaceTokenizer(vocab_size=cfg.vocab_size)
        if args.toy_tokenizer
        else load_roberta_tokenizer(args.pretrained or variant)
    )

    pretrained_params = None
    if not args.random_init:
        import transformers

        try:
            hf = transformers.RobertaModel.from_pretrained(args.pretrained or variant, add_pooling_layer=False)
        except Exception as e:  # loud, actionable failure (no silent random init)
            raise RuntimeError(
                f"pretrained backbone '{args.pretrained or variant}' is unavailable "
                "(this machine has no network egress and no HF cache). Stage the "
                "weights locally and pass --pretrained <path>, or run with "
                "--random-init for a smoke run — results will NOT match the "
                "reference's fine-tuned artifacts (text/model.py:16)."
            ) from e
        pretrained_params = convert_hf_roberta(hf.state_dict(), cfg, scan_layers=model.scan_layers)
    return model, tokenizer, pretrained_params


def load_wav2vec2_model(args, variant: str = "facebook/wav2vec2-base", config=None):
    from mer_tpu.models.wav2vec2 import AudioERC, Wav2Vec2Config, convert_hf_wav2vec2

    cfg = Wav2Vec2Config.base()
    model = AudioERC(
        cfg, dtype=resolve_compute_dtype(args, config),
        scan_layers=resolve_scan_layers(args), remat=bool(getattr(args, "remat", False)),
        remat_policy=getattr(args, "remat_policy", None),
    )
    pretrained_params = None
    if not args.random_init:
        import transformers

        try:
            hf = transformers.Wav2Vec2Model.from_pretrained(args.pretrained or variant)
        except Exception as e:  # loud, actionable failure (no silent random init)
            raise RuntimeError(
                f"pretrained backbone '{args.pretrained or variant}' is unavailable "
                "(this machine has no network egress and no HF cache). Stage the "
                "weights locally and pass --pretrained <path>, or run with "
                "--random-init for a smoke run — results will NOT match the "
                "reference's fine-tuned artifacts (audio_wav2vec2/model.py:9)."
            ) from e
        pretrained_params = convert_hf_wav2vec2(hf.state_dict(), cfg, scan_layers=model.scan_layers)
    return model, pretrained_params


def with_pretrained_backbone(solver, state: dict, backbone_key: str, pretrained_params):
    """Overwrite the backbone subtree of an initialized FE state with
    imported pretrained weights, preserving each leaf's device placement —
    restore_into returns host numpy, and dropping the template's sharding
    would ship the whole backbone unsharded through the first train step
    (and force a recompile when step 1's output comes back sharded)."""
    if pretrained_params is None:
        return state
    import jax

    from mer_tpu.train.checkpoint import restore_into

    template = state["params"][backbone_key]
    restored = restore_into(template, pretrained_params)
    state["params"][backbone_key] = jax.tree.map(
        lambda t, r: jax.device_put(r, t.sharding) if isinstance(t, jax.Array) else r,
        template, restored,
    )
    return state


def export_embedding_table(embed_batches, n_rows: int, dim: int):
    """Assemble [N, D] float32 from (row_indices, embeddings) batches —
    scatter semantics matching the reference exporters
    (text/embeddings.py:70,86-90)."""
    import numpy as np

    out = np.zeros((n_rows, dim), dtype=np.float32)
    for idx, emb in embed_batches:
        out[np.asarray(idx)] = np.asarray(emb)[: len(idx)]
    return out


def scanned_export_table(embed, params, batcher, keys, n_rows: int, dim: int):
    """Shape-grouped export: group the host batches by device shape, embed
    each group with ONE lax.scan dispatch over the [G, B, ...] stack, and
    fetch every group's embeddings in ONE device->host transfer.

    The reference export loops (text/embeddings.py:69-93,
    audio_wav2vec2/embeddings.py:68-94) dispatch and fetch per batch; on
    tunneled hosts each jit dispatch blocks ~25-30 ms and each fetch is a
    full round trip (BENCH fusion_latency_*_dispatch; CLAUDE.md gotcha 8),
    so a 300-utterance split pays ~10x the device time in host overhead.
    Grouping collapses that to one dispatch per token/length bucket — the
    same dispatch shape as the serving engines and the e2e pipeline
    (embed_utterances_scanned). Output is bit-identical to the per-batch
    loop: scan runs the same per-batch jit body.

    ``embed(params, *arrays)`` is the per-batch embed function; ``keys``
    the batch-dict keys forming its array arguments.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    def run_scan(p, *stacked):
        def body(carry, args):
            return carry, embed(p, *args)

        _, out = jax.lax.scan(body, None, stacked)
        return out

    scan_fn = jax.jit(run_scan)
    host = list(batcher)
    groups: dict[tuple, list] = {}
    for b in host:
        sig = tuple(np.shape(b[k]) for k in keys)
        groups.setdefault(sig, []).append(b)
    pending = []
    for bs in groups.values():
        stacked = tuple(jnp.asarray(np.stack([b[k] for b in bs])) for k in keys)
        pending.append((bs, scan_fn(params, *stacked)))  # [G, B, D], async
    fetched = jax.device_get([out for _, out in pending])  # ONE transfer
    batches = []
    for (bs, _), emb in zip(pending, fetched):
        for b, e in zip(bs, emb):
            valid = b["emotion"] != -1
            batches.append((b["idx"][valid], np.asarray(e)[valid]))
    return export_embedding_table(batches, n_rows, dim)
