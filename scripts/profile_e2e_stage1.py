"""Attribute e2e stage 1 on the real chip, phase by phase.

Answers two round-5 questions with one run:
  1. What does the coalesced upload (pipelines/e2e.py::_upload_coalesced)
     actually buy end-to-end vs the per-stack device_put loop?
  2. Where does ``stage1_device_wait_s`` go — per (modality, shape-group)
     scan wall and utt/s, so the wait can be checked against each bucket's
     own rate instead of a single component-row rate measured at one shape
     (the VERDICT-r4 "~1.5x unexplained" was exactly that shape mismatch).

Usage: python scripts/profile_e2e_stage1.py [data_root] [--no-coalesce]
       (data_root defaults to /tmp/meldbig_meldshape; needs the TPU)
"""

import os
import sys
import time

import numpy as np

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)
sys.path.insert(0, os.path.join(REPO_ROOT, "src"))
import mer_tpu  # noqa: F401  (compile cache)

import jax


def main():
    argv = [a for a in sys.argv[1:]]
    coalesce = "--no-coalesce" not in argv
    argv = [a for a in argv if not a.startswith("--")]
    data_root = argv[0] if argv else "/tmp/meldbig_meldshape"

    import jax.numpy as jnp

    from mer_tpu.core.config import load_config
    from mer_tpu.data.text_fe import TextFeatureDataset, ToyWhitespaceTokenizer
    from mer_tpu.data.wav2vec2_fe import Wav2Vec2FeatureDataset
    from mer_tpu.models.m2fnet import M2FNet
    from mer_tpu.models.roberta import RobertaConfig, TextERC
    from mer_tpu.models.wav2vec2 import AudioERC, Wav2Vec2Config
    from mer_tpu.pipelines.e2e import E2EModels, StreamingPipeline, mixed_utterance_batches

    tok = ToyWhitespaceTokenizer()
    text_ds = TextFeatureDataset("test", tok, data_root=data_root)
    w2v_ds = Wav2Vec2FeatureDataset("test", data_root=data_root)

    # random-init bf16 models at the production shapes (src/e2e_stream.py:102-135)
    fusion_cfg = load_config(os.path.join(REPO_ROOT, "src", "config.yaml"))
    dtype = jnp.bfloat16
    rng = jax.random.PRNGKey(0)
    text_model = TextERC(RobertaConfig.base(), dtype=dtype, scan_layers=True)
    text_params = text_model.init(rng, jnp.zeros((2, 16), jnp.int32),
                                  jnp.ones((2, 16), jnp.int32))["params"]
    audio_model = AudioERC(Wav2Vec2Config.base(), dtype=dtype, scan_layers=True)
    audio_params = audio_model.init(rng, jnp.zeros((2, 16000)),
                                    jnp.full((2,), 16000))["params"]
    fusion_model = M2FNet.from_config(fusion_cfg.model, dtype=dtype, scan_layers=True)
    fusion_params = fusion_model.init(
        rng, jnp.zeros((2, 4, 768)), jnp.zeros((2, 4, 768)), jnp.zeros((2, 4), bool)
    )["params"]
    pipeline = StreamingPipeline(
        E2EModels(text_model, text_params, audio_model, audio_params,
                  fusion_model, fusion_params),
        utterance_batch=32,
        dialogue_batch=int(fusion_cfg.test.data_loader.batch_size),
        coalesce_h2d=coalesce)

    t0 = time.perf_counter()
    host = list(mixed_utterance_batches(text_ds, w2v_ds, batch_size=32,
                                        sort_by_length=True))
    host_s = time.perf_counter() - t0
    n_utt = sum(int((b["emotion"] != -1).sum()) for b in host)
    print(f"host prep {host_s:.3f}s  ({len(host)} batches, {n_utt} utterances, "
          f"coalesce={coalesce})")

    modalities = [
        ("t", ("text", "attention_mask"), pipeline._text_embed_scan_fn,
         pipeline.m.text_params),
        ("a", ("audio", "lengths"), pipeline._audio_embed_scan_fn,
         pipeline.m.audio_params),
    ]

    # --- upload phase, isolated -----------------------------------------
    t0 = time.perf_counter()
    if coalesce:
        plans, h2d_bytes = pipeline._upload_coalesced(host, modalities)
    else:
        plans, h2d_bytes = [], 0
        for _, keys, scan_fn, params in modalities:
            groups = {}
            for i, b in enumerate(host):
                sig = tuple(np.shape(b[k]) for k in keys)
                groups.setdefault(sig, []).append(i)
            uploaded = []
            for idxs in groups.values():
                stacks = tuple(np.stack([host[i][k] for i in idxs]) for k in keys)
                h2d_bytes += sum(s.nbytes for s in stacks)
                uploaded.append((idxs, tuple(jax.device_put(s) for s in stacks)))
            plans.append((scan_fn, params, uploaded))
    enqueue_s = time.perf_counter() - t0
    jax.block_until_ready([d for _, _, up in plans for _, st in up for d in st])
    upload_s = time.perf_counter() - t0
    print(f"upload enqueue {enqueue_s:.3f}s  ready {upload_s:.3f}s  "
          f"({h2d_bytes / 1e6:.0f} MB, {h2d_bytes / 1e6 / upload_s:.0f} MB/s)")

    # --- per-group scan wall (warm) --------------------------------------
    # compile pass first so the per-group numbers are execution, not compile
    for name, plan in zip("ta", plans):
        scan_fn, params, uploaded = plan
        outs = [scan_fn(params, *st) for _, st in uploaded]
        jax.block_until_ready(outs)

    total_dev = 0.0
    for name, plan in zip("ta", plans):
        scan_fn, params, uploaded = plan
        for idxs, st in uploaded:
            g = st[0].shape[0]
            bsz = st[0].shape[1]
            width = st[0].shape[2] if st[0].ndim > 2 else 0
            t0 = time.perf_counter()
            jax.block_until_ready(scan_fn(params, *st))
            dt = time.perf_counter() - t0
            total_dev += dt
            print(f"  [{name}] group G={g:3d} B={bsz} width={width:6d}: "
                  f"{dt * 1e3:8.1f} ms  ({g * bsz / dt:7.0f} rows/s)")
    print(f"scan wall (sum of warm per-group runs) {total_dev:.3f}s  "
          f"-> stage1 ~= {upload_s + total_dev:.3f}s + host {host_s:.3f}s")


if __name__ == "__main__":
    main()
