"""End-to-end streaming inference entry point (BASELINE.json config 5):
wav (+ transcripts) -> on-device wav2vec2 + RoBERTa utterance embeddings ->
M2FNet fusion -> per-utterance emotion predictions, with no intermediate
artifacts on disk.

Checkpoints: loads the fusion checkpoint (src/config.yaml) and the FE
checkpoints when present; otherwise random-init (throughput-valid smoke mode).
"""

import argparse
import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

import numpy as np

import jax
import jax.numpy as jnp

from mer_tpu.core import get_text, load_config, map_emotions
from mer_tpu.data import TextFeatureDataset, ToyWhitespaceTokenizer, Wav2Vec2FeatureDataset
from mer_tpu.models.m2fnet import M2FNet
from mer_tpu.models.roberta import RobertaConfig, TextERC
from mer_tpu.models.wav2vec2 import AudioERC, Wav2Vec2Config
from mer_tpu.pipelines import E2EModels, StreamingPipeline, mixed_utterance_batches
from mer_tpu.train import load_checkpoint_auto
from mer_tpu.train.checkpoint import restore_into


def _maybe_load(params, path, subtree=None):
    if path and os.path.exists(path):
        restored = load_checkpoint_auto(path)["params"]
        if subtree:
            restored = restored.get(subtree, restored)
            params = restore_into(params, restored)
        else:
            params = restore_into(params, restored)
        print(f"loaded {path}")
    return params


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--mode", default="test")
    p.add_argument("--data-root", default=None)
    p.add_argument("--toy-tokenizer", action="store_true")
    p.add_argument("--utterance-batch", type=int, default=32)
    p.add_argument("--int8", action="store_true",
                   help="serve all three models through the int8 engines (mer_tpu/serving)")
    p.add_argument("--wire", choices=("int16", "mulaw"), default="int16",
                   help="waveform host->device wire format: int16 PCM (exact, "
                        "default) or uint8 mu-law (half the H2D bytes, lossy "
                        "~35-38 dB SNR; ops/mulaw.py)")
    p.add_argument("--corpus-order", action="store_true",
                   help="consume utterances in corpus order instead of the "
                        "length-sorted default (sorting packs batches into "
                        "tight duration buckets: 2.2x less audio compute and "
                        "H2D wire bytes at MELD-test shape)")
    p.add_argument("--no-coalesce", action="store_true",
                   help="upload stage-1 stacks with one device_put each instead "
                        "of the coalesced one-transfer-per-dtype default "
                        "(per-call overhead measured ~85 MB/s effective vs "
                        "~1.3 GB/s coalesced on tunneled hosts)")
    p.add_argument("--per-batch-stage1", action="store_true",
                   help="per-batch stage-1 dispatch (true-streaming shape) instead of "
                        "the scan-grouped offline default (one dispatch per shape group)")
    p.add_argument("--audio", default="wav2vec2", choices=("wav2vec2", "mel"),
                   help="audio embedder: wav2vec2 (768-d) or on-device log-mel -> "
                        "ResNet18 (300-d) — the reference's embeddings-dir switch "
                        "(src/config.yaml:6-8), streamed")
    args = p.parse_args(argv)

    fusion_cfg = load_config(os.path.join(REPO_ROOT, "src", "config.yaml"))
    if args.audio == "mel":
        # fusion consumes 300-d audio embeddings in this configuration
        # (AUDIO.embedding_size knob, reference src/config.yaml:33-38);
        # n_head must divide 300 — 6 heads of 50 (torch MHA enforces the
        # same constraint, so any reference run with the audio_mel dir
        # needed this change too)
        fusion_cfg = fusion_cfg.override(
            model__AUDIO__embedding_size=300, model__AUDIO__n_head=6
        )

    if args.toy_tokenizer:
        tokenizer = ToyWhitespaceTokenizer()
    else:
        from mer_tpu.data.text_fe import load_roberta_tokenizer

        tokenizer = load_roberta_tokenizer()

    text_ds = TextFeatureDataset(args.mode, tokenizer, data_root=args.data_root)
    w2v_ds = Wav2Vec2FeatureDataset(args.mode, data_root=args.data_root)
    df = map_emotions(get_text(args.mode, data_root=args.data_root))
    print(f"Loaded {len(text_ds)} utterances for {args.mode}")

    # scan_layers: one compiled layer per encoder instead of L inlined copies
    # — mandatory on remote-compile TPU setups (program size limits) and much
    # faster to compile everywhere.
    dtype = jnp.bfloat16
    text_model = TextERC(RobertaConfig.base(), dtype=dtype, scan_layers=True)
    fusion_model = M2FNet.from_config(fusion_cfg.model, dtype=dtype, scan_layers=True)

    rng = jax.random.PRNGKey(0)
    ids = jnp.zeros((2, 16), jnp.int32)
    mask = jnp.ones((2, 16), jnp.int32)
    text_params = text_model.init(rng, ids, mask)["params"]
    d_audio = 300 if args.audio == "mel" else 768

    audio_batch_stats = None
    if args.audio == "mel":
        from mer_tpu.models.resnet import AudioMelFeatureExtractor
        from mer_tpu.ops.logmel import MelConfig

        audio_model = AudioMelFeatureExtractor(dtype=dtype)
        mel_vars = audio_model.init(
            rng, jnp.zeros((2, MelConfig().max_frames, MelConfig().n_mels, 3))
        )
        audio_params, audio_batch_stats = mel_vars["params"], mel_vars["batch_stats"]
        mel_ckpt = os.path.abspath("checkpoints/audio_mel/checkpoint.ckpt")
        audio_params = _maybe_load(audio_params, mel_ckpt)
        if os.path.exists(mel_ckpt):
            restored = load_checkpoint_auto(mel_ckpt)
            if restored.get("extra", {}).get("batch_stats"):
                audio_batch_stats = restore_into(audio_batch_stats, restored["extra"]["batch_stats"])
    else:
        audio_model = AudioERC(Wav2Vec2Config.base(), dtype=dtype, scan_layers=True)
        audio_params = audio_model.init(rng, jnp.zeros((2, 16000)), jnp.full((2,), 16000))["params"]
        audio_params = _maybe_load(audio_params, os.path.abspath("checkpoints/audio_wav2vec2/checkpoint.ckpt"))

    fusion_params = fusion_model.init(
        rng, jnp.zeros((2, 4, 768)), jnp.zeros((2, 4, d_audio)), jnp.zeros((2, 4), bool)
    )["params"]

    text_params = _maybe_load(text_params, os.path.abspath("checkpoints/text/checkpoint.ckpt"))
    # the default fusion checkpoint is the 768-d (wav2vec2-audio) config; a
    # mel-variant fusion (300-d audio) needs its own checkpoint file
    fusion_ckpt = os.path.abspath(str(fusion_cfg.checkpoint.load_path))
    if args.audio == "mel":
        root, ext = os.path.splitext(fusion_ckpt)
        fusion_ckpt = f"{root}_mel{ext}"
    fusion_params = _maybe_load(fusion_params, fusion_ckpt)

    pipeline = StreamingPipeline(
        E2EModels(text_model, text_params, audio_model, audio_params, fusion_model, fusion_params,
                  audio_batch_stats=audio_batch_stats),
        utterance_batch=args.utterance_batch,
        dialogue_batch=int(fusion_cfg.test.data_loader.batch_size),
        engine="int8" if args.int8 else "bf16",
        wire=args.wire,
        coalesce_h2d=not args.no_coalesce,
    )

    sort = not args.corpus_order
    batches = mixed_utterance_batches(text_ds, w2v_ds, batch_size=args.utterance_batch,
                                      sort_by_length=sort, wire=args.wire)
    # warmup pass compiles every bucket shape, second pass is the timed run
    scan_stage1 = not args.per_batch_stage1
    pipeline.run(mixed_utterance_batches(text_ds, w2v_ds, batch_size=args.utterance_batch,
                                         sort_by_length=sort, wire=args.wire), df,
                 scan_stage1=scan_stage1)
    result = pipeline.run(batches, df, scan_stage1=scan_stage1)
    print(
        f"e2e streaming: {result['n_utterances']} utterances in {result['seconds']:.2f}s "
        f"({result['utterances_per_sec']:.1f} utt/s) "
        f"Accuracy=[{result['accuracy'] * 100:.3f}%] Weighted_F1=[{result['weighted_f1'] * 100:.3f}%]"
    )
    import json as _json

    print(f"e2e stages: {_json.dumps(result['stages'])}")
    return result


if __name__ == "__main__":
    main()
