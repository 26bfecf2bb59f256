"""wav2vec2 embedding export — parity with the reference
audio_wav2vec2/embeddings.py: load the fine-tuned checkpoint, run the bare
encoder with masked mean pooling over valid frames, export
embeddings/audio_wav2vec2/{mode}.pkl float32 [N, 768] tables."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

import jax
import jax.numpy as jnp

from fe_common import (
    REPO_ROOT, export_embedding_table, load_wav2vec2_model, parse_args,
    scanned_export_table,
)

from mer_tpu.core import load_config, save_embeddings
from mer_tpu.data import Wav2Vec2Batcher, Wav2Vec2FeatureDataset
from mer_tpu.data.wav2vec2_fe import w2v_batch_to_inputs
from mer_tpu.models.wav2vec2 import AudioERC
from mer_tpu.train import load_checkpoint_auto
from mer_tpu.train.checkpoint import restore_into

CONFIG = os.path.join(REPO_ROOT, "src", "feature_extractors", "audio_wav2vec2", "config.yaml")


def main(argv=None, save_dir: str = "embeddings/audio_wav2vec2"):
    args = parse_args(argv, default_config=CONFIG)
    config = load_config(args.config)

    model, pretrained = load_wav2vec2_model(args, config=config)

    ds0 = Wav2Vec2FeatureDataset("val", data_root=args.data_root)
    dl0 = Wav2Vec2Batcher(ds0, 4)
    example = next(iter(dl0))
    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(example["audio"]), jnp.asarray(example["lengths"])
    )["params"]

    ckpt_path = os.path.abspath(str(config.checkpoint.save_path))
    if os.path.exists(ckpt_path):
        restored = load_checkpoint_auto(ckpt_path)
        params = restore_into(params, restored["params"])
        print(f"Loaded fine-tuned checkpoint {ckpt_path}")
    elif pretrained is not None:
        params["wav2vec2"] = restore_into(params["wav2vec2"], pretrained)
        print("Checkpoint not found; exporting with pretrained backbone")
    else:
        raise ValueError("Checkpoint not found")

    def _norm(audio):
        return audio.astype("float32") / 32768.0 if str(audio.dtype) == "int16" else audio

    if args.int8:
        from mer_tpu.serving import Wav2Vec2Int8, quantize_wav2vec2

        params = jax.device_put(quantize_wav2vec2(params))
        server = Wav2Vec2Int8(model)
        embed = jax.jit(lambda p, audio, lengths: server.embed(p, _norm(audio), lengths))
        print("int8 serving engine enabled")
    else:
        params = jax.device_put(params)  # avoid per-call transfer of numpy trees
        embed = jax.jit(
            lambda p, audio, lengths: model.apply({"params": p}, _norm(audio), lengths, method=AudioERC.embed)
        )

    for mode in ["train", "val", "test"]:
        ds = Wav2Vec2FeatureDataset(mode, data_root=args.data_root)
        dl = Wav2Vec2Batcher(ds, 32)
        print(f"Saving {mode} embeddings...")
        if args.per_batch_export:
            batches = []
            for b in dl:
                emb = embed(params, jnp.asarray(b["audio"]), jnp.asarray(b["lengths"]))
                valid = b["emotion"] != -1
                batches.append((b["idx"][valid], np.asarray(emb)[valid]))
            table = export_embedding_table(batches, len(ds), model.cfg.hidden_size)
        else:
            table = scanned_export_table(
                embed, params, dl, ("audio", "lengths"), len(ds), model.cfg.hidden_size
            )
        out = os.path.join(os.path.abspath(save_dir), f"{mode}.pkl")
        save_embeddings(out, table)
        print(f"Saved {mode} embeddings to {out}")


if __name__ == "__main__":
    main()
