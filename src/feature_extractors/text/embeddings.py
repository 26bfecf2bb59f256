"""Text embedding export — parity with the reference text/embeddings.py:
load the fine-tuned checkpoint, strip to the RoBERTa backbone, run the bare
encoder and export [CLS]-token embeddings as embeddings/text/{mode}.pkl
float32 [N, 768] tables row-indexed by dataframe order."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

import jax

from fe_common import (
    REPO_ROOT, export_embedding_table, load_text_model_and_tokenizer, parse_args,
    scanned_export_table,
)

from mer_tpu.core import load_config, save_embeddings
from mer_tpu.data import TextBatcher, TextFeatureDataset
from mer_tpu.models.roberta import TextERC
from mer_tpu.train import load_checkpoint_auto
from mer_tpu.train.checkpoint import restore_into

CONFIG = os.path.join(REPO_ROOT, "src", "feature_extractors", "text", "config.yaml")


def main(argv=None, save_dir: str = "embeddings/text"):
    args = parse_args(argv, default_config=CONFIG)
    config = load_config(args.config)

    model, tokenizer, pretrained = load_text_model_and_tokenizer(args, config=config)

    # init then load the fine-tuned checkpoint's roberta subtree
    ds0 = TextFeatureDataset("val", tokenizer, data_root=args.data_root)
    dl0 = TextBatcher(ds0, 8)
    example = next(iter(dl0))
    variables = model.init(
        jax.random.PRNGKey(0),
        jax.numpy.asarray(example["text"]), jax.numpy.asarray(example["attention_mask"]),
    )
    params = variables["params"]

    ckpt_path = os.path.abspath(str(config.checkpoint.save_path))
    if os.path.exists(ckpt_path):
        restored = load_checkpoint_auto(ckpt_path)
        params = restore_into(params, restored["params"])
        print(f"Loaded fine-tuned checkpoint {ckpt_path}")
    elif pretrained is not None:
        params["roberta"] = restore_into(params["roberta"], pretrained)
        print("Checkpoint not found; exporting with pretrained backbone")
    else:
        raise ValueError("Checkpoint not found")

    if args.int8:
        from mer_tpu.serving import RobertaInt8, quantize_roberta

        params = jax.device_put(quantize_roberta(params))
        server = RobertaInt8(model)
        embed = jax.jit(server.embed)
        print("int8 serving engine enabled")
    else:
        params = jax.device_put(params)  # avoid per-call transfer of numpy trees
        embed = jax.jit(
            lambda p, ids, mask: model.apply({"params": p}, ids, mask, method=TextERC.embed)
        )

    for mode in ["train", "val", "test"]:
        ds = TextFeatureDataset(mode, tokenizer, data_root=args.data_root)
        dl = TextBatcher(ds, 32)
        print(f"Saving {mode} embeddings...")
        if args.per_batch_export:
            batches = []
            for b in dl:
                emb = embed(params, jax.numpy.asarray(b["text"]), jax.numpy.asarray(b["attention_mask"]))
                valid = b["emotion"] != -1
                batches.append((b["idx"][valid], np.asarray(emb)[valid]))
            table = export_embedding_table(batches, len(ds), model.cfg.hidden_size)
        else:
            table = scanned_export_table(
                embed, params, dl, ("text", "attention_mask"), len(ds), model.cfg.hidden_size
            )
        out = os.path.join(os.path.abspath(save_dir), f"{mode}.pkl")
        save_embeddings(out, table)
        print(f"Saved {mode} embeddings to {out}")


if __name__ == "__main__":
    main()
