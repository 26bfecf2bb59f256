"""Pipeline-parallel forwards for the FE fine-tuning models.

The 12-layer encoder stacks (RoBERTa, wav2vec2 — the only stacks in this
framework deep enough to justify pipelining) are routed through
``scanned_layer_pipeline`` (parallel/pipeline.py — GPipe over the ``pp``
mesh axis), while the thin pre-stack (embeddings / conv frontend) and the
classification head stay data-parallel under GSPMD.

The pre-stack and head are applied SUBMODULE-BY-SUBMODULE against the same
param subtrees the full models own — no weight duplication, and the
equality tests (tests/test_pipeline_parallel.py::TestFESolverPP) pin these
restatements to the monolithic ``model.apply`` forward, so they cannot
drift silently.

Reference: the fine-tune loops being parallelized are
/root/reference/src/feature_extractors/text/train.py:211-227 and
audio_wav2vec2/train.py (same skeleton); the reference itself is
single-device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.sharding import Mesh

from mer_tpu.parallel.pipeline import scanned_layer_pipeline


def _dropout(x, rate, deterministic, rng):
    if deterministic or rate == 0.0:
        return x
    return nn.Dropout(rate, deterministic=False).apply({}, x, rngs={"dropout": rng})


# ---------------------------------------------------------------------------
# TextERC (RoBERTa)
# ---------------------------------------------------------------------------

def roberta_hidden_pp(
    params,
    cfg,
    mesh: Mesh,
    input_ids: jnp.ndarray,
    attention_mask: jnp.ndarray,
    *,
    dtype=jnp.float32,
    deterministic: bool = True,
    rng: jnp.ndarray | None = None,
    microbatches: int | None = None,
    batch_axis: str | None = "dp",
    remat: bool | str = False,
) -> jnp.ndarray:
    """RobertaModel.__call__ (models/roberta.py:128-162) with the layer
    stack pipelined.  ``params`` is the RobertaModel subtree (scan layout:
    ``layers_scan/layer`` leaves [L, ...])."""
    from mer_tpu.models.roberta import RobertaLayer, create_position_ids

    c = cfg
    if rng is not None:
        rng_pre, rng_stack = jax.random.split(rng)
    else:
        rng_pre = rng_stack = None

    word = nn.Embed(c.vocab_size, c.hidden_size, dtype=dtype).apply(
        {"params": params["word_embeddings"]}, input_ids)
    pos_ids = create_position_ids(input_ids, c.pad_token_id)
    pos = nn.Embed(c.max_position_embeddings, c.hidden_size, dtype=dtype).apply(
        {"params": params["position_embeddings"]}, pos_ids)
    tok = nn.Embed(c.type_vocab_size, c.hidden_size, dtype=dtype).apply(
        {"params": params["token_type_embeddings"]}, jnp.zeros_like(input_ids))
    hidden = word + pos + tok
    hidden = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=dtype).apply(
        {"params": params["embeddings_layernorm"]}, hidden)
    hidden = _dropout(hidden, c.hidden_dropout, deterministic, rng_pre)

    key_padding_mask = attention_mask == 0
    hidden = hidden.astype(dtype)
    return scanned_layer_pipeline(
        RobertaLayer(c, dtype=dtype),
        params["layers_scan"]["layer"],
        hidden, key_padding_mask, mesh,
        microbatches=microbatches, batch_axis=batch_axis,
        deterministic=deterministic, rng=rng_stack, remat=remat,
    )


def text_erc_logits_pp(
    params,
    cfg,
    mesh: Mesh,
    input_ids: jnp.ndarray,
    attention_mask: jnp.ndarray,
    *,
    dtype=jnp.float32,
    deterministic: bool = True,
    rng: jnp.ndarray | None = None,
    microbatches: int | None = None,
    batch_axis: str | None = "dp",
    remat: bool | str = False,
) -> jnp.ndarray:
    """TextERC.__call__ (models/roberta.py:200-202) pipelined over pp."""
    from mer_tpu.models.roberta import RobertaClassificationHead

    if rng is not None:
        rng_body, rng_head = jax.random.split(rng)
    else:
        rng_body = rng_head = None
    hidden = roberta_hidden_pp(
        params["roberta"], cfg, mesh, input_ids, attention_mask,
        dtype=dtype, deterministic=deterministic, rng=rng_body,
        microbatches=microbatches, batch_axis=batch_axis, remat=remat,
    )
    head = RobertaClassificationHead(cfg, dtype=dtype)
    kwargs = {} if rng_head is None else {"rngs": {"dropout": rng_head}}
    return head.apply({"params": params["classifier_head"]}, hidden, deterministic, **kwargs)


# ---------------------------------------------------------------------------
# AudioERC (wav2vec2)
# ---------------------------------------------------------------------------

def wav2vec2_hidden_pp(
    params,
    cfg,
    mesh: Mesh,
    waveforms: jnp.ndarray,
    lengths: jnp.ndarray,
    *,
    dtype=jnp.float32,
    deterministic: bool = True,
    rng: jnp.ndarray | None = None,
    microbatches: int | None = None,
    batch_axis: str | None = "dp",
    remat: bool | str = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Wav2Vec2Model.__call__ (models/wav2vec2.py) with the encoder stack
    pipelined; returns (hidden, out_lengths)."""
    from mer_tpu.models.wav2vec2 import (
        ConvFeatureExtractor, ConvPositionalEmbedding, Wav2Vec2EncoderLayer,
    )

    c = cfg
    if rng is not None:
        rng_p1, rng_p2, rng_stack = jax.random.split(rng, 3)
    else:
        rng_p1 = rng_p2 = rng_stack = None

    feats = ConvFeatureExtractor(c, dtype=dtype).apply(
        {"params": params["feature_extractor"]}, waveforms)
    out_lengths = c.feat_extract_output_lengths(lengths.astype(jnp.int32))
    t = feats.shape[1]
    frame_valid = jnp.arange(t)[None, :] < out_lengths[:, None]

    x = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=dtype).apply(
        {"params": params["feature_projection_norm"]}, feats)
    x = nn.Dense(c.hidden_size, dtype=dtype).apply(
        {"params": params["feature_projection"]}, x)
    x = _dropout(x, c.hidden_dropout, deterministic, rng_p1)

    x = jnp.where(frame_valid[..., None], x, 0.0)
    x = x + ConvPositionalEmbedding(c, dtype=dtype).apply(
        {"params": params["pos_conv_embed"]}, x)
    x = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=dtype).apply(
        {"params": params["encoder_layer_norm"]}, x)
    x = _dropout(x, c.hidden_dropout, deterministic, rng_p2)

    key_padding_mask = ~frame_valid
    x = x.astype(dtype)
    x = scanned_layer_pipeline(
        Wav2Vec2EncoderLayer(c, dtype=dtype),
        params["layers_scan"]["layer"],
        x, key_padding_mask, mesh,
        microbatches=microbatches, batch_axis=batch_axis,
        deterministic=deterministic, rng=rng_stack, remat=remat,
    )
    return x, out_lengths


def audio_erc_logits_pp(
    params,
    cfg,
    mesh: Mesh,
    waveforms: jnp.ndarray,
    lengths: jnp.ndarray,
    *,
    dtype=jnp.float32,
    deterministic: bool = True,
    rng: jnp.ndarray | None = None,
    microbatches: int | None = None,
    batch_axis: str | None = "dp",
    remat: bool | str = False,
) -> jnp.ndarray:
    """AudioERC.__call__ (models/wav2vec2.py) pipelined over pp."""
    hidden, out_lengths = wav2vec2_hidden_pp(
        params["wav2vec2"], cfg, mesh, waveforms, lengths,
        dtype=dtype, deterministic=deterministic, rng=rng,
        microbatches=microbatches, batch_axis=batch_axis, remat=remat,
    )
    # masked mean pooling (AudioERC.pool — parameterless restatement)
    t = hidden.shape[1]
    valid = (jnp.arange(t)[None, :] < out_lengths[:, None])[..., None]
    summed = jnp.sum(jnp.where(valid, hidden, 0.0), axis=1)
    pooled = summed / jnp.maximum(out_lengths[:, None], 1)

    x = jnp.tanh(nn.Dense(cfg.hidden_size, dtype=dtype).apply(
        {"params": params["head_dense"]}, pooled))
    return nn.Dense(cfg.num_labels, dtype=dtype).apply(
        {"params": params["head_out"]}, x)


__all__ = [
    "roberta_hidden_pp", "text_erc_logits_pp",
    "wav2vec2_hidden_pp", "audio_erc_logits_pp",
]
