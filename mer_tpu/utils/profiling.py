"""Profiling and step-timing utilities.

The reference has no tracing/profiling at all (SURVEY.md §5) — only tqdm
bars.  Here: jax.profiler trace capture around training regions plus a
lightweight step timer for throughput accounting (utterances/sec, the
BASELINE.json headline metric).
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str | None):
    """Capture a jax.profiler trace into log_dir (no-op when None)."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


# ---------------------------------------------------------------------------
# Analytic FLOP accounting (MFU)
# ---------------------------------------------------------------------------
#
# "Fast" must mean fast relative to the hardware ceiling, not just faster
# than the torch-CPU reference.  These count the matmul FLOPs (2 per MAC) of
# each pipeline's forward analytically from the model dims, so benches can
# report achieved TFLOP/s and %-of-peak.  v5e peak: 197 TFLOP/s bf16,
# 394 TOP/s int8 (public spec).  Elementwise/softmax/LN work is excluded
# (the convention MFU uses); backward ~= 2x forward.

V5E_PEAK_BF16 = 197e12
V5E_PEAK_INT8 = 394e12


def transformer_encoder_flops(n_tokens: int, seq_len: int, d: int, dff: int,
                              n_layers: int) -> float:
    """Post-LN encoder stack: per token per layer 4 d^2-projections (q,k,v,
    out) + 2 FFN matmuls (d<->dff), plus score/PV attention math (2 matmuls
    over seq_len)."""
    per_token_layer = 8 * d * d + 4 * d * dff + 4 * seq_len * d
    return float(n_layers) * n_tokens * per_token_layer


def m2fnet_forward_flops(model, batch_dialogues: int, dialogue_len: int) -> float:
    """Matmul FLOPs of one M2FNet forward over a [B, U, .] batch
    (architecture: reference src/model.py:102-143)."""
    tokens = batch_dialogues * dialogue_len
    fl = 0.0
    if model.audio_enabled:
        fl += model.n_transformers_audio * transformer_encoder_flops(
            tokens, dialogue_len, model.d_model_audio, 2048, model.n_layers_audio)
        fl += tokens * 2 * model.d_model_audio * model.d_model_fam  # audio_proj
    if model.text_enabled:
        fl += model.n_transformers_text * transformer_encoder_flops(
            tokens, dialogue_len, model.d_model_text, 2048, model.n_layers_text)
        fl += tokens * 2 * model.d_model_text * model.d_model_fam  # text_proj
    if model.fam_enabled:
        d = model.d_model_fam
        # FAM layer: 4 d^2 projections + score/PV + Linear(2d -> d)
        fl += model.n_layers_fam * tokens * (8 * d * d + 4 * dialogue_len * d + 4 * d * d)
    d_in = (model.d_model_fam * 2 if (model.audio_enabled and model.text_enabled)
            else model.d_model_fam)
    h, o = model.hidden_size_classifier, model.output_size_classifier
    fl += tokens * 2 * (d_in * h + h * o)
    return fl


def roberta_forward_flops(cfg, batch: int, seq_len: int, with_head: bool = False) -> float:
    """RoBERTa encoder forward (models/roberta.py); embeddings are lookups
    (no matmul FLOPs)."""
    fl = transformer_encoder_flops(
        batch * seq_len, seq_len, cfg.hidden_size, cfg.intermediate_size,
        cfg.num_hidden_layers)
    if with_head:
        fl += batch * 2 * (cfg.hidden_size * cfg.hidden_size + cfg.hidden_size * cfg.num_labels)
    return fl


def wav2vec2_forward_flops(cfg, batch: int, n_samples: int) -> float:
    """wav2vec2 conv frontend + encoder forward (models/wav2vec2.py).
    Conv flops: per output frame 2 * k * c_in * c_out per layer."""
    fl = 0.0
    length = n_samples
    c_in = 1
    for c_out, k, s in zip(cfg.conv_dim, cfg.conv_kernel, cfg.conv_stride):
        length = (length - k) // s + 1
        fl += batch * length * 2 * k * c_in * c_out
        c_in = c_out
    frames = length
    fl += batch * frames * 2 * c_in * cfg.hidden_size  # feature projection
    # positional conv embedding (grouped conv)
    fl += batch * frames * 2 * cfg.num_conv_pos_embeddings * cfg.hidden_size * \
        cfg.hidden_size / cfg.num_conv_pos_embedding_groups
    fl += transformer_encoder_flops(
        batch * frames, frames, cfg.hidden_size, cfg.intermediate_size,
        cfg.num_hidden_layers)
    return fl


def mfu(flops: float, seconds: float, peak: float = V5E_PEAK_BF16) -> tuple[float, float]:
    """(achieved TFLOP/s, fraction of peak)."""
    achieved = flops / max(seconds, 1e-12)
    return achieved / 1e12, achieved / peak


class StepTimer:
    """Wall-clock timing with device-sync boundaries and simple stats."""

    def __init__(self):
        self.times: list[float] = []
        self._t0: float | None = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, result=None) -> float:
        if result is not None:
            jax.block_until_ready(result)
        dt = time.perf_counter() - self._t0
        self.times.append(dt)
        return dt

    @property
    def mean(self) -> float:
        return sum(self.times) / max(len(self.times), 1)

    @property
    def best(self) -> float:
        return min(self.times) if self.times else float("nan")

    def throughput(self, items_per_step: float) -> float:
        return items_per_step / self.mean if self.times else 0.0
