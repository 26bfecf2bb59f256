"""Where does the wav2vec2 export forward actually spend its time?

Times, at the tuned export shape (32 x 4 s), each architectural region of
AudioERC.embed (models/wav2vec2.py; reference audio_wav2vec2/model.py:9,19-29):

  conv_stack   7-layer temporal conv frontend (+GN+GELU)
  proj_pos     feature-projection LN/Dense + grouped positional conv (k=128,
               groups=16) + encoder LN  <- grouped convs are a known XLA
               lowering hazard on TPU; never isolated before
  encoder      12 transformer layers (scan-compiled)
  full         embed() end-to-end (masked mean pooling included)

Each region is timed as a prefix of the real forward (device-chained scan,
one scalar fetch; CLAUDE.md gotchas 6/8); deltas give per-region cost.
Analytic FLOPs per region come from utils/profiling.py's accounting so each
region gets its own MFU.

Usage: python scripts/profile_w2v_parts.py [batch] [seconds]
"""

from __future__ import annotations

import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

import numpy as np

import mer_tpu  # noqa: F401  (compile cache)
import jax
import jax.numpy as jnp

from mer_tpu.models.wav2vec2 import AudioERC, Wav2Vec2Config
from mer_tpu.utils.profiling import (
    V5E_PEAK_BF16, transformer_encoder_flops, wav2vec2_forward_flops,
)

B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
SECS = float(sys.argv[2]) if len(sys.argv) > 2 else 4.0
L = int(16000 * SECS)
DTYPE = jnp.bfloat16
REPEATS = 20

cfg = Wav2Vec2Config.base()


def timed(fn, params, wav, lengths) -> float:
    def chained(p, w, ln):
        def body(c, _):
            out = fn(p, w + c * 1e-30, ln)
            return jnp.sum(out.reshape(-1)[:4]).astype(jnp.float32), None

        acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=REPEATS)
        return acc

    j = jax.jit(chained)
    float(j(params, wav, lengths))  # compile + warm
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(j(params, wav, lengths))
        times.append((time.perf_counter() - t0) / REPEATS)
    return min(times)


def region_fns(model):
    """Prefix forwards applying standalone modules to the matching param
    subtrees (Wav2Vec2Model is nn.compact — submodules are not attributes)."""
    from flax import linen as nn

    from mer_tpu.models.wav2vec2 import ConvFeatureExtractor, ConvPositionalEmbedding

    fe = ConvFeatureExtractor(cfg, dtype=DTYPE)
    fp_norm = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=DTYPE)
    fp = nn.Dense(cfg.hidden_size, dtype=DTYPE)
    pos = ConvPositionalEmbedding(cfg, dtype=DTYPE)
    enc_ln = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=DTYPE)

    def conv_stack(p, w, ln):
        return fe.apply({"params": p["wav2vec2"]["feature_extractor"]}, w)

    def through_pos(p, w, ln):
        wv = p["wav2vec2"]
        feats = fe.apply({"params": wv["feature_extractor"]}, w)
        out_lengths = cfg.feat_extract_output_lengths(ln.astype(jnp.int32))
        t = feats.shape[1]
        frame_valid = jnp.arange(t)[None, :] < out_lengths[:, None]
        x = fp_norm.apply({"params": wv["feature_projection_norm"]}, feats)
        x = fp.apply({"params": wv["feature_projection"]}, x)
        x = jnp.where(frame_valid[..., None], x, 0.0)
        x = x + pos.apply({"params": wv["pos_conv_embed"]}, x)
        return enc_ln.apply({"params": wv["encoder_layer_norm"]}, x)

    def full(p, w, ln):
        return model.apply({"params": p}, w, ln, method=AudioERC.embed)

    return conv_stack, through_pos, full


def main():
    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.normal(size=(B, L)).astype(np.float32))
    lengths = jnp.full((B,), L, dtype=jnp.int32)

    # setup()-style model: submodules reachable for prefix forwards
    model = AudioERC(cfg, dtype=DTYPE, scan_layers=True)
    params = model.init(jax.random.PRNGKey(0), wav, lengths)["params"]
    params = jax.device_put(params)

    # analytic FLOPs per region
    frames = int(cfg.feat_extract_output_lengths(jnp.asarray([L]))[0])
    conv_fl = 0.0
    length, cin = L, 1
    for c_out, k, s in zip(cfg.conv_dim, cfg.conv_kernel, cfg.conv_stride):
        length = (length - k) // s + 1
        conv_fl += B * length * 2 * k * cin * c_out
        cin = c_out
    proj_fl = B * frames * 2 * cin * cfg.hidden_size
    pos_fl = (B * frames * 2 * cfg.num_conv_pos_embeddings * cfg.hidden_size
              * cfg.hidden_size / cfg.num_conv_pos_embedding_groups)
    enc_fl = transformer_encoder_flops(
        B * frames, frames, cfg.hidden_size, cfg.intermediate_size,
        cfg.num_hidden_layers)
    total_fl = wav2vec2_forward_flops(cfg, B, L)

    conv_stack, through_pos, full = region_fns(model)
    t_conv = timed(conv_stack, params, wav, lengths)
    t_pos = timed(through_pos, params, wav, lengths)
    t_full = timed(full, params, wav, lengths)

    rows = [
        ("conv_stack", t_conv, conv_fl),
        ("proj+pos_conv (delta)", t_pos - t_conv, proj_fl + pos_fl),
        ("encoder+pool (delta)", t_full - t_pos, enc_fl),
        ("full embed()", t_full, total_fl),
    ]
    print(f"batch {B} x {SECS:.0f}s ({frames} frames), bf16, scan_layers")
    for name, dt, fl in rows:
        tf = fl / max(dt, 1e-12) / 1e12
        print(f"{name:24s} {dt*1e3:8.3f} ms   {tf:6.1f} TFLOP/s  "
              f"({tf*1e12/V5E_PEAK_BF16*100:5.1f}% bf16 peak)")


if __name__ == "__main__":
    main()
