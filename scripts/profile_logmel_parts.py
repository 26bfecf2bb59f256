"""Where do log_mel_spectrogram's 56 ms/batch go?  The kernel region
(frames -> DFT GEMMs -> mel -> log) measures 1.2 ms (BENCH_LOCAL
logmel_kernel_device_*), yet the full op runs at 572 clips/s = 56 ms per
32-clip batch.  Time each part device-chained, then candidate rewrites:

  pad_gather   — reflect-pad take_along_axis              [B, 160400]
  frame_gather — jnp.take framing                         [B, 1001, 400]
  frame_slices — framing via 5 strided slices + concat    (gather-free)
  ndft_conv    — framing + DFT folded into ONE strided conv (no frames
                 tensor at all; MXU implicit GEMM)
  full op      — current production path

Usage: python scripts/profile_logmel_parts.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

import mer_tpu  # noqa: F401  (compile cache)
from mer_tpu.ops.logmel import (
    MelConfig, dft_matrices, frame_signal, hann_window, log_mel_spectrogram,
    reflect_pad_indices,
)


def sync1(out):
    """Chained sync fetching ONE element (a full np.asarray would drag the
    whole tensor through the ~50-100 MB/s tunnel and dominate the timing)."""
    float(jax.tree.leaves(out)[0].ravel()[0])


def timed(fn, args, iters=30, label=""):
    out = fn(*args)
    sync1(out)
    t0 = time.perf_counter()
    last = None
    for _ in range(iters):
        last = fn(*args)
    sync1(last)
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"{label:16s} {ms:8.2f} ms", flush=True)
    return ms


def main():
    cfg = MelConfig()
    b = 32
    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.normal(size=(b, cfg.max_samples)).astype(np.float32))
    length = jnp.asarray(rng.integers(16000, cfg.max_samples, size=(b,)).astype(np.int32))
    pad = cfg.n_fft // 2

    @jax.jit
    def pad_gather(y, length):
        pos = jax.vmap(lambda l: reflect_pad_indices(cfg.max_samples, pad, l))(length)
        return jnp.take_along_axis(y, pos, axis=1)

    padded = pad_gather(audio, length)

    @jax.jit
    def do_frame_gather(padded):
        return frame_signal(padded, cfg.max_frames, cfg.n_fft, cfg.hop_length)

    @jax.jit
    def do_frame_slices(padded):
        # hop=160, n_fft=400, gcd=80: frame f = chunks [2f, 2f+5) of width 80
        chunk = 80
        n_chunk_cover = cfg.n_fft // chunk  # 5
        step = cfg.hop_length // chunk  # 2
        n_chunks = padded.shape[1] // chunk
        base = padded[:, : n_chunks * chunk].reshape(b, n_chunks, chunk)
        parts = [
            lax.slice_in_dim(
                base, j, j + step * (cfg.max_frames - 1) + 1, stride=step, axis=1
            )
            for j in range(n_chunk_cover)
        ]
        return jnp.concatenate(parts, axis=-1)

    window = hann_window(cfg.win_length)
    cos_m, sin_m = dft_matrices(cfg.n_fft, window)
    kern = jnp.concatenate([jnp.asarray(cos_m), jnp.asarray(sin_m)], axis=1)  # [400, 402]

    @jax.jit
    def ndft_conv(padded):
        out = lax.conv_general_dilated(
            padded[:, None, :],
            kern.T[:, None, :],  # [O=402, I=1, W=400]
            window_strides=(cfg.hop_length,),
            padding="VALID",
            dimension_numbers=("NCH", "OIH", "NCH"),
            preferred_element_type=jnp.float32,
        )  # [B, 402, F]
        re, im = out[:, : cfg.n_freqs], out[:, cfg.n_freqs :]
        return jnp.sqrt(re * re + im * im)

    @jax.jit
    def frames_then_gemm(frames):
        re = jnp.einsum("bfn,nk->bfk", frames, jnp.asarray(cos_m), preferred_element_type=jnp.float32)
        im = jnp.einsum("bfn,nk->bfk", frames, jnp.asarray(sin_m), preferred_element_type=jnp.float32)
        return jnp.sqrt(re * re + im * im)

    timed(pad_gather, (audio, length), label="pad_gather")
    timed(do_frame_gather, (padded,), label="frame_gather")
    timed(do_frame_slices, (padded,), label="frame_slices")
    frames = do_frame_gather(padded)
    timed(frames_then_gemm, (frames,), label="gemm_from_frames")
    timed(ndft_conv, (padded,), label="ndft_conv")

    @jax.jit
    def slices_then_gemm(padded):
        return frames_then_gemm(do_frame_slices(padded))

    timed(slices_then_gemm, (padded,), label="slices+gemm")

    # gather-free reflect pad: identity interior (slices) + two tiny edge
    # gathers + one vmapped dynamic_update_slice for the right reflection
    W = 512  # >= pad + n_fft - hop: covers every sample a VALID frame reads

    @jax.jit
    def pad_fast(y, length):
        l1 = (length - 1)[:, None]
        # left edge, exact reflect_pad_indices formula (tiny [B, pad] gather)
        pos = jnp.abs(jnp.arange(-pad, 0))[None, :]
        pos = jnp.where(pos > l1, 2 * l1 - pos, pos)
        left = jnp.take_along_axis(y, jnp.clip(pos, 0, cfg.max_samples - 1), axis=1)
        # right reflection values for buffer positions length..length+W-1
        src = jnp.clip(l1 - 1 - jnp.arange(W)[None, :], 0, cfg.max_samples - 1)
        patch = jnp.take_along_axis(y, src, axis=1)  # [B, W] tiny gather
        buf = jnp.concatenate(
            [left, y, jnp.zeros((y.shape[0], W), y.dtype)], axis=1
        )  # [B, pad + L + W]
        buf = jax.vmap(
            lambda row, p, l: lax.dynamic_update_slice(row, p, (pad + l,))
        )(buf, patch, length)
        return buf[:, : cfg.max_samples + 2 * pad]

    fast = pad_fast(audio, length)
    # exactness where it matters: every sample a valid frame reads
    ref = np.asarray(padded)
    fast_np = np.asarray(fast)
    n_frames = 1 + np.asarray(length) // cfg.hop_length
    max_read = (n_frames - 1) * cfg.hop_length + cfg.n_fft  # buffer coords
    for i in range(b):
        assert (ref[i, : max_read[i]] == fast_np[i, : max_read[i]]).all(), i
    print("pad_fast exact over all valid-frame reads")
    timed(pad_fast, (audio, length), label="pad_fast")

    @jax.jit
    def full(audio, length):
        return log_mel_spectrogram(audio, length, cfg, channels_first=False)

    timed(full, (audio, length), iters=10, label="full_op")

    @jax.jit
    def full_fast(y, length):
        padded = pad_fast(y, length)
        frames = do_frame_slices(padded)
        return frames_then_gemm(frames)

    timed(full_fast, (audio, length), label="fast pad+frame+gemm")


if __name__ == "__main__":
    main()
