"""Fused Pallas TPU kernel for the log-mel hot path.

Computes, per block of frames, entirely in VMEM:

    y   = frames @ [window*cos | window*-sin]   # single GEMM-NDFT  (MXU)
    mag = sqrt(y_re^2 + y_im^2)                 # power=1 magnitude (VPU)
    mel = mag @ mel_fb^T                        # mel projection    (MXU)
    out = log(mel + eps)                        # log compression   (VPU)

The cos and sin DFT matrices are concatenated on the lane axis so the NDFT is
ONE [F, 512] x [512, 512] matmul (v2; ~9% faster than the two-GEMM v1).
Operand matrices are zero-padded to lane multiples (400 -> 512 contraction
dim, 201 -> 256 frequency lanes): padded columns/rows are zero, so results
are exact (tested vs the XLA/librosa recipe in tests/test_logmel_pallas.py).

**Measured status (v5e, device-chained scan timing).** In isolation the
kernel region roughly ties XLA's fusion of the identical math (1.21 vs
1.44 ms, b=32 x 1001 frames, scripts/bench_logmel_kernel.py) — two GEMMs
with elementwise glue is XLA's best case. But inside the FULL
`log_mel_spectrogram` op (after the gather-free reflect-pad/framing
rewrite), the kernel wins 1.3-1.6x (b=32: 2.26 vs 3.55 ms;
scripts/bench_logmel_fullop.py): XLA schedules the framing-concat + GEMM
chain with extra materialized intermediates, while this kernel consumes
frame blocks straight from VMEM. `log_mel_spectrogram` therefore defaults
to this kernel on TPU (`use_pallas=None` -> backend dispatch) and to the
jnp path elsewhere. (History: round 1's apparent win was host-transfer
noise; round 2 demoted the kernel on kernel-region-only evidence; round 3's
gather fix exposed the real full-op gap.)  Forward-only: no VJP — the mel
training path consumes the uint8 spectrogram cache, not gradients through
the frontend.

The reference's equivalent is host-side librosa (audio_mel/dataset.py:95-98).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mer_tpu.ops.logmel import EPS_F64, MelConfig, dft_matrices, hann_window, mel_filterbank

FRAME_BLOCK = 512
PAD_NFFT = 512   # 400 -> 512 (lane multiple)
PAD_FREQ = 256   # 201 -> 256


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.lru_cache(maxsize=4)
def _operands(cfg: MelConfig) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    window = hann_window(cfg.win_length)
    cos_m, sin_m = dft_matrices(cfg.n_fft, window)  # [n_fft, n_freqs]
    mel_w = mel_filterbank(cfg.sample_rate, cfg.n_fft, cfg.n_mels, cfg.fmin, cfg.fmax, norm=1)  # [M, n_freqs]

    cos_p = np.zeros((PAD_NFFT, PAD_FREQ), np.float32)
    sin_p = np.zeros((PAD_NFFT, PAD_FREQ), np.float32)
    cos_p[: cfg.n_fft, : cfg.n_freqs] = cos_m
    sin_p[: cfg.n_fft, : cfg.n_freqs] = sin_m
    mel_t = np.zeros((PAD_FREQ, _round_up(cfg.n_mels, 128)), np.float32)
    mel_t[: cfg.n_freqs, : cfg.n_mels] = mel_w.T
    return cos_p, sin_p, mel_t


@functools.lru_cache(maxsize=4)
def _combined_dft(cfg: MelConfig) -> np.ndarray:
    """[PAD_NFFT, 2*PAD_FREQ]: cos in the first PAD_FREQ lanes, sin after."""
    cos_p, sin_p, _ = _operands(cfg)
    return np.concatenate([cos_p, sin_p], axis=1)


def _kernel(frames_ref, comb_ref, mel_ref, out_ref):
    f = frames_ref[0]  # [FRAME_BLOCK, PAD_NFFT]
    y = jnp.dot(f, comb_ref[:], preferred_element_type=jnp.float32)  # [FB, 2*PAD_FREQ]
    re = y[:, :PAD_FREQ]
    im = y[:, PAD_FREQ:]
    mag = jnp.sqrt(re * re + im * im)
    mel = jnp.dot(mag, mel_ref[:], preferred_element_type=jnp.float32)
    out_ref[0] = jnp.log(mel + EPS_F64)


def logmel_frames_pallas(frames: jnp.ndarray, cfg: MelConfig = MelConfig(), interpret: bool = False) -> jnp.ndarray:
    """[B, F, n_fft] windowless frames -> [B, F, n_mels] log-mel (unnormalized).

    The Hann window is folded into the DFT matrices.
    """
    b, f, n_fft = frames.shape
    assert n_fft == cfg.n_fft, (n_fft, cfg.n_fft)

    f_pad = _round_up(f, FRAME_BLOCK)
    frames_p = jnp.pad(frames.astype(jnp.float32), ((0, 0), (0, f_pad - f), (0, PAD_NFFT - n_fft)))
    comb = _combined_dft(cfg)
    _, _, mel_t = _operands(cfg)
    m_pad = mel_t.shape[1]

    grid = (b, f_pad // FRAME_BLOCK)
    n_blocks = grid[0] * grid[1]
    flops = 2 * FRAME_BLOCK * (PAD_NFFT * 2 * PAD_FREQ + PAD_FREQ * m_pad) * n_blocks

    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, FRAME_BLOCK, PAD_NFFT), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((PAD_NFFT, 2 * PAD_FREQ), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((PAD_FREQ, m_pad), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, FRAME_BLOCK, m_pad), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, f_pad, m_pad), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=frames_p.size * 4 + b * f_pad * m_pad * 4,
            transcendentals=b * f_pad * m_pad,  # log
        ),
        interpret=interpret,
    )(frames_p, jnp.asarray(comb), jnp.asarray(mel_t))

    return out[:, :f, : cfg.n_mels]
