"""Windowed-sinc polyphase resampling (torchaudio.functional.resample
equivalent — audio_wav2vec2/dataset.py:42-43 uses it as a 16 kHz safety net;
MELD wavs are already 16 kHz from the ffmpeg step).

Implemented as a strided conv against a precomputed sinc filter bank, so it
runs on device (or host via numpy) with static shapes.  Matches torchaudio's
'sinc_interp_hann' method parameters (lowpass_filter_width=6, rolloff=0.99).
"""

from __future__ import annotations

import math
from functools import lru_cache

import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=16)
def _kernel(orig_freq: int, new_freq: int, lowpass_filter_width: int = 6, rolloff: float = 0.99) -> tuple[np.ndarray, int]:
    """Polyphase sinc kernel bank [new_freq_g, width*2*orig_freq_g...] and width."""
    gcd = math.gcd(orig_freq, new_freq)
    orig_g, new_g = orig_freq // gcd, new_freq // gcd

    base_freq = min(orig_g, new_g) * rolloff
    width = math.ceil(lowpass_filter_width * orig_g / base_freq)

    idx = np.arange(-width, width + orig_g, dtype=np.float64)[None, :] / orig_g
    t = np.arange(0, -new_g, -1, dtype=np.float64)[:, None] / new_g + idx
    t = t * base_freq
    t = np.clip(t, -lowpass_filter_width, lowpass_filter_width)

    window = np.cos(t * np.pi / lowpass_filter_width / 2) ** 2
    scale = base_freq / orig_g
    kernel = np.where(t == 0, 1.0, np.sinc(t)) * window * scale
    return kernel.astype(np.float32), width


def resample(waveform: np.ndarray | jnp.ndarray, orig_freq: int, new_freq: int) -> np.ndarray:
    """Resample [..., L] waveform. Host numpy implementation (the data prep
    path); on-device use is possible by swapping np->jnp (shapes static)."""
    if orig_freq == new_freq:
        return np.asarray(waveform)
    gcd = math.gcd(orig_freq, new_freq)
    orig_g, new_g = orig_freq // gcd, new_freq // gcd

    kernel, width = _kernel(orig_freq, new_freq)
    wave = np.asarray(waveform, dtype=np.float32)
    squeeze = wave.ndim == 1
    if squeeze:
        wave = wave[None, :]

    length = wave.shape[-1]
    padded = np.pad(wave, ((0, 0), (width, width + orig_g)))
    n_out_blocks = (length + orig_g - 1) // orig_g

    # gather strided windows: block i covers padded[i*orig_g : i*orig_g + K]
    k = kernel.shape[1]
    starts = np.arange(n_out_blocks) * orig_g
    windows = np.stack([padded[:, s : s + k] for s in starts], axis=1)  # [B, nb, K]
    out = np.einsum("bnk,pk->bnp", windows, kernel)  # [B, nb, new_g]
    out = out.reshape(wave.shape[0], -1)

    target_len = int(math.ceil(new_freq * length / orig_freq))
    out = out[:, :target_len]
    return out[0] if squeeze else out
