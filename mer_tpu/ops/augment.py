"""Waveform augmentations, JAX-native.

Reference behavior (audio_mel/dataset.py:24-29): an audiomentations.Compose of
AddGaussianSNR(5-40 dB), TimeStretch(0.8-1.25), PitchShift(+-4 semitones),
Shift(+-0.5 fraction), each applied with p=0.5.  Augmentation is *disabled by
default* (augmentation_factor: 1 in config_audio_mel.yaml) — this module
supplies the capability for augmentation_factor > 1 runs.

All transforms are pure functions of (key, waveform, length) with static
shapes (fixed max-sample buffers + true-length bookkeeping), so a whole batch
augments on device inside one jitted program.  Time-stretch / pitch-shift use
an STFT phase vocoder (the same algorithm librosa.effects uses underneath
audiomentations).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from mer_tpu.ops.logmel import hann_window


def add_gaussian_snr(key: jax.Array, wave: jnp.ndarray, length: jnp.ndarray,
                     min_snr_db: float = 5.0, max_snr_db: float = 40.0) -> jnp.ndarray:
    """Additive white noise at a uniformly-sampled target SNR (in dB)."""
    k_snr, k_noise = jax.random.split(key)
    snr_db = jax.random.uniform(k_snr, (), minval=min_snr_db, maxval=max_snr_db)
    valid = jnp.arange(wave.shape[-1]) < length
    rms2 = jnp.sum(jnp.where(valid, wave * wave, 0.0)) / jnp.maximum(length, 1)
    noise_rms = jnp.sqrt(rms2 / (10.0 ** (snr_db / 10.0)))
    noise = jax.random.normal(k_noise, wave.shape) * noise_rms
    return jnp.where(valid, wave + noise, 0.0)


def shift(key: jax.Array, wave: jnp.ndarray, length: jnp.ndarray,
          min_fraction: float = -0.5, max_fraction: float = 0.5) -> jnp.ndarray:
    """Circular time shift by a random fraction of the true length
    (audiomentations Shift with rollover)."""
    frac = jax.random.uniform(key, (), minval=min_fraction, maxval=max_fraction)
    offset = (frac * length).astype(jnp.int32)
    idx = jnp.arange(wave.shape[-1])
    src = jnp.mod(idx - offset, jnp.maximum(length, 1))
    shifted = wave[src]
    return jnp.where(idx < length, shifted, 0.0)


# ---------------------------------------------------------------------------
# Phase vocoder
# ---------------------------------------------------------------------------

_PV_NFFT = 2048
_PV_HOP = 512


def _stft(wave: jnp.ndarray, n_fft: int = _PV_NFFT, hop: int = _PV_HOP) -> jnp.ndarray:
    pad = n_fft // 2
    padded = jnp.pad(wave, (pad, pad), mode="reflect")
    n_frames = 1 + wave.shape[-1] // hop
    idx = jnp.arange(n_frames)[:, None] * hop + jnp.arange(n_fft)[None, :]
    frames = padded[idx] * jnp.asarray(hann_window(n_fft), jnp.float32)
    return jnp.fft.rfft(frames, axis=-1)  # [F, K]


def _istft(spec: jnp.ndarray, out_len: int, n_fft: int = _PV_NFFT, hop: int = _PV_HOP) -> jnp.ndarray:
    window = jnp.asarray(hann_window(n_fft), jnp.float32)
    frames = jnp.fft.irfft(spec, n=n_fft, axis=-1) * window
    n_frames = spec.shape[0]
    total = n_fft + hop * (n_frames - 1)
    idx = jnp.arange(n_frames)[:, None] * hop + jnp.arange(n_fft)[None, :]
    sig = jnp.zeros((total,), jnp.float32).at[idx.reshape(-1)].add(frames.reshape(-1))
    win2 = jnp.zeros((total,), jnp.float32).at[idx.reshape(-1)].add(jnp.tile(window * window, n_frames))
    sig = sig / jnp.maximum(win2, 1e-8)
    pad = n_fft // 2
    sig = sig[pad:]
    return sig[:out_len]


def _phase_vocoder(spec: jnp.ndarray, rate: jnp.ndarray, n_out_frames: int, hop: int = _PV_HOP) -> jnp.ndarray:
    """librosa-style phase vocoder: resample the frame axis at ``rate`` with
    magnitude interpolation and phase accumulation. Static [n_out_frames, K]."""
    n_frames, k = spec.shape
    phi_advance = jnp.linspace(0.0, jnp.pi * hop, k)

    steps = jnp.arange(n_out_frames) * rate  # fractional source frame indices
    idx0 = jnp.clip(jnp.floor(steps).astype(jnp.int32), 0, n_frames - 1)
    idx1 = jnp.clip(idx0 + 1, 0, n_frames - 1)
    alpha = (steps - idx0)[:, None]

    s0, s1 = spec[idx0], spec[idx1]
    mag = (1.0 - alpha) * jnp.abs(s0) + alpha * jnp.abs(s1)

    # accumulated phase: sum of per-step deviations + expected advance
    dphase = jnp.angle(s1) - jnp.angle(s0) - phi_advance[None, :]
    dphase = dphase - 2.0 * jnp.pi * jnp.round(dphase / (2.0 * jnp.pi))
    step_phase = phi_advance[None, :] + dphase
    phase0 = jnp.angle(spec[0])
    phase = phase0[None, :] + jnp.cumsum(jnp.concatenate([jnp.zeros((1, k)), step_phase[:-1]], axis=0), axis=0)

    return mag * jnp.exp(1j * phase)


def time_stretch(wave: jnp.ndarray, length: jnp.ndarray, rate: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Stretch in time by ``rate`` (>1 = faster/shorter) without changing
    pitch. Returns (stretched wave in the same fixed buffer, new length)."""
    max_len = wave.shape[-1]
    spec = _stft(wave)
    n_out = spec.shape[0]  # enough frames for any rate >= ~0.8 given masking
    out_spec = _phase_vocoder(spec, rate, n_out)
    out = _istft(out_spec, max_len)
    new_length = jnp.minimum((length / rate).astype(jnp.int32), max_len)
    valid = jnp.arange(max_len) < new_length
    return jnp.where(valid, out, 0.0), new_length


def pitch_shift(wave: jnp.ndarray, length: jnp.ndarray, semitones: jnp.ndarray,
                sample_rate: int = 16000) -> jnp.ndarray:
    """Shift pitch by ``semitones`` keeping duration: phase-vocoder stretch by
    2^(s/12) then linear-interp resample back to the original rate."""
    factor = 2.0 ** (semitones / 12.0)
    stretched, new_len = time_stretch(wave, length, 1.0 / factor)
    # resample stretched (length*factor samples) back to `length` samples
    max_len = wave.shape[-1]
    pos = jnp.arange(max_len) * factor
    i0 = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, max_len - 1)
    i1 = jnp.clip(i0 + 1, 0, max_len - 1)
    frac = pos - i0
    out = (1.0 - frac) * stretched[i0] + frac * stretched[i1]
    valid = jnp.arange(max_len) < length
    return jnp.where(valid, out, 0.0)


@partial(jax.jit, static_argnames=("p",))
def random_augment(key: jax.Array, wave: jnp.ndarray, length: jnp.ndarray, p: float = 0.5):
    """The reference's Compose: each transform applied with probability p
    (audio_mel/dataset.py:24-29). Single clip [max_samples]; vmap over a batch.
    Returns (augmented wave, new length)."""
    keys = jax.random.split(key, 8)

    apply0 = jax.random.bernoulli(keys[0], p)
    wave = jnp.where(apply0, add_gaussian_snr(keys[1], wave, length), wave)

    apply1 = jax.random.bernoulli(keys[2], p)
    rate = jax.random.uniform(keys[3], (), minval=0.8, maxval=1.25)
    stretched, new_len = time_stretch(wave, length, rate)
    wave = jnp.where(apply1, stretched, wave)
    length = jnp.where(apply1, new_len, length)

    apply2 = jax.random.bernoulli(keys[4], p)
    semis = jax.random.uniform(keys[5], (), minval=-4.0, maxval=4.0)
    wave = jnp.where(apply2, pitch_shift(wave, length, semis), wave)

    apply3 = jax.random.bernoulli(keys[6], p)
    wave = jnp.where(apply3, shift(keys[7], wave, length), wave)

    return wave, length
